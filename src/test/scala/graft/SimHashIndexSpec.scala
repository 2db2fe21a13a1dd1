package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.index.{SimHashIndex, StorageIndexCatalog}

/** The SimHash-fingerprint artifact: parity with the inline ops, append
  * additivity, restart durability. */
class SimHashIndexSpec extends GraftSparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select($"doc_id", $"text")

  override def beforeAll(): Unit = {
    SimHashIndex.drop("sim_spec")
    docs.createOrReplaceTempView("sim_docs")
    SimHashIndex.create(spark, "sim_spec", "sim_docs", "doc_id", "text")
  }

  override def afterAll(): Unit = {
    SimHashIndex.drop("sim_spec")
    ()
  }

  test("topK and banded pairs parity with the inline forms") {
    val fp = SimHashIndex.fingerprints(spark, "sim_spec")
    val tA = graft.ops.Dedup.simHashTopKFromFingerprints(fp, "doc_id", lit(42L), 10)
      .orderBy($"hamming", $"doc_id").as[(Long, Int)].collect().toSeq
    val tI = graft.ops.Dedup.simHashTopK(docs, "doc_id", "text", lit(42L), 10)
      .orderBy($"hamming", $"doc_id").as[(Long, Int)].collect().toSeq
    assert(tA == tI && tA.nonEmpty)

    val pA = graft.ops.Dedup.simHashNearDupPairsFromFingerprints(fp, "doc_id")
      .orderBy($"a", $"b").as[(Long, Long, Int)].collect().toSeq
    val pI = graft.ops.Dedup.simHashNearDupPairs(docs, "doc_id", "text")
      .orderBy($"a", $"b").as[(Long, Long, Int)].collect().toSeq
    assert(pA == pI)
  }

  test("append adds new docs' fingerprints additively") {
    SimHashIndex.drop("sim_app")
    docs.where($"doc_id" % 2 === 0).createOrReplaceTempView("sim_app_seed")
    SimHashIndex.create(spark, "sim_app", "sim_app_seed", "doc_id", "text")
    SimHashIndex.append(spark, "sim_app", docs.where($"doc_id" % 2 === 1))
    val fromAppend = SimHashIndex.fingerprints(spark, "sim_app")
      .orderBy($"doc_id").select($"doc_id", $"simhash")
      .as[(Long, String)].collect().toSeq
    val fresh = graft.ops.Dedup.simHash(docs, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, String)].collect().toSeq
    assert(fromAppend == fresh)
    SimHashIndex.drop("sim_app")
  }

  test("artifact survives restart through the storage manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sim-ckpt").toString
    StorageIndexCatalog.checkpoint(dir)
    val before = SimHashIndex.fingerprints(spark, "sim_spec").count()
    SimHashIndex.clearRegistryOnly()
    assert(SimHashIndex.get("sim_spec").isEmpty)
    StorageIndexCatalog.restore(dir)
    assert(SimHashIndex.fingerprints(spark, "sim_spec").count() == before)
    StorageIndexCatalog.disarm()
  }
}
