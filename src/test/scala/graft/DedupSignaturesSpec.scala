package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.index.{DedupSignatures, StorageIndexCatalog}

/** The registered MinHash-signature artifact: pair parity with the inline
  * op, append additivity, and restart durability through the storage
  * manifest. */
class DedupSignaturesSpec extends GraftSparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select($"doc_id", $"text")

  override def beforeAll(): Unit = {
    DedupSignatures.drop("sig_spec")
    docs.createOrReplaceTempView("sig_docs")
    DedupSignatures.create(spark, "sig_spec", "sig_docs", "doc_id", "text")
  }

  override def afterAll(): Unit = {
    DedupSignatures.drop("sig_spec")
    ()
  }

  test("artifact pairs are identical to the inline minHashLshPairs") {
    val viaArtifact = DedupSignatures.pairs(spark, "sig_spec")
      .orderBy($"a", $"b").as[(Long, Long, Double)].collect().toSeq
    val inline = graft.ops.Dedup.minHashLshPairs(docs, "doc_id", "text")
      .orderBy($"a", $"b").as[(Long, Long, Double)].collect().toSeq
    assert(viaArtifact == inline)
    assert(viaArtifact.nonEmpty) // sf0.001 has seeded near-dups
  }

  test("signatures table has one row per shingled doc, stable under re-read") {
    val sigs = DedupSignatures.signatures(spark, "sig_spec")
    assert(sigs.columns.toSeq == ("doc_id" +: (0 until 8).map(p => s"mh$p")))
    assert(sigs.groupBy($"doc_id").count().where($"count" > 1).count() == 0)
  }

  test("append adds new docs' signatures additively") {
    DedupSignatures.drop("sig_app")
    docs.where($"doc_id" % 2 === 0).createOrReplaceTempView("sig_app_seed")
    DedupSignatures.create(spark, "sig_app", "sig_app_seed", "doc_id", "text")
    DedupSignatures.append(spark, "sig_app", docs.where($"doc_id" % 2 === 1))
    val fromAppend = DedupSignatures.pairs(spark, "sig_app")
      .orderBy($"a", $"b").as[(Long, Long, Double)].collect().toSeq
    val fresh = graft.ops.Dedup.minHashLshPairs(docs, "doc_id", "text")
      .orderBy($"a", $"b").as[(Long, Long, Double)].collect().toSeq
    assert(fromAppend == fresh)
    DedupSignatures.drop("sig_app")
  }

  test("artifact survives restart through the storage manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sig-ckpt").toString
    StorageIndexCatalog.checkpoint(dir)
    val before = DedupSignatures.pairs(spark, "sig_spec")
      .orderBy($"a", $"b").as[(Long, Long, Double)].collect().toSeq
    DedupSignatures.clearRegistryOnly()
    assert(DedupSignatures.get("sig_spec").isEmpty)
    StorageIndexCatalog.restore(dir)
    val after = DedupSignatures.pairs(spark, "sig_spec")
      .orderBy($"a", $"b").as[(Long, Long, Double)].collect().toSeq
    assert(after == before)
    StorageIndexCatalog.disarm()
  }
}
