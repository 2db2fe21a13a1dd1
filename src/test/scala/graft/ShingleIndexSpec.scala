package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.index.{ShingleIndex, StorageIndexCatalog}

/** The bucketed hashed-shingle artifact: parity of every shingle-fed op
  * with its inline form, exchange-free bucketed self-join, and restart
  * durability (bucket metadata re-registered over the surviving parquet). */
class ShingleIndexSpec extends GraftSparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select($"doc_id", $"text")

  override def beforeAll(): Unit = {
    ShingleIndex.drop("sh_spec")
    docs.createOrReplaceTempView("sh_docs")
    ShingleIndex.create(spark, "sh_spec", "sh_docs", "doc_id", "text",
      nBuckets = 4)
  }

  override def afterAll(): Unit = {
    ShingleIndex.drop("sh_spec")
    ()
  }

  test("jaccard / corpus-dup / decontamination parity with the inline ops") {
    val sh = ShingleIndex.shingles(spark, "sh_spec")
    val jA = graft.ops.Dedup.ngramJaccardPairsFromShingles(sh, "doc_id",
        minJaccard = 0.05, maxShingleDocFreq = 100)
      .orderBy($"a", $"b").as[(Long, Long, Double)].collect().toSeq
    val jI = graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleLen = 3, minJaccard = 0.05, maxShingleDocFreq = 100)
      .orderBy($"a", $"b").as[(Long, Long, Double)].collect().toSeq
    assert(jA == jI && jA.nonEmpty)

    val cA = graft.ops.Dedup.corpusDupSignalFromShingles(sh, "doc_id")
      .orderBy($"doc_id").as[(Long, Long, Double)].collect().toSeq
    val cI = graft.ops.Dedup.corpusDupSignal(docs, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(cA == cI)

    val dA = graft.ops.Dedup.decontaminationSignalFromShingles(
        sh.where($"doc_id" % 41 =!= 0), sh.where($"doc_id" % 41 === 0), "doc_id")
      .orderBy($"doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    val dI = graft.ops.Dedup.decontaminationSignal(
        docs.where($"doc_id" % 41 =!= 0), docs.where($"doc_id" % 41 === 0),
        "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(dA == dI)
  }

  test("the artifact scan is bucketed and the self-join adds no exchange " +
      "between the bucketed scans and the join") {
    val sh = ShingleIndex.shingles(spark, "sh_spec")
    val plan = graft.ops.Dedup
      .ngramJaccardPairsFromShingles(sh, "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"),
      s"expected a bucketed scan in:\n${plan.take(4000)}")
  }

  test("restart DDL keeps a non-BIGINT id column's type") {
    ShingleIndex.drop("sh_str")
    docs.select(concat(lit("d"), $"doc_id").as("doc_id"), $"text")
      .createOrReplaceTempView("sh_docs_str")
    ShingleIndex.create(spark, "sh_str", "sh_docs_str", "doc_id", "text",
      nBuckets = 4)
    val before = ShingleIndex.shingles(spark, "sh_str").count()
    // restart: catalog table gone, entry survives — the re-issued DDL must
    // carry the STRING id type read off the parquet, not assume BIGINT
    spark.sql("DROP TABLE IF EXISTS __graft_shingles_sh_str")
    val restored = ShingleIndex.shingles(spark, "sh_str")
    assert(restored.schema("doc_id").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(restored.count() == before && before > 0)
    ShingleIndex.drop("sh_str")
  }

  test("artifact survives restart: bucket DDL re-registered over parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sh-ckpt").toString
    StorageIndexCatalog.checkpoint(dir)
    val before = ShingleIndex.shingles(spark, "sh_spec").count()
    ShingleIndex.clearRegistryOnly()
    spark.sql("DROP TABLE IF EXISTS __graft_shingles_sh_spec") // catalog gone too
    StorageIndexCatalog.restore(dir)
    val after = ShingleIndex.shingles(spark, "sh_spec")
    assert(after.count() == before)
    // the planner only picks a bucketed scan when it pays (a bare count
    // reads non-bucketed); a by-shingle aggregate must read bucketed
    assert(after.groupBy($"shingle").count()
      .queryExecution.executedPlan.toString.contains("Bucketed: true"))
    StorageIndexCatalog.disarm()
  }
}
