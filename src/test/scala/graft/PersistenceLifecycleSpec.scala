package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.index.{IndexCatalog, LazyLoadedIndex}

/** Persistence lifecycle parity with the reference
  * (test/sql/hnsw/hnsw_insert.test steps 0-7 and
  * hnsw_experimental_persistence.test:14-17): the persistence gate, a
  * CHECKPOINT that persists artifacts + catalog manifest, a simulated
  * restart with LAZY reload, and inserts after restart reaching the index. */
class PersistenceLifecycleSpec extends GraftSparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private lazy val ckptDir =
    java.nio.file.Files.createTempDirectory("graft-ckpt").toString

  override def beforeAll(): Unit = {
    IndexCatalog.clear()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    Graft.registerTable(spark, "life_t", emb)
    IndexCatalog.createIndex(spark, "life_idx", "life_t", "embedding")
  }

  test("checkpoint refuses without the experimental-persistence gate") {
    spark.conf.unset(IndexCatalog.PersistenceConfKey)
    val e = intercept[IllegalStateException] {
      IndexCatalog.checkpoint(spark, ckptDir)
    }
    assert(e.getMessage.contains("hnsw_enable_experimental_persistence"))
  }

  test("checkpoint -> restart -> lazy reload -> insert after restart") {
    spark.conf.set(IndexCatalog.PersistenceConfKey, "true")
    try {
      val sizeBefore = IndexCatalog.get("life_idx").get.index.size
      val q = spark.table("life_t").filter($"vec_id" === 5)
        .select($"embedding").head().getSeq[Float](0).toArray
      val before = Graft.indexTopK(spark, "life_idx", q, 5)
        .select($"vec_id").as[Long].collect()

      // CHECKPOINT, then simulate a restart: catalog gone, storage remains
      IndexCatalog.checkpoint(spark, ckptDir)
      IndexCatalog.clear()
      assert(IndexCatalog.get("life_idx").isEmpty)

      // restore re-registers WITHOUT deserializing (deferred load)
      IndexCatalog.restoreAll(spark, ckptDir)
      val entry = IndexCatalog.get("life_idx").get
      assert(entry.index.isInstanceOf[LazyLoadedIndex])

      // first access loads; results identical to pre-restart
      val after = Graft.indexTopK(spark, "life_idx", q, 5)
        .select($"vec_id").as[Long].collect()
      assert(after.toSeq == before.toSeq)

      // step 4 of hnsw_insert.test: inserts after restart reach the index
      val probe = Array.fill(64)(42f)
      val newRows = Seq((123456L, probe.toSeq, 0)).toDF("vec_id", "embedding", "label")
        .select($"vec_id", $"embedding".cast("array<float>"), $"label")
      Graft.insertInto(spark, "life_t", newRows)
      assert(IndexCatalog.get("life_idx").get.index.size == sizeBefore + 1)
      assert(Graft.indexTopK(spark, "life_idx", probe, 1)
        .select($"vec_id").as[Long].head() == 123456L)

      // second restart cycle: the inserted vector survives re-checkpoint
      IndexCatalog.checkpoint(spark, ckptDir)
      IndexCatalog.clear()
      IndexCatalog.restoreAll(spark, ckptDir)
      assert(Graft.indexTopK(spark, "life_idx", probe, 1)
        .select($"vec_id").as[Long].head() == 123456L)
    } finally spark.conf.unset(IndexCatalog.PersistenceConfKey)
  }
}
