package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.index.IndexCatalog

class IndexCatalogSpec extends GraftSparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  override def beforeAll(): Unit = {
    IndexCatalog.clear()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    Graft.registerTable(spark, "emb_idx_t", emb)
  }

  private def queryVec(id: Int): Array[Float] =
    spark.table("emb_idx_t").filter($"vec_id" === id)
      .select($"embedding").head().getSeq[Float](0).toArray

  test("createIndex validates options with reference error wording") {
    val e1 = intercept[IllegalArgumentException] {
      IndexCatalog.createIndex(spark, "bad", "emb_idx_t", "embedding",
        Map("metric" -> "taxicab"))
    }
    assert(e1.getMessage.contains("Unknown metric kind: taxicab"))
    val e2 = intercept[IllegalArgumentException] {
      IndexCatalog.createIndex(spark, "bad", "emb_idx_t", "embedding",
        Map("m" -> "1"))
    }
    assert(e2.getMessage.contains("HNSW index 'M' must be at least 2"))
    val e3 = intercept[IllegalArgumentException] {
      IndexCatalog.createIndex(spark, "bad", "emb_idx_t", "embedding",
        Map("bogus_opt" -> "1"))
    }
    assert(e3.getMessage.contains("Unknown option for HNSW index: bogus_opt"))
    val e4 = intercept[IllegalArgumentException] {
      IndexCatalog.createIndex(spark, "bad", "emb_idx_t", "vec_id")
    }
    assert(e4.getMessage.contains("FLOAT[N]"))
  }

  test("driver-built index: indexTopK top-1 is the exact NN; recall@10 >= 0.9") {
    IndexCatalog.createIndex(spark, "emb_l2", "emb_idx_t", "embedding")
    val q = queryVec(0)
    val exact = Graft.topK(spark.table("emb_idx_t"), "embedding", q, 10)
      .select($"vec_id").as[Long].collect()
    val approx = Graft.indexTopK(spark, "emb_l2", q, 10)
      .select($"vec_id").as[Long].collect()
    assert(approx.length == 10)
    assert(approx.head == exact.head)
    assert(exact.toSet.intersect(approx.toSet).size >= 9)
  }

  test("sharded index: same contract, built executor-side") {
    IndexCatalog.createIndex(spark, "emb_l2_sh", "emb_idx_t", "embedding",
      sharded = true)
    val q = queryVec(7)
    val exact = Graft.topK(spark.table("emb_idx_t"), "embedding", q, 5)
      .select($"vec_id").as[Long].collect()
    val approx = Graft.indexTopK(spark, "emb_l2_sh", q, 5)
      .select($"vec_id").as[Long].collect()
    assert(approx.head == exact.head)
    assert(exact.toSet.intersect(approx.toSet).size >= 4)
  }

  test("sharded build from 8+ partitions: executor-resident artifacts, exact merge") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    Graft.registerTable(spark, "emb_sh8_t", emb)
    IndexCatalog.createIndex(spark, "emb_sh8", "emb_sh8_t", "embedding",
      sharded = true, numShards = 8)
    val idx = IndexCatalog.get("emb_sh8").get.index
      .asInstanceOf[graft.index.ShardedHnswIndex]
    // the driver holds only shard metadata (paths + stats), not graphs
    assert(idx.shards.length >= 8)
    idx.shards.foreach(s => assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s.path))))
    assert(idx.size == 500)
    // per-shard exhaustive ef ⇒ the k-way merge is exact
    spark.conf.set(IndexCatalog.EfSearchConfKey, "600")
    try {
      val q = queryVec(42)
      val exact = Graft.topK(spark.table("emb_sh8_t"), "embedding", q, 10)
        .select($"vec_id").as[Long].collect()
      val viaIndex = Graft.indexTopK(spark, "emb_sh8", q, 10)
        .select($"vec_id").as[Long].collect()
      assert(viaIndex.toSeq == exact.toSeq)
    } finally spark.conf.unset(IndexCatalog.EfSearchConfKey)
  }

  test("sharded DML: delta inserts, tombstone deletes, compaction rewrites shards") {
    val idx = IndexCatalog.get("emb_sh8").get.index
    val probe = Array.fill(64)(-9f)
    idx.insert(77777L, probe)
    assert(idx.search(probe, 1).head._1 == 77777L)
    assert(idx.delete(0L))
    assert(idx.search(queryVec(0), 1, ef = 600).head._1 != 0L)
    assert(idx.deletedCount == 1)
    val compacted = idx.compacted()
    assert(compacted.deletedCount == 0)
    assert(compacted.size == idx.size)
    assert(compacted.search(probe, 1).head._1 == 77777L)
    assert(compacted.search(queryVec(0), 1, ef = 600).head._1 != 0L)
  }

  test("knnJoin over a SHARDED index: broadcast ships paths, results exact with full ef") {
    // fresh index: the DML test above tombstones keys in emb_sh8
    IndexCatalog.createIndex(spark, "emb_sh8_join", "emb_sh8_t", "embedding",
      sharded = true, numShards = 8)
    spark.conf.set(IndexCatalog.EfSearchConfKey, "600")
    try {
      val outer = spark.table("emb_sh8_t").filter($"vec_id" < 4)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val got = Graft.knnJoin(spark, outer, "qvec", "emb_sh8_join", 3)
        .select($"qid", $"vec_id", $"rank").orderBy($"qid", $"rank")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // brute-force differential
      val brute = outer.crossJoin(spark.table("emb_sh8_t"))
        .withColumn("d", graft.functions.vector.array_distance_sq($"qvec", $"embedding"))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy($"qid").orderBy($"d", $"vec_id")))
        .filter($"rn" <= 3).orderBy($"qid", $"rn")
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
      assert(got.toSeq == brute.toSeq)
    } finally spark.conf.unset(IndexCatalog.EfSearchConfKey)
  }

  test("distributed compaction: one task per shard, tombstones pruned, results intact") {
    IndexCatalog.createIndex(spark, "emb_sh_comp", "emb_sh8_t", "embedding",
      sharded = true, numShards = 4)
    val before = IndexCatalog.get("emb_sh_comp").get.index
    val total = before.size
    // mono rowids have per-partition gaps: pick two real ones
    val ids = spark.table("emb_sh8_t").select(col(Graft.RowIdCol))
      .as[Long].sort().take(20)
    val (d1, d2) = (ids(3), ids(13))
    before.delete(d1)
    before.delete(d2)
    assert(before.deletedCount == 2)
    IndexCatalog.compactIndex(spark, "emb_sh_comp") // Spark-job path
    val after = IndexCatalog.get("emb_sh_comp").get.index
      .asInstanceOf[graft.index.ShardedHnswIndex]
    assert(after.deletedCount == 0 && after.size == total - 2)
    assert(!after.contains(d1) && after.contains(ids(4)))
    spark.conf.set(IndexCatalog.EfSearchConfKey, "600")
    try {
      val q = queryVec(8)
      val exact = Graft.topK(
        spark.table("emb_sh8_t").filter(!$"${Graft.RowIdCol}".isin(d1, d2)),
        "embedding", q, 5).select($"vec_id").as[Long].collect()
      val viaIndex = Graft.indexTopK(spark, "emb_sh_comp", q, 5)
        .select($"vec_id").as[Long].collect()
      assert(viaIndex.toSeq == exact.toSeq)
    } finally spark.conf.unset(IndexCatalog.EfSearchConfKey)
  }

  test("ef_search session conf override is honored (SET hnsw_ef_search analog)") {
    spark.conf.set(IndexCatalog.EfSearchConfKey, "500")
    try {
      val q = queryVec(3)
      val exact = Graft.topK(spark.table("emb_idx_t"), "embedding", q, 10)
        .select($"vec_id").as[Long].collect()
      val approx = Graft.indexTopK(spark, "emb_l2", q, 10)
        .select($"vec_id").as[Long].collect()
      assert(approx.toSeq == exact.toSeq) // ef >= n ⇒ effectively exhaustive
    } finally spark.conf.unset(IndexCatalog.EfSearchConfKey)
  }

  test("knnJoin: per-outer-row top-k with 1-indexed rank, NULL outer skipped") {
    val outer = spark.table("emb_idx_t").filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val joined = Graft.knnJoin(spark, outer, "qvec", "emb_l2", 4)
    val got = joined.select($"qid", $"vec_id", $"rank", $"dist")
      .orderBy($"qid", $"rank").collect()
    assert(got.length == 12)
    // self-match at rank 1, distance 0
    assert(got.filter(_.getDouble(3) == 0.0).map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 0L), (1L, 1L), (2L, 2L)))
    assert(got.map(_.getLong(2)).take(4).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("empty-table index with declared dimensions (hnsw_insert.test step 1)") {
    Graft.registerTable(spark, "emb_empty_t",
      spark.read.parquet(s"$sfDir/embeddings.parquet").filter($"vec_id" < 0))
    // without dimensions: the engine can't know N
    val e = intercept[IllegalArgumentException] {
      IndexCatalog.createIndex(spark, "empty_idx", "emb_empty_t", "embedding")
    }
    assert(e.getMessage.contains("dimensions"))
    // with dimensions: count 0, then inserts make it searchable
    IndexCatalog.createIndex(spark, "empty_idx", "emb_empty_t", "embedding",
      Map("dimensions" -> "64"))
    val idx = IndexCatalog.get("empty_idx").get.index
    assert(idx.size == 0 && idx.dim == 64)
    assert(idx.search(Array.fill(64)(0f), 3).isEmpty)
    val probe = Seq.fill(64)(3f)
    val rows = Seq((1L, probe, 0)).toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>"), $"label")
    Graft.insertInto(spark, "emb_empty_t", rows)
    assert(idx.size == 1)
    assert(Graft.indexTopK(spark, "empty_idx", probe.toArray, 1)
      .select($"vec_id").as[Long].head() == 1L)
  }

  test("SQL 3-arg min_by/max_by dispatch to the k-ary aggregate (DuckDB surface)") {
    Graft.registerFunctions(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
      .createOrReplaceTempView("mb_t")
    val k3 = spark.sql(
      "SELECT min_by(vec_id, CAST(vec_id AS DOUBLE), 3) AS ids FROM mb_t")
      .head().getSeq[Long](0)
    assert(k3 == Seq(0L, 1L, 2L))
    val k1 = spark.sql(
      "SELECT max_by(vec_id, CAST(vec_id AS DOUBLE)) AS id FROM mb_t")
      .head().getLong(0)
    assert(k1 == 49L)
  }

  test("duplicate index name errors; drop/recreate loop stays clean (reclaim test shape)") {
    val e = intercept[IllegalArgumentException] {
      IndexCatalog.createIndex(spark, "emb_l2", "emb_idx_t", "embedding")
    }
    assert(e.getMessage.contains("already exists"))
    // hnsw_reclaim_storage.test_slow: drop + recreate several times, index
    // stays correct and the catalog doesn't accumulate entries
    val nBefore = IndexCatalog.list.size
    (1 to 4).foreach { _ =>
      IndexCatalog.dropIndex("reclaim_idx")
      IndexCatalog.createIndex(spark, "reclaim_idx", "emb_idx_t", "embedding")
      val q = queryVec(2)
      assert(Graft.indexTopK(spark, "reclaim_idx", q, 1)
        .select($"vec_id").as[Long].head() == 2L)
    }
    IndexCatalog.dropIndex("reclaim_idx")
    assert(IndexCatalog.list.size == nBefore)
  }

  test("NULL inner vectors never enter the index nor the join results (hnsw_lateral_join.test:46-67)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // poison some rows with NULL vectors
    val withNulls = emb.withColumn("embedding",
      org.apache.spark.sql.functions.when($"vec_id" % 5 === 0,
        org.apache.spark.sql.functions.lit(null)).otherwise($"embedding"))
    Graft.registerTable(spark, "emb_null_t", withNulls)
    IndexCatalog.createIndex(spark, "null_idx", "emb_null_t", "embedding")
    val idx = IndexCatalog.get("null_idx").get.index
    assert(idx.size == emb.count() - emb.filter($"vec_id" % 5 === 0).count())
    spark.conf.set(IndexCatalog.EfSearchConfKey, "600")
    try {
      val outer = spark.table("emb_null_t").filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val got = Graft.knnJoin(spark, outer, "qvec", "null_idx", 3)
        .select($"qid", $"vec_id").orderBy($"qid", $"vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // NULL outer rows (qid 0, 5) emit nothing; no match is a NULL-vec row
      assert(!got.exists(p => p._1 == 0L || p._1 == 5L))
      assert(got.map(_._1).distinct.length == 8)
      assert(got.forall(_._2 % 5 != 0))
    } finally spark.conf.unset(IndexCatalog.EfSearchConfKey)
  }

  test("describe() matches the pragma_hnsw_index_info schema") {
    val info = IndexCatalog.describe(spark)
    assert(info.schema.fieldNames.toSeq == Seq("catalog_name", "schema_name",
      "index_name", "table_name", "metric", "dimensions", "count", "capacity",
      "approx_memory_usage", "levels", "levels_stats"))
    val row = info.filter($"index_name" === "emb_l2").head()
    assert(row.getAs[Long]("dimensions") == 64L)
    assert(row.getAs[Long]("count") == 500L)
    assert(row.getAs[Long]("levels") >= 1L)
  }

  test("persistAll + loadIndex round-trip (CHECKPOINT analog)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idx").toString
    val paths = IndexCatalog.persistAll(dir)
    assert(paths.nonEmpty)
    val q = queryVec(11)
    val before = Graft.indexTopK(spark, "emb_l2", q, 5).select($"vec_id").as[Long].collect()
    IndexCatalog.dropIndex("emb_l2")
    assert(IndexCatalog.get("emb_l2").isEmpty)
    IndexCatalog.loadIndex(spark, "emb_l2", s"$dir/emb_l2.hnsw", "emb_idx_t", "embedding")
    val after = Graft.indexTopK(spark, "emb_l2", q, 5).select($"vec_id").as[Long].collect()
    assert(before.toSeq == after.toSeq)
  }

  test("sharded persist + reload round-trip (artifact copy + manifest)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shardsave").toString
    val idx = IndexCatalog.get("emb_sh8").get.index
    idx.save(s"$dir/emb_sh8")
    val loaded = graft.index.ShardedHnswIndex.load(s"$dir/emb_sh8")
    assert(loaded.size == idx.size && loaded.deletedCount == idx.deletedCount)
    val q = queryVec(21)
    assert(loaded.search(q, 5, ef = 600).toSeq == idx.search(q, 5, ef = 600).toSeq)
  }

  test("DML: insertInto + deleteFrom propagate to the index (hnsw_crud.test)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    Graft.registerTable(spark, "emb_crud_t", emb)
    IndexCatalog.createIndex(spark, "crud_idx", "emb_crud_t", "embedding")
    val sizeBefore = IndexCatalog.get("crud_idx").get.index.size

    // insert a distinctive vector far outside the data distribution
    val probe = Array.fill(64)(9f)
    val newRows = Seq((9999L, probe.toSeq, 0)).toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>"), $"label")
    Graft.insertInto(spark, "emb_crud_t", newRows)
    assert(IndexCatalog.get("crud_idx").get.index.size == sizeBefore + 1)
    val hit = Graft.indexTopK(spark, "crud_idx", probe, 1).select($"vec_id").as[Long].head()
    assert(hit == 9999L)

    // delete it again — tombstoned, then compact prunes
    Graft.deleteFrom(spark, "emb_crud_t", $"vec_id" === 9999L)
    assert(IndexCatalog.get("crud_idx").get.index.deletedCount == 1)
    val hitAfter = Graft.indexTopK(spark, "crud_idx", probe, 1).select($"vec_id").as[Long].head()
    assert(hitAfter != 9999L)
    IndexCatalog.compactIndex("crud_idx")
    assert(IndexCatalog.get("crud_idx").get.index.deletedCount == 0)
    assert(IndexCatalog.get("crud_idx").get.index.size == sizeBefore)
  }

  test("an index created AFTER DML still accelerates queries (entry stores " +
      "the optimized post-insert view, same as refreshTablePlans)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    Graft.registerTable(spark, "emb_postdml_t", emb)
    try {
      // deepen the view FIRST: union-with-delta plus a delete filter
      val probe = Array.fill(64)(8.5f)
      Graft.insertInto(spark, "emb_postdml_t",
        Seq((8888L, probe.toSeq, 0)).toDF("vec_id", "embedding", "label")
          .select($"vec_id", $"embedding".cast("array<float>"), $"label"))
      Graft.deleteFrom(spark, "emb_postdml_t", $"vec_id" === 3L)
      // NOW create the index — its stored plan must match query subtrees
      IndexCatalog.createIndex(spark, "postdml_idx", "emb_postdml_t",
        "embedding", Map("ef_search" -> "600"))
      val df = spark.table("emb_postdml_t")
        .orderBy(graft.functions.vector.array_distance_sq($"embedding",
          lit(probe)).asc_nulls_last)
        .limit(3)
      assert(df.queryExecution.executedPlan.toString.contains("HnswIndexScan"),
        "index created after insert/delete never matched the view:\n" +
          df.queryExecution.optimizedPlan.toString.take(2000))
      assert(df.select($"vec_id").as[Long].head() == 8888L)
    } finally {
      IndexCatalog.dropIndex("postdml_idx")
      Graft.dropTable(spark, "emb_postdml_t")
    }
  }
}
