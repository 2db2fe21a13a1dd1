package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.index.IndexCatalog
import graft.streaming.GraftStreaming

class GraftStreamingSpec extends GraftSparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  test("streaming ingestion appends to the table AND its HNSW index per micro-batch") {
    IndexCatalog.clear()
    Graft.registerTable(spark, "stream_t",
      spark.read.parquet(s"$sfDir/embeddings.parquet"))
    IndexCatalog.createIndex(spark, "stream_idx", "stream_t", "embedding")
    val size0 = IndexCatalog.get("stream_idx").get.index.size

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float], Int)]
    val stream = mem.toDF().toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>"), $"label")

    val probe1 = Seq.fill(64)(21f)
    val probe2 = Seq.fill(64)(-21f)
    mem.addData((90001L, probe1, 1))
    val q = GraftStreaming.startIndexAppend(spark, "stream_t", stream)
    q.processAllAvailable()
    mem.addData((90002L, probe2, 2))
    q.processAllAvailable()
    q.stop()

    assert(IndexCatalog.get("stream_idx").get.index.size == size0 + 2)
    assert(Graft.indexTopK(spark, "stream_idx", probe1.toArray, 1)
      .select($"vec_id").as[Long].head() == 90001L)
    assert(Graft.indexTopK(spark, "stream_idx", probe2.toArray, 1)
      .select($"vec_id").as[Long].head() == 90002L)
    // the TABLE view sees the streamed rows too (same DML path as batch)
    assert(spark.table("stream_t").filter($"vec_id" >= 90001L).count() == 2)
  }

  test("compactWhenFragmented keeps the shard count bounded under sustained ingest") {
    IndexCatalog.clear()
    Graft.registerTable(spark, "frag_t",
      spark.read.parquet(s"$sfDir/embeddings.parquet"))
    IndexCatalog.createIndex(spark, "frag_idx", "frag_t", "embedding",
      Map("ef_search" -> "1000000"), sharded = true, numShards = 2)
    // tiny spill threshold so every micro-batch fragments; target high
    // enough that the ideal shard count stays 1
    spark.conf.set(IndexCatalog.DeltaSpillRowsConfKey, "20")
    spark.conf.set(IndexCatalog.AutoShardRowsConfKey, "100000")
    try {
      val size0 = IndexCatalog.get("frag_idx").get.index.size
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, Seq[Float], Int)]
      val stream = mem.toDF().toDF("vec_id", "embedding", "label")
        .select($"vec_id", $"embedding".cast("array<float>"), $"label")
      val q = GraftStreaming.startIndexAppend(spark, "frag_t", stream,
        rematerializeEvery = 64, compactWhenFragmented = 3)
      def vec(id: Long): Seq[Float] =
        Seq.tabulate(64)(j => ((id >> (j % 21)) & 7).toFloat)
      var id = 700000L
      (1 to 8).foreach { _ =>
        mem.addData((0 until 30).map(i => (id + i, vec(id + i), 1)): _*)
        id += 30
        q.processAllAvailable()
      }
      q.stop()
      val sh = graft.index.VectorIndex.resolve(
        IndexCatalog.get("frag_idx").get.index)
        .asInstanceOf[graft.index.ShardedHnswIndex]
      // 240 streamed rows at spill threshold 20 = 12 spill-sealed shards
      // without maintenance (2 + 12 = 14); the excess-3 bound must have
      // folded them along the way: <= ideal(1) + bound(3) + the <=1 spill a
      // batch can add after its own check
      assert(sh.shards.length <= 5,
        s"maintenance compaction must bound fragmentation, got ${sh.shards.length} shards")
      assert(sh.size == size0 + 240)
      // early and late streamed rows stay searchable through the folds
      // (index keys are rowids — resolve back to vec_id via the query layer)
      assert(Graft.indexTopK(spark, "frag_idx", vec(700000L).toArray, 1)
        .select($"vec_id").as[Long].head() == 700000L)
      assert(Graft.indexTopK(spark, "frag_idx", vec(id - 1).toArray, 1)
        .select($"vec_id").as[Long].head() == id - 1)
    } finally {
      spark.conf.unset(IndexCatalog.DeltaSpillRowsConfKey)
      spark.conf.unset(IndexCatalog.AutoShardRowsConfKey)
    }
  }

  test("streamed ingest is durable: micro-batches land in the checkpoint-" +
      "armed journals and ONE restoreAll after a crash brings back table " +
      "AND index with the streamed rows searchable") {
    IndexCatalog.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft-sdur").toString
    Graft.registerTable(spark, "sdur_t",
      spark.read.parquet(s"$sfDir/embeddings.parquet"))
    IndexCatalog.createIndex(spark, "sdur_idx", "sdur_t", "embedding")
    spark.conf.set(IndexCatalog.PersistenceConfKey, "true")
    try {
      IndexCatalog.checkpoint(spark, dir) // arms index WAL + table journal
      val sizeAtCkpt = IndexCatalog.get("sdur_idx").get.index.size

      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, Seq[Float], Int)]
      val stream = mem.toDF().toDF("vec_id", "embedding", "label")
        .select($"vec_id", $"embedding".cast("array<float>"), $"label")
      val probe = Seq.fill(64)(77f)
      mem.addData((95001L, probe, 1))
      val q = GraftStreaming.startIndexAppend(spark, "sdur_t", stream)
      q.processAllAvailable()
      q.stop()

      // crash: all driver state gone — streamed rows exist only in the
      // insertInto delta (storage), the table journal, and the index WAL
      IndexCatalog.clear()
      Graft.forgetAllTables(spark)
      TableCatalog.disarm()

      IndexCatalog.restoreAll(spark, dir)
      assert(Graft.isRegisteredTable("sdur_t"))
      assert(spark.table("sdur_t").filter($"vec_id" === 95001L).count() == 1)
      val idx = IndexCatalog.get("sdur_idx").get.index
      assert(idx.size == sizeAtCkpt + 1)
      assert(Graft.indexTopK(spark, "sdur_idx", probe.toArray, 1)
        .select($"vec_id").as[Long].head() == 95001L)
    } finally {
      spark.conf.unset(IndexCatalog.PersistenceConfKey)
      IndexCatalog.dropIndex("sdur_idx")
      Graft.dropTable(spark, "sdur_t")
      TableCatalog.disarm()
    }
  }

  test("knnServeWriter: per-batch results match batch knnJoin and see live ingest") {
    IndexCatalog.clear()
    Graft.registerTable(spark, "serve_t",
      spark.read.parquet(s"$sfDir/embeddings.parquet"))
    // exhaustive ef: the differential against brute-force top-1 is exact
    IndexCatalog.createIndex(spark, "serve_idx", "serve_t", "embedding",
      Map("ef_search" -> "100000"))

    implicit val sqlCtx = spark.sqlContext
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val mem = MemoryStream[(Long, Seq[Float])]
    val queries = mem.toDF().toDF("qid", "qvec")
      .select($"qid", $"qvec".cast("array<float>"))
    val writer = GraftStreaming.knnServeWriter(spark, queries, "qvec",
      "serve_idx", 1) { (res, _) =>
      results ++= res.select($"qid", $"vec_id", $"rank")
        .as[(Long, Long, Long)].collect()
    }

    // batch 1: two existing vectors as queries -> nearest = themselves
    val v2 = spark.table("serve_t").filter($"vec_id" === 2L)
      .select($"embedding").as[Seq[Float]].head()
    val v5 = spark.table("serve_t").filter($"vec_id" === 5L)
      .select($"embedding").as[Seq[Float]].head()
    mem.addData((102L, v2), (105L, v5))
    val q = writer.start()
    q.processAllAvailable()
    assert(results.sorted.toSeq == Seq((102L, 2L, 1L), (105L, 5L, 1L)))

    // live ingest between batches: a probe vector inserted now must be the
    // next batch's answer
    val probe = Seq.fill(64)(42f)
    Graft.insertInto(spark, "serve_t",
      Seq((77001L, probe, 9)).toDF("vec_id", "embedding", "label")
        .select($"vec_id", $"embedding".cast("array<float>"), $"label"))
    results.clear()
    mem.addData((200L, probe))
    q.processAllAvailable()
    q.stop()
    assert(results.toSeq == Seq((200L, 77001L, 1L)))
  }

  test("streaming term-index ingest: post-batch search equals a fresh batch build") {
    import graft.index.TermIndex
    TermIndex.clear()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")
    docs.where($"doc_id" < 100).createOrReplaceTempView("stream_docs_seed")
    docs.createOrReplaceTempView("stream_docs_all")
    TermIndex.create(spark, "stream_term", "stream_docs_seed", "doc_id", "text",
      nBuckets = 8)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val rest = docs.where($"doc_id" >= 100).as[(Long, String)].collect()
    val (b1, b2) = rest.splitAt(rest.length / 2)
    mem.addData(b1.toIndexedSeq)
    val q = GraftStreaming.termIndexAppendWriter(spark, "stream_term", stream).start()
    q.processAllAvailable()
    mem.addData(b2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    TermIndex.create(spark, "stream_term_ref", "stream_docs_all", "doc_id", "text",
      nBuckets = 8)
    val terms = Seq("spark", "join", "query")
    val streamed = TermIndex.search(spark, "stream_term", terms, 20)
      .as[(Long, Double)].collect().toSeq
    val fresh = TermIndex.search(spark, "stream_term_ref", terms, 20)
      .as[(Long, Double)].collect().toSeq
    assert(streamed == fresh)
    TermIndex.drop("stream_term"); TermIndex.drop("stream_term_ref")
  }

  test("stateful streaming dedup: first fingerprint wins across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
      .withColumn("fp", graft.ops.TextAnalysis.fingerprint($"text"))
    val deduped = GraftStreaming.dedupStream(docs, "fp")

    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    // batch 1: in-batch duplicate ("same  text" normalizes to "same text")
    mem.addData((1L, "same text"), (2L, "same  text"), (3L, "other"))
    q.processAllAvailable()
    // batch 2: cross-batch duplicate + a fresh doc
    mem.addData((4L, "SAME TEXT"), (5L, "fresh"))
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("dedup_out").select($"doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 5L))
  }

  test("streaming near-dup: cross-batch LSH pairs match the batch op") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
      (3L, "completely unrelated text about something else entirely"),
      (4L, "the quick brown fox jumps over the lazy dog")) // exact dup of 1
    val out = GraftStreaming.nearDupStream(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()
    mem.addData(docs(0), docs(1)) // batch 1
    q.processAllAvailable()
    mem.addData(docs(2), docs(3)) // batch 2: exact dup arrives LATER
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("neardup_out")
      .select($"a", $"b", $"est_sim").distinct()
      .as[(Long, Long, Double)].collect().toSet
    val batch = graft.ops.Dedup.minHashLshPairs(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed == batch,
      s"streaming pairs must equal batch LSH pairs:\n  s=$streamed\n  b=$batch")
    assert(streamed.exists { case (a, b, s) => a == 1L && b == 4L && s == 1.0 },
      "the cross-batch exact duplicate must surface with est_sim 1.0")
  }

  test("session windows close on gap and emit once finalized (streaming q40)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val df = GraftStreaming.sessionizedCounts(
      mem.toDF().toDF("ts", "user"), "ts", "user", "30 minutes", "0 seconds")

    val q = df.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    // user 7: two events 10 min apart (one session), then a 2 h gap
    mem.addData((t(10, 0), 7L), (t(10, 10), 7L), (t(12, 30), 7L))
    q.processAllAvailable()
    // advance the watermark far enough to close user 7's second session too
    mem.addData((t(15, 0), 8L))
    q.processAllAvailable()
    mem.addData((t(18, 0), 9L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sess_out")
      .select($"user", $"s_start", $"s_end", $"n_events")
      .orderBy($"user", $"s_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3))).toSeq
    // session end = last event + gap (Spark session_window semantics)
    assert(rows.contains((7L, "2026-01-01 10:00:00.0", "2026-01-01 10:40:00.0", 2L)),
      s"two close events must merge into one session: $rows")
    assert(rows.contains((7L, "2026-01-01 12:30:00.0", "2026-01-01 13:00:00.0", 1L)),
      s"post-gap event must open a new session: $rows")
  }

  test("windowed event-time counts with watermark (streaming shape of q08)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = GraftStreaming.windowedCounts(
      mem.toDF().toDF("ts", "etype"), "ts", "etype", "1 hour", "2 hours")

    val q = df.writeStream.outputMode("complete")
      .format("memory").queryName("win_counts").start()
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    mem.addData((t(10, 5), "click"), (t(10, 40), "click"), (t(11, 10), "view"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_counts")
      .select($"w_start", $"etype", $"n").orderBy($"w_start", $"etype").collect()
    assert(rows.map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSeq ==
      Seq(("2026-01-01 10:00:00.0", "click", 2L), ("2026-01-01 11:00:00.0", "view", 1L)))
  }
}
