package graft

import org.apache.spark.sql.functions._
import graft.functions.vector
import graft.index.IndexCatalog
import graft.ops.Dedup

/** Filtered/radius ANN search and SimHash Hamming search: differential
  * tests against brute-force formulations on the sf0.001 fixtures. */
class FilteredSearchSpec extends GraftSparkSpec {
  import spark.implicits._

  private lazy val (table, index) = {
    graft.plans.GraftExtensions.install(spark)
    val (t, i) = ("fss_emb", "fss_idx")
    if (IndexCatalog.get(i).isEmpty) {
      Graft.registerTable(spark, t,
        spark.read.parquet(s"$sfDir/embeddings.parquet"))
      // exhaustive ef: differential tests assert EXACT parity
      IndexCatalog.createIndex(spark, i, t, "embedding",
        Map("ef_search" -> "100000"))
    }
    (t, i)
  }

  private def queryVec(vecId: Long): Array[Float] =
    spark.table(table).filter(col("vec_id") === vecId)
      .select(col("embedding")).head().getSeq[Float](0).toArray

  test("indexTopKWhere == brute-force filtered top-k (selective predicate)") {
    val qv = queryVec(3)
    // label = 2 is ~10% of rows: the first k*4 fetch under-fills and the
    // adaptive re-probe loop actually runs
    val got = Graft.indexTopKWhere(spark, index, qv, 5, col("label") === 2)
      .select(col("vec_id"), col("dist")).orderBy(col("dist"), col("vec_id"))
      .collect().toSeq
    val want = spark.table(table)
      .withColumn("dist", vector.array_distance_sq(col("embedding"), lit(qv)))
      .where(col("label") === 2)
      .orderBy(col("dist"), col("vec_id"))
      .select(col("vec_id"), col("dist")).limit(5)
      .collect().toSeq
    assert(got == want)
  }

  test("indexTopKWhere: predicate rejecting everything returns 0 rows") {
    val qv = queryVec(3)
    assert(Graft.indexTopKWhere(spark, index, qv, 5, col("label") === -1)
      .count() == 0)
  }

  test("indexRadiusSearch == single-pass brute radiusSearch") {
    val qv = queryVec(3)
    // pick r at the 12th-nearest distance: forces at least one doubling
    // past the initialK=4 frontier below
    val r = spark.table(table)
      .withColumn("dist", vector.array_distance_sq(col("embedding"), lit(qv)))
      .orderBy(col("dist")).limit(12).agg(max(col("dist"))).head().getDouble(0)
    val got = Graft.indexRadiusSearch(spark, index, qv, r, initialK = 4)
      .select(col("vec_id"), col("dist")).orderBy(col("vec_id"))
      .collect().toSeq
    val want = Graft.radiusSearch(spark.table(table), "embedding", qv, r)
      .select(col("vec_id"), col("dist")).orderBy(col("vec_id"))
      .collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("indexRadiusSearch: radius below the nearest non-self hit returns only self") {
    val qv = queryVec(3)
    val got = Graft.indexRadiusSearch(spark, index, qv, 1e-9)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L))
  }

  test("radiusJoin == brute-force theta-join; frontier doubling is exact") {
    val qv = queryVec(3) // any outer works; use several rows as queries
    val t = spark.table(table)
    val outer = t.where(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // r at each row's ~8th neighbor: initialK=2 forces multiple doublings
    val r = t.withColumn("dist",
        vector.array_distance_sq(col("embedding"), lit(qv)))
      .orderBy(col("dist")).limit(8).agg(max(col("dist"))).head().getDouble(0)
    val got = Graft.radiusJoin(spark, outer, "qid", "qvec", index, r,
        initialK = 2)
      .select(col("qid"), col("vec_id"), col("dist"))
      .orderBy(col("qid"), col("vec_id")).collect().toSeq
    val inner = t.select(col("vec_id"), col("embedding").as("ivec"))
    val want = outer.crossJoin(inner)
      .withColumn("dist", vector.array_distance_sq(col("qvec"), col("ivec")))
      .where(col("dist") <= r)
      .select(col("qid"), col("vec_id"), col("dist"))
      .orderBy(col("qid"), col("vec_id")).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("radiusJoin: empty outer returns empty with the joined schema") {
    val t = spark.table(table)
    val outer = t.where(col("vec_id") < 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val res = Graft.radiusJoin(spark, outer, "qid", "qvec", index, 1.0)
    assert(res.count() == 0)
    assert(res.columns.contains("dist") && res.columns.contains("qid"))
  }

  test("hammingDist: zero to self, counts flipped bits") {
    val df = Seq(
      ("0" * 64, "0" * 64, 0),
      ("1" * 64, "0" * 64, 64),
      ("10" + "0" * 62, "00" + "0" * 62, 1)).toDF("a", "b", "want")
    val bad = df.where(Dedup.hammingDist(col("a"), col("b")) =!= col("want"))
    assert(bad.count() == 0)
  }

  test("simHashNearDupPairs == brute-force pairs for hamming <= bands-1") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = Dedup.simHashNearDupPairs(docs, "doc_id", "text",
        maxHamming = 3, bands = 4)
      .orderBy(col("a"), col("b")).collect().toSeq
    val sh = Dedup.simHash(docs, "doc_id", "text")
    val l = sh.select(col("doc_id").as("a"), col("simhash").as("ha"))
    val r = sh.select(col("doc_id").as("b"), col("simhash").as("hb"))
    val want = l.crossJoin(r).where(col("a") < col("b"))
      .select(col("a"), col("b"), Dedup.hammingDist(col("ha"), col("hb")).as("hamming"))
      .where(col("hamming") <= 3)
      .orderBy(col("a"), col("b")).collect().toSeq
    assert(got == want)
  }

  test("simHash pair miner: hot-bucket local path == brute force on a low-entropy corpus") {
    import spark.implicits._
    // 300 docs drawn from 3 distinct texts (plus a per-doc tail so ids
    // differ): every band bucket is ~100 rows, far over hotBucketMin, so
    // the primitive in-task pairing path carries the whole corpus
    val docs = (0 until 300).map { i =>
      (i.toLong, s"the quick brown fox pattern ${i % 3} jumps over the lazy dog")
    }.toDF("doc_id", "text")
    val got = Dedup.simHashNearDupPairs(docs, "doc_id", "text",
        maxHamming = 3, bands = 4)
      .orderBy(col("a"), col("b")).collect().toSeq
    val sh = Dedup.simHash(docs, "doc_id", "text")
    val l = sh.select(col("doc_id").as("a"), col("simhash").as("ha"))
    val r = sh.select(col("doc_id").as("b"), col("simhash").as("hb"))
    val want = l.crossJoin(r).where(col("a") < col("b"))
      .select(col("a"), col("b"),
        Dedup.hammingDist(col("ha"), col("hb")).as("hamming"))
      .where(col("hamming") <= 3)
      .orderBy(col("a"), col("b")).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("knnOutlierScores == brute-force kth-NN distance") {
    val got = Dedup.knnOutlierScores(spark, table, "vec_id", index, 3)
      .orderBy(col("vec_id")).collect().toSeq
    val t = spark.table(table)
    val l = t.select(col("vec_id").as("a"), col("embedding").as("va"))
    val r = t.select(col("vec_id").as("b"), col("embedding").as("vb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a")).orderBy(col("dist"), col("b"))
    val want = l.crossJoin(r).where(col("a") =!= col("b"))
      .select(col("a"),  col("b"),
        vector.array_distance_sq(col("va"), col("vb")).as("dist"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 3)
      .select(col("a").as("vec_id"), col("dist").as("outlier_score"))
      .orderBy(col("vec_id")).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("mmrTopK: rank 1 is the nearest; later picks trade distance for diversity") {
    val qv = queryVec(3)
    val got = Graft.mmrTopK(spark, index, qv, k = 4, poolSize = 20)
      .select(col("vec_id"), col("mmr_rank"), col("dist"))
      .orderBy(col("mmr_rank")).collect()
    assert(got.length == 4)
    assert(got.map(_.getInt(1)).toSeq == Seq(1, 2, 3, 4))
    // rank 1 = plain nearest neighbor (the query vector itself, dist 0)
    assert(got.head.getLong(0) == 3L && got.head.getDouble(2) == 0.0)
    // all picks distinct, all drawn from the candidate pool
    assert(got.map(_.getLong(0)).distinct.length == 4)
    val poolIds = Graft.indexTopK(spark, index, qv, 20)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(got.map(_.getLong(0)).forall(poolIds.contains))
  }

  test("mmrJoin == per-query mmrTopK (batch greedy matches the scalar op)") {
    val t = spark.table(table)
    val outer = t.where(col("vec_id") < 3 && col("embedding").isNotNull)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val got = Graft.mmrJoin(spark, outer, "qid", "qvec", index, "vec_id",
        k = 3, poolSize = 10)
      .orderBy(col("qid"), col("mmr_rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val want = (0L until 3L).flatMap { qid =>
      val qv = queryVec(qid)
      Graft.mmrTopK(spark, index, qv, k = 3, poolSize = 10)
        .select(col("vec_id"), col("mmr_rank"))
        .orderBy(col("mmr_rank"))
        .collect().map(r => (qid, r.getLong(0), r.getInt(1)))
    }
    assert(got == want)
  }

  test("mmrTopK on a cosine index keeps both score terms in the cosine domain") {
    if (IndexCatalog.get("fss_cos_idx").isEmpty) {
      IndexCatalog.createIndex(spark, "fss_cos_idx", table, "embedding",
        Map("metric" -> "cosine", "ef_search" -> "100000"))
    }
    val qv = queryVec(3)
    val got = Graft.mmrTopK(spark, "fss_cos_idx", qv, k = 3, poolSize = 15)
      .select(col("vec_id"), col("mmr_rank"), col("dist"))
      .orderBy(col("mmr_rank")).collect()
    assert(got.length == 3)
    // rank 1 = cosine-nearest (self, dist 0); all dists within cosine range
    assert(got.head.getLong(0) == 3L && math.abs(got.head.getDouble(2)) < 1e-12)
    assert(got.forall(r => r.getDouble(2) >= -1e-12 && r.getDouble(2) <= 2.0 + 1e-12))
    // lambda=1 degenerates to cosine top-k, proving qdist drives relevance
    val topkIds = Graft.mmrTopK(spark, "fss_cos_idx", qv, 3, 15, lambda = 1.0)
      .select(col("vec_id")).orderBy(col("mmr_rank"))
      .collect().map(_.getLong(0)).toSeq
    val want = Graft.topK(spark.table(table), "embedding", qv, 3,
        metric = "cosine", tieBreak = Seq("vec_id"))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(topkIds == want)
    // and the DIVERSITY term is cosine too: replay the lambda=0.5 greedy
    // locally with the cosine kernel over the same pool — an l2sq
    // diversity term would pick a different sequence
    val pool = Graft.topK(spark.table(table), "embedding", qv, 15,
        metric = "cosine", tieBreak = Seq("vec_id"))
      .select(col("vec_id"), col("embedding"), col("dist")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
    val cos = graft.index.DistanceKernels.forMetric("cosine")
    var remaining = pool.sortBy(_._1).toBuffer
    val minD = scala.collection.mutable.Map.empty[Long, Double]
      .withDefaultValue(Double.PositiveInfinity)
    val localPicks = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (localPicks.length < 4 && remaining.nonEmpty) {
      val pick =
        if (localPicks.isEmpty) remaining.minBy(p => (p._3, p._1))
        else remaining.minBy(p => (-(0.5 * minD(p._1) - 0.5 * p._3), p._1))
      remaining -= pick
      localPicks += pick._1
      remaining.foreach { p =>
        val d = cos(p._2, pick._2)
        if (d < minD(p._1)) minD(p._1) = d
      }
    }
    val engine = Graft.mmrTopK(spark, "fss_cos_idx", qv, k = 4, poolSize = 15)
      .select(col("vec_id")).orderBy(col("mmr_rank"))
      .collect().map(_.getLong(0)).toSeq
    assert(engine == localPicks.toSeq)
  }

  test("mmrTopK with lambda=1 degenerates to plain top-k by distance") {
    val qv = queryVec(3)
    val got = Graft.mmrTopK(spark, index, qv, k = 5, poolSize = 20, lambda = 1.0)
      .select(col("vec_id")).orderBy(col("mmr_rank"))
      .collect().map(_.getLong(0)).toSeq
    val want = Graft.topK(spark.table(table), "embedding", qv, 5,
        tieBreak = Seq("vec_id"))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("removeDuplicatedSpans: repeated window dropped, unique text kept, hand-checked") {
    val span = (1 to 8).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $span gamma"),      // span + 2-token tail context
      (2L, s"$span"),                        // exactly the span -> fully removed
      (3L, "one two three four five six seven eight nine"), // unique, kept
      (4L, "")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedSpans(docs, "doc_id", "text",
        windowLen = 8, minOccurrences = 2)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // doc 1: the 8 dup tokens removed; "alpha beta ... gamma" kept
    assert(got(0) == ((1L, "alpha beta gamma", 11L, 8L)))
    assert(got(1) == ((2L, "", 8L, 8L)))
    assert(got(2) == ((3L, "one two three four five six seven eight nine", 9L, 0L)))
    assert(got(3) == ((4L, "", 0L, 0L)))
  }

  test("span-dedup -> filter -> chunk composition, hand-checked (q72 shape)") {
    val span = (1 to 8).map(i => s"s$i").mkString(" ")
    val tail40 = (1 to 40).map(i => s"u$i").mkString(" ")
    val docs = Seq(
      (1L, s"$span $tail40"),   // 8 of 48 removed (<=50%) -> kept, 40 clean tokens
      (2L, span),               // fully removed -> dropped
      (3L, s"$span a b")).toDF("doc_id", "text") // 8 of 10 removed (>50%) -> dropped
    val cleaned = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", 8, 2)
      .where(col("clean_text") =!= "" && col("n_removed") * 2 <= col("n_tokens"))
    val got = graft.ops.Chunking.chunk(
        cleaned.select(col("doc_id"), col("clean_text").as("text")),
        "doc_id", "text", chunkTokens = 32, overlap = 8)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("n_tokens")).as("chunk_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1 survives alone: 40 clean tokens -> chunks at stride 24 =
    // ceil((40-8)/24) = 2 chunks covering 32 + 16 tokens
    assert(got == Seq((1L, 2L, 48L)))
  }

  test("removeDuplicatedSpans: overlapping hot windows cover the union of positions") {
    // the 9-token run shared by both docs yields two overlapping hot
    // 8-windows in each; all 9 positions must go, not 8
    val run = (1 to 9).map(i => s"r$i").mkString(" ")
    val docs = Seq((1L, s"x $run y"), (2L, s"a b $run")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", 8, 2)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(got(0) == ((1L, "x y", 9L)))
    assert(got(1) == ((2L, "a b", 9L)))
  }

  test("removeDuplicatedSpans: native rebuild bit-equals the exploded-token " +
      "formulation (incl. NULL text and fully-covered docs)") {
    val run = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"u1 $run u2"),
      (2L, run), // fully covered -> clean_text ""
      (3L, s"$run $run"), // hot window also duplicated WITHIN the doc
      (4L, "unique words only here"),
      (5L, null.asInstanceOf[String]), // NULL text -> ("", 0, 0)
      (6L, ""), (7L, "   "),
      (8L, s"pre  $run  post extra tail")).toDF("doc_id", "text")
    val native = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", 8, 2)
      .orderBy(col("doc_id")).collect()
    val decl = Dedup.removeDuplicatedSpansDeclarative(docs, "doc_id", "text", 8, 2)
      .orderBy(col("doc_id")).collect()
    assert(native.length == decl.length)
    native.zip(decl).foreach { case (a, b) =>
      assert(a == b, s"native vs declarative mismatch for doc ${a.getLong(0)}")
    }
  }

  test("simHashTopK ranks by (hamming, id) with the query doc first") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = Dedup.simHashTopK(docs, "doc_id", "text", lit(7L), 5).collect()
    assert(got.length == 5)
    assert(got.head.getLong(0) == 7L && got.head.getInt(1) == 0)
    val hams = got.map(_.getInt(1)).toSeq
    assert(hams == hams.sorted)
  }
}
