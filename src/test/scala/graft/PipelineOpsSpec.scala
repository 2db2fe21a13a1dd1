package graft

import org.apache.spark.sql.functions._
import graft.ops.{Redaction, Sampling, Sessionize, TextAnalysis}

/** Unit coverage for the round-4 pipeline ops (their oracle queries are
  * q37–q40); hand-computable fixtures pin the semantics the oracle can't
  * isolate (per-op edge cases, determinism contracts). */
class PipelineOpsSpec extends GraftSparkSpec {
  import spark.implicits._

  // --- Chunking ----------------------------------------------------------

  test("chunk: windows stride with overlap, cover every token, short docs " +
      "yield one chunk") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 tokens
      (2L, "a b"), // shorter than one chunk
      (3L, "")).toDF("doc_id", "text")
    val got = graft.ops.Chunking.chunk(docs, "doc_id", "text",
        chunkTokens = 4, overlap = 1)
      .orderBy($"doc_id", $"chunk_id")
      .as[(Long, Long, String, Long)].collect().toSeq
    // stride 3, nChunks = ceil((10-1)/3) = 3: [1..4], [4..7], [7..10]
    assert(got == Seq(
      (1L, 0L, "t1 t2 t3 t4", 4L),
      (1L, 1L, "t4 t5 t6 t7", 4L),
      (1L, 2L, "t7 t8 t9 t10", 4L),
      (2L, 0L, "a b", 2L),
      (3L, 0L, "", 1L))) // split("") is [""], same contract as tokenCount
    assertThrows[IllegalArgumentException] {
      graft.ops.Chunking.chunk(docs, "doc_id", "text", 4, 4)
    }
  }

  test("chunk covers all tokens exactly once modulo the declared overlap") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val chunks = graft.ops.Chunking.chunk(docs, "doc_id", "text", 32, 8)
    val agg = chunks.groupBy($"doc_id")
      .agg(sum($"n_tokens").as("sum_t"), count(lit(1)).as("nc"))
    val toks = docs.select($"doc_id",
      graft.ops.TextAnalysis.tokenCount($"text").as("n"))
    // Σ chunk tokens = n + (nChunks − 1) · overlap (each boundary re-counts
    // `overlap` tokens) — exact accounting, no token lost or duplicated
    val bad = agg.join(toks, "doc_id")
      .where($"sum_t" =!= $"n" + ($"nc" - 1) * 8).count()
    assert(bad == 0)
  }

  // --- l2_normalize ------------------------------------------------------

  test("l2_normalize: unit norm, zero vector maps to zeros") {
    val v = Seq(
      (1L, Seq(3f, 4f)),
      (2L, Seq(0f, 0f))).toDF("id", "vec")
      .select($"id", $"vec".cast("array<float>").as("vec"))
    val got = v.select($"id",
        graft.functions.vector.l2_normalize($"vec").as("n"))
      .orderBy($"id").as[(Long, Seq[Double])].collect()
    assert(got(0)._2 == Seq(0.6, 0.8))
    assert(got(1)._2 == Seq(0.0, 0.0))
    // normalized fixture vectors rank by l2sq exactly as cosine ranks raw
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
      .select($"vec_id", $"embedding",
        graft.functions.vector.l2_normalize($"embedding")
          .cast("array<float>").as("nvec"))
    val q = emb.filter($"vec_id" === 3).select($"nvec").head().getSeq[Float](0).toArray
    val qRaw = emb.filter($"vec_id" === 3).select($"embedding").head().getSeq[Float](0).toArray
    val byL2 = emb.withColumn("d",
        graft.functions.vector.array_distance_sq($"nvec", lit(q)))
      .orderBy($"d", $"vec_id").select($"vec_id").as[Long].collect().toSeq
    val byCos = emb.withColumn("d",
        graft.functions.vector.array_cosine_distance($"embedding", lit(qRaw)))
      .orderBy($"d", $"vec_id").select($"vec_id").as[Long].collect().toSeq
    assert(byL2 == byCos)
  }

  // --- Sampling ----------------------------------------------------------

  test("deterministic split is stable under repartitioning and re-evaluation") {
    val ids = spark.range(0, 2000).toDF("id")
    val a = Sampling.withSplit(ids, "id").orderBy($"id").collect()
    val b = Sampling.withSplit(ids.repartition(13), "id").orderBy($"id").collect()
    assert(a.sameElements(b))
    val frac = a.count(_.getString(1) == "train").toDouble / a.length
    assert(frac > 0.75 && frac < 0.85, s"train fraction $frac out of band")
    assert(a.map(_.getString(1)).toSet == Set("train", "val", "test"))
  }

  test("deterministicSample keeps ~rate and is a subset relation across rates") {
    val ids = spark.range(0, 2000).toDF("id")
    val s10 = Sampling.deterministicSample(ids, "id", 0.10).select("id").as[Long].collect().toSet
    val s50 = Sampling.deterministicSample(ids, "id", 0.50).select("id").as[Long].collect().toSet
    assert(s10.subsetOf(s50), "lower-rate sample must be nested in higher-rate")
    assert(math.abs(s10.size / 2000.0 - 0.10) < 0.03)
    assert(math.abs(s50.size / 2000.0 - 0.50) < 0.04)
  }

  test("stratifiedSample applies per-stratum rates; unknown strata drop") {
    val df = spark.range(0, 3000)
      .select($"id", (when($"id" % 3 === 0, "web")
        .when($"id" % 3 === 1, "books").otherwise("code")).as("src"))
    val out = Sampling.stratifiedSample(df, "id", "src",
      Map("web" -> 0.25, "books" -> 1.0)).groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!out.contains("code"), "stratum with no rate must be dropped")
    assert(out("books") == 1000L, "rate 1.0 keeps everything")
    assert(math.abs(out("web") / 1000.0 - 0.25) < 0.06)
  }

  test("mixtureRates: bottleneck stratum keeps 1.0, kept mixture hits targets") {
    // 800 web / 100 books / 100 code; targets 50/25/25 → books is the
    // bottleneck (100/0.25=400 < web 800/0.5=1600), K=400
    val df = spark.range(0, 1000).select($"id",
      (when($"id" < 800, "web").when($"id" < 900, "books").otherwise("code")).as("s"))
    val targets = Map("web" -> 0.5, "books" -> 0.25, "code" -> 0.25)
    val rates = Sampling.mixtureRates(df, "s", targets)
    assert(math.abs(rates("books") - 1.0) < 1e-12, s"bottleneck must keep all: $rates")
    assert(math.abs(rates("web") - 0.25) < 1e-12, s"web thins 800→200: $rates")
    assert(math.abs(rates("code") - 1.0) < 1e-12)
    val kept = Sampling.calibrateMixture(df, "id", "s", targets)
      .groupBy($"s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("books") == 100L && kept("code") == 100L)
    assert(math.abs(kept("web") / 200.0 - 1.0) < 0.15, s"~200 web kept: $kept")
  }

  // --- Redaction ---------------------------------------------------------

  test("redact scrubs every PII kind; counts agree with matches") {
    val df = Seq(
      (1L, "mail a.b+c@sub.example.org or root@10.1.2.3 call 555-1234 x 1.2.3.4"),
      (2L, "no pii here at all"),
      (3L, "two mails x@y.io and z@w.ai, phone 555-12 is too short")).toDF("id", "t")
    val out = df.select($"id", Redaction.redact($"t").as("r"),
      Redaction.piiCount($"t", "email").as("e"),
      Redaction.piiCount($"t", "phone").as("p"),
      Redaction.piiCount($"t", "ipv4").as("ip")).orderBy($"id").collect()
    // root@10.1.2.3 is NOT an email (numeric TLD fails [A-Za-z]{2,});
    // the dotted quad inside it is still caught by the IP pass
    assert(out(0).getAs[String]("r") ==
      "mail <EMAIL> or root@<IP> call <PHONE> x <IP>")
    assert((out(0).getLong(2), out(0).getLong(3), out(0).getLong(4)) == ((1L, 1L, 2L)))
    assert(out(1).getAs[String]("r") == "no pii here at all")
    assert(out(2).getLong(2) == 2L)
    assert(out(2).getLong(3) == 0L, "4+ digit groups only — 555-12 is not a phone")
  }

  test("redactWithCounts (fused native pass) is bit-identical to " +
      "piiCount x3 + the chained redact") {
    // edge cases: overlapping kinds (IP inside a failed email), adjacent
    // matches, match at string start/end, empty string, no matches, and the
    // sf0.01 fixture corpus with the q39 synthetic PII appended
    val edge = Seq(
      (1L, "mail a.b+c@sub.example.org or root@10.1.2.3 call 555-1234 x 1.2.3.4"),
      (2L, "no pii here at all"),
      (3L, "two mails x@y.io and z@w.ai, phone 555-12 is too short"),
      (4L, ""),
      (5L, "a@b.cc1.2.3.4 555-999 10.0.0.1"),
      (6L, "1.2.3.4"),
      (7L, "x@y.zz")).toDF("id", "t")
    val fixture = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".as("id"),
        concat($"text", lit(" u"), $"doc_id".cast("string"), lit("@e.com"),
          lit(" 555-0001 9.9.9."), ($"doc_id" % 256).cast("string")).as("t"))
    for (df <- Seq(edge, fixture)) {
      val ref = df.select($"id",
        Redaction.piiCount($"t", "email").as("e"),
        Redaction.piiCount($"t", "phone").as("p"),
        Redaction.piiCount($"t", "ipv4").as("ip"),
        Redaction.redact($"t").as("r"))
        .as[(Long, Long, Long, Long, String)].collect().toSet
      val fused = df.select($"id", Redaction.redactWithCounts($"t").as("f"))
        .select($"id",
          $"f.counts".getItem(Redaction.kindIndex("email")).as("e"),
          $"f.counts".getItem(Redaction.kindIndex("phone")).as("p"),
          $"f.counts".getItem(Redaction.kindIndex("ipv4")).as("ip"),
          $"f.red".as("r"))
        .as[(Long, Long, Long, Long, String)].collect().toSet
      assert(fused == ref)
    }
  }

  // --- Sessionize --------------------------------------------------------

  test("sessionize splits on gap, orders ties deterministically") {
    val gap = 100L
    val ev = Seq(
      // user 1: events at 0,50,120 (one session: gaps 50,70 <= 100), then 500
      (1L, 0L, 1L), (1L, 50L, 2L), (1L, 120L, 3L), (1L, 500L, 4L),
      // user 2: single event
      (2L, 10L, 5L),
      // user 3: tie on ts — event_id breaks it, same session
      (3L, 7L, 7L), (3L, 7L, 6L)).toDF("user_id", "ts", "event_id")
    val out = Sessionize.sessionStats(ev, "user_id", "ts", gap, "event_id")
      .orderBy($"user_id", $"session_seq")
      .select($"user_id", $"session_seq", $"n_events", $"span")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 3L, 120L), (1L, 2L, 1L, 0L),
      (2L, 1L, 1L, 0L),
      (3L, 1L, 2L, 0L)))
  }

  // --- AsofJoin ----------------------------------------------------------

  test("asofJoin picks the latest right row <= left ts; inner vs left; strict") {
    import graft.ops.AsofJoin
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 9L, 900.0))
      .toDF("k", "ts", "v")
      .select($"k", $"ts", $"ts".as("r_ts"), $"v")
    def run(jt: String, strict: Boolean) =
      AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("r_ts", "v"), jt, strict)
        .orderBy($"k", $"ts")
        .select($"k", $"ts", $"tag", $"r_ts", $"v")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))
    // inclusive: left(1,10) sees right(1,10); left(1,20) sees right(1,15);
    // left(2,5) has no prior right → dropped by inner
    assert(run("inner", strict = false).toSeq ==
      Seq((1L, 10L, "a", 10L), (1L, 20L, "b", 15L)))
    // left join keeps the unmatched row with NULL payload
    assert(run("left", strict = false).toSeq ==
      Seq((1L, 10L, "a", 10L), (1L, 20L, "b", 15L), (2L, 5L, "c", -1L)))
    // strict: right at the same instant is no longer visible
    assert(run("inner", strict = true).toSeq == Seq((1L, 20L, "b", 15L)))
  }

  test("asofJoin tolerance disqualifies matches older than the lookback") {
    val l = Seq((1L, 100L), (1L, 200L)).toDF("k", "ts")
    val r = Seq((1L, 95L, "near"), (1L, 120L, "far")).toDF("k", "ts", "v")
    // ts=100 matches v@95 (lag 5); ts=200 matches v@120 (lag 80)
    val noTol = graft.ops.AsofJoin.asofJoin(l, r, Seq("k"), "ts", Seq("v"))
      .orderBy($"ts").as[(Long, Long, String)].collect().toSeq
    assert(noTol == Seq((1L, 100L, "near"), (1L, 200L, "far")))
    val tol = graft.ops.AsofJoin.asofJoin(l, r, Seq("k"), "ts", Seq("v"),
      joinType = "left", tolerance = Some(50L))
      .orderBy($"ts").as[(Long, Long, Option[String])].collect().toSeq
    assert(tol == Seq((1L, 100L, Some("near")), (1L, 200L, None)),
      "an 80-tick-old match must not survive tolerance 50")
    val tolInner = graft.ops.AsofJoin.asofJoin(l, r, Seq("k"), "ts", Seq("v"),
      tolerance = Some(50L)).as[(Long, Long, String)].collect().toSeq
    assert(tolInner == Seq((1L, 100L, "near")), "inner drops the disqualified row")
  }

  test("asofJoin matches payload columns row-atomically (no struct tearing)") {
    import graft.ops.AsofJoin
    // newest right row has v1 = NULL: a per-column last() would pull v1 from
    // the older row and v2 from the newer one; the struct must not
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq((1L, 10L, Some(7.0), "old"), (1L, 20L, None, "new"))
      .toDF("k", "ts", "v1", "v2")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("v1", "v2"))
      .head()
    assert(out.isNullAt(out.fieldIndex("v1")) &&
      out.getString(out.fieldIndex("v2")) == "new")
  }

  // --- Corpus duplication ------------------------------------------------

  test("corpusDupSignal: shared shingles counted once per doc, hand-checked") {
    // docs 1/2 share "a b c"; doc 3 is disjoint
    val df = Seq(
      (1L, "a b c d"), // shingles: "a b c","b c d" → 1 of 2 shared
      (2L, "a b c"),   // "a b c" → 1 of 1 shared
      (3L, "x y z")).toDF("doc_id", "text")
    val out = graft.ops.Dedup.corpusDupSignal(df, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 0.5), (2L, 1L, 1.0), (3L, 1L, 0.0)))
  }

  // --- Decontamination ---------------------------------------------------

  test("decontaminationSignal: overlap vs benchmark shingles, hand-checked") {
    val corpus = Seq(
      (1L, "a b c d"), // "a b c","b c d" — "a b c" is in the benchmark → 1/2
      (2L, "p q r"),   // disjoint → 0/1
      (3L, "a b c")).toDF("doc_id", "text") // fully contained → 1/1
    val bench = Seq((100L, "a b c x y z")).toDF("doc_id", "text")
    val out = graft.ops.Dedup.decontaminationSignal(corpus, bench, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 1L, 0.5), (2L, 1L, 0L, 0.0), (3L, 1L, 1L, 1.0)))
  }

  // --- Sequence packing --------------------------------------------------

  test("packAssignments: per-bucket prefix-sum packing, stable under repartition") {
    val docs = spark.range(0, 500)
      .select($"id".as("doc_id"), (($"id" % 7) * 10 + 5).as("n_tok"))
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Packing.packAssignments(df, "doc_id", $"n_tok", budget = 100)
        .orderBy($"doc_id").collect()
    val a = run(docs)
    val b = run(docs.repartition(13))
    assert(a.sameElements(b), "assignment must not depend on input layout")

    // recompute each bucket's prefix sums locally and check pack arithmetic
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val byBucket = a.map(r => (r.getInt(1), md5Hex(r.getLong(0).toString),
        r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    byBucket.foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._2).foreach { case (_, _, packId, nTok) =>
        assert(packId == cum / 100,
          s"pack id must be floor(tokens-before/budget): got $packId at cum=$cum")
        cum += nTok
      }
    }
    // buckets spread the work: far more than one, none dominating
    assert(byBucket.size > 100, s"expected ~256 buckets, got ${byBucket.size}")
  }

  test("packSummary totals match assignments") {
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "f")).toDF("doc_id", "text")
    val asg = graft.ops.Packing.packAssignments(docs, "doc_id",
      size(split(trim($"text"), "\\s+")), budget = 4)
    val total = graft.ops.Packing.packSummary(asg)
      .agg(sum($"n_docs"), sum($"sum_tokens")).as[(Long, Long)].head()
    assert(total == ((3L, 6L)))
  }

  // --- Connected components ----------------------------------------------

  test("connectedComponents: chains merge, isolates stay, matches BFS oracle") {
    // random-ish graph with known structure: a 5-chain, a triangle, isolates
    val vs = spark.range(0, 12).toDF("doc_id")
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), // chain 1..5
      (7L, 8L), (8L, 9L), (7L, 9L),                       // triangle
      (10L, 10L)                                          // self-loop
    ).toDF("a", "b")
    val got = graft.ops.Components.connectedComponents(vs, es)
      .orderBy($"doc_id").as[(Long, Long)].collect().toMap
    val want = Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 6L, 7L -> 7L, 8L -> 7L, 9L -> 7L, 10L -> 10L, 11L -> 11L)
    assert(got == want)
  }

  test("connectedComponents: edges with endpoints outside vertices are ignored entirely") {
    // id 2 is NOT a vertex: the (5,2) edge must neither relay connectivity
    // nor label 5's component (a comp outside the vertex set would make
    // dedupByClusters drop the whole cluster)
    val vs = Seq(5L, 6L, 7L).toDF("doc_id")
    val es = Seq((5L, 2L), (2L, 6L), (6L, 7L)).toDF("a", "b")
    val got = graft.ops.Components.connectedComponents(vs, es)
      .orderBy($"doc_id").as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 5L, 6L -> 6L, 7L -> 6L))
    val docs = vs
    val survivors = graft.ops.Components.dedupByClusters(docs, "doc_id", es)
      .as[Long].collect().toSet
    assert(survivors == Set(5L, 6L))
  }

  test("clusterSafeSplit: every near-dup cluster lands on one side of the split") {
    val docs = spark.range(0, 200).toDF("doc_id")
    // chains of 3 every 10 ids — clusters that a per-doc hash split
    // would scatter across train/val/test
    val pairs = (0L until 200L by 10).flatMap(i => Seq((i, i + 1), (i + 1, i + 2)))
      .toDF("a", "b")
    val out = graft.ops.Sampling.clusterSafeSplit(docs, "doc_id", pairs)
    // (a) deterministic, (b) cluster-coherent: one distinct split per comp
    val comps = graft.ops.Components.connectedComponents(docs, pairs)
    val joined = out.join(comps, "doc_id")
    val incoherent = joined.groupBy($"comp")
      .agg(countDistinct($"split").as("n"))
      .where($"n" > 1)
    assert(incoherent.count() == 0)
    // isolated docs split exactly like the plain id-hash rule
    val iso = joined.where($"comp" === $"doc_id" && $"doc_id" % 10 >= 3)
      .select($"doc_id", $"split")
    val plain = graft.ops.Sampling.withSplit(
        iso.select($"doc_id"), "doc_id")
    assert(iso.join(plain.withColumnRenamed("split", "psplit"), "doc_id")
      .where($"split" =!= $"psplit").count() == 0)
    // and the fixture actually exercises multi-doc clusters
    assert(joined.groupBy($"comp").count().where($"count" === 3).count() == 20)
  }

  test("connectedComponents matches a local union-find on random graphs (both arms)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val n = 40 + trial * 30
      val edges = Seq.fill(n)( (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong) )
      // local oracle: union-find with path compression
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val minOf = (0 until n).groupBy(find).flatMap { case (_, vs) =>
        val m = vs.min.toLong; vs.map(v => v.toLong -> m)
      }
      // default threshold → the driver-side union-find arm
      val gotLocal = graft.ops.Components.connectedComponents(
          spark.range(0, n).toDF("id"), edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(gotLocal == minOf, s"trial $trial mismatch (local arm)")
      // threshold 0 → the distributed min-label-propagation arm
      val gotDist = graft.ops.Components.connectedComponents(
          spark.range(0, n).toDF("id"), edges.toDF("a", "b"),
          localEdgeThreshold = 0L)
        .as[(Long, Long)].collect().toMap
      assert(gotDist == minOf, s"trial $trial mismatch (distributed arm)")
    }
  }

  test("connectedComponents distributed arm honors the absent-endpoint contract") {
    // same fixture as the local-arm contract test, forced down the
    // propagation loop: both arms must ignore edges with endpoints
    // outside the vertex set ENTIRELY
    val vs = Seq(5L, 6L, 7L).toDF("doc_id")
    val es = Seq((5L, 2L), (2L, 6L), (6L, 7L)).toDF("a", "b")
    val got = graft.ops.Components.connectedComponents(vs, es,
        localEdgeThreshold = 0L)
      .orderBy($"doc_id").as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 5L, 6L -> 6L, 7L -> 6L))
  }

  test("dedupByClusters keeps exactly one representative per cluster") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val kept = graft.ops.Components.dedupByClusters(docs, "doc_id", pairs)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L))
  }

  // --- Repetition signals ------------------------------------------------

  test("repetitionSignals: hand-checked ratios, single-word doc defaults") {
    val df = Seq(
      (1L, "a b a b"),     // 4 words, 2 distinct, top 2; bigrams: ab,ba,ab → 3 total 2 distinct
      (2L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(df).orderBy($"doc_id").collect()
    val r1 = out(0)
    assert(r1.getLong(1) == 4L)
    assert(r1.getDouble(2) == 0.5) // distinct_word_ratio
    assert(r1.getDouble(3) == 0.5) // top_word_frac
    assert(math.abs(r1.getDouble(4) - (1.0 - 2.0 / 3.0)) < 1e-15) // dup_2gram_frac
    assert(r1.getDouble(5) == 1.0) // mean_word_len
    val r2 = out(1)
    assert(r2.getLong(1) == 1L && r2.getDouble(4) == 0.0,
      "single-word doc has zero bigram duplication, not NULL")
  }

  test("repetitionSignals: NULL-text docs produce no output row") {
    // the original explode→groupBy formulation emitted no row for a
    // NULL-text doc; the per-row rewrite must keep that contract (round-12
    // advisor: an unfiltered NULL doc produced an internally inconsistent
    // row — NULL ratios alongside dup_2gram_frac=0.0)
    val df = Seq((1L, Some("a b a")), (2L, None), (3L, Some("x y")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(df).orderBy($"doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L),
      "NULL-text doc must be absent from the output, not a NULL-ratio row")
    assert(out.forall(r => !r.isNullAt(1) && !r.isNullAt(4)))
  }

  test("repetitionSignals: flat-array algebra matches a plain-Scala reference") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ff")
    val docs = (1L to 80L).map { i =>
      val n = rnd.nextInt(14)
      val text =
        if (n == 0) "" // empty doc: split yields one "" word
        else Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i, text)
    }
    val out = TextAnalysis.repetitionSignals(docs.toDF("doc_id", "text"))
      .orderBy($"doc_id").collect()
    docs.zip(out).foreach { case ((id, text), r) =>
      val ws = text.trim.split("\\s+").toSeq
      val n = ws.length
      val top = ws.groupBy(identity).values.map(_.size).max
      val bigrams = if (n >= 2) ws.sliding(2).map(_.mkString(" ")).toSeq else Nil
      assert(r.getLong(0) == id)
      assert(r.getLong(1) == n.toLong, s"n_words doc $id")
      assert(r.getDouble(2) == ws.distinct.size.toDouble / n, s"distinct ratio doc $id")
      assert(r.getDouble(3) == top.toDouble / n, s"top_word_frac doc $id")
      val expDup =
        if (bigrams.isEmpty) 0.0
        else 1.0 - bigrams.distinct.size.toDouble / bigrams.size
      assert(math.abs(r.getDouble(4) - expDup) < 1e-15, s"dup_2gram_frac doc $id")
      assert(r.getDouble(5) == ws.map(_.length).sum.toDouble / n, s"mean_word_len doc $id")
    }
  }

  test("native counting expressions bit-equal their declarative forms") {
    import org.apache.spark.sql.functions.{length, lit, regexp_extract_all, regexp_replace, size}
    import org.apache.spark.sql.types.LongType
    // corpora stressing the count edges: empty text, unicode classes,
    // adjacent/non-overlapping needles, digit runs, zero-length-match regex
    val texts = Seq(
      "", "aaa", "aa aa", " the the and of ", "a@b.cc 555-1234 10.0.0.7",
      "über naïve 猫 12.34!", "x?!,;:x", "the theatre thesis", "   ",
      "aaaa", "ababab", "123-4567 and 999-999", "!!!???", "π≈3.14159")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    // RegexpMatchCount == size(regexp_extract_all(_, p, 0)) for every pattern
    // family the ops use: BPE alternation, char classes, PII shapes, and a
    // zero-length-match pattern (find() advance semantics must agree)
    val patterns = Seq(TextAnalysis.BpeTokenPattern, "[^\\s\\p{L}\\p{N}]",
      "[0-9]", "\\b\\d{3}-\\d{3,4}\\b", "a*")
    patterns.foreach { p =>
      val rows = df.select(
        graft.functions.RegexpMatchCount.column($"t", p).as("native"),
        size(regexp_extract_all($"t", lit(p), lit(0))).cast(LongType).as("decl"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"RegexpMatchCount($p) ${r.getLong(0)} != declarative ${r.getLong(1)}"))
    }
    // SubstringCount == the replace-length idiom (non-overlapping,
    // left-to-right), incl. adjacent occurrences and multi-byte needles
    val needles = Seq("a", "aa", " the ", "猫", "ab", "?!")
    needles.foreach { nd =>
      val rows = df.select(
        graft.functions.SubstringCount.column($"t", nd).as("native"),
        TextAnalysis.occurrencesDeclarative($"t", nd).as("decl")).collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"SubstringCount($nd) ${r.getLong(0)} != declarative ${r.getLong(1)}"))
    }
    // NULL text flows through as NULL on both paths
    val nr = Seq((1L, Option.empty[String])).toDF("id", "t")
      .select(graft.functions.RegexpMatchCount.column($"t", "[0-9]").as("a"),
        graft.functions.SubstringCount.column($"t", "x").as("b")).collect()(0)
    assert(nr.isNullAt(0) && nr.isNullAt(1))
  }

  test("shingleArray: native expression bit-equals the declarative HOF plan") {
    // gram-edge corpus: shorter-than-n docs (empty array), exactly-n docs,
    // duplicate grams (first-occurrence order), empty tokens from leading
    // tab after space-only trim (grams like " a b" must survive verbatim),
    // unicode, single-word spam
    val texts = Seq(
      "", "a", "a b", "a b c", "a b c d", "a a a a a a", "x y x y x y x",
      "\ta b c", "über naïve 猫 über naïve 猫", "p q r p q r s",
      "  lead and trail  ", "one\ttwo\nthree four")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    for (n <- Seq(1, 2, 3, 5)) {
      val rows = df.select(
        graft.ops.Dedup.shingleArray($"t", n).as("native"),
        graft.ops.Dedup.shingleArrayDeclarative($"t", n).as("decl")).collect()
      rows.zip(texts).foreach { case (r, t) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n text='$t': native ${r.getSeq[String](0)} != declarative ${r.getSeq[String](1)}")
      }
    }
  }

  test("repetitionSignals: native expression bit-equals the declarative HOF plan") {
    // the shipped plan evaluates graft.functions.WordRepetitionStats (one
    // codegen'd loop per doc); the interpreted-HOF formulation is the
    // reference. Corpus stresses the edges: empty text, single word, spam
    // runs (top_word_cnt), multi-codepoint unicode (sum_word_len counts
    // chars, not bytes), high bigram duplication, mixed whitespace.
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "über", "naïve", "猫猫", "x1", "zz")
    val docs = (1L to 120L).map { i =>
      val text = rnd.nextInt(6) match {
        case 0 => ""
        case 1 => vocab(rnd.nextInt(vocab.size))
        case 2 => Seq.fill(3 + rnd.nextInt(40))(vocab(0)).mkString(" ") // spam run
        case 3 => // repeated bigram block
          val pair = s"${vocab(rnd.nextInt(vocab.size))} ${vocab(rnd.nextInt(vocab.size))}"
          Seq.fill(2 + rnd.nextInt(10))(pair).mkString(" ")
        case _ =>
          Seq.fill(1 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size)))
            .mkString(if (rnd.nextBoolean()) " " else "  \t ")
      }
      (i, text)
    }
    val df = docs.toDF("doc_id", "text")
    val native = TextAnalysis.repetitionSignals(df).orderBy($"doc_id").collect()
    val decl = TextAnalysis.repetitionSignalsDeclarative(df).orderBy($"doc_id").collect()
    assert(native.length == decl.length)
    native.zip(decl).foreach { case (a, b) =>
      assert(a == b, s"native vs declarative mismatch for doc ${a.getLong(0)}")
    }
  }
}
