package graft

import org.apache.spark.sql.functions._
import graft.functions.vector
import graft.index.IndexCatalog
import graft.ops.Dedup

/** Randomized differentials for the round-5 search family over SYNTHETIC
  * data with adversarial properties the parquet fixtures lack: duplicate
  * vectors, boundary ties, short/empty docs, repeated spans. Seeded —
  * deterministic across runs. */
class SearchPropertiesSpec extends GraftSparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)

  // 120 low-dim vectors INCLUDING exact duplicates (every 10th repeats the
  // previous vector) — exercises tie-breaking on equal distances
  private lazy val (table, index) = {
    graft.plans.GraftExtensions.install(spark)
    val vecs = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
    (0 until 120).foreach { i =>
      val v =
        if (i % 10 == 9 && vecs.nonEmpty) vecs.last._2
        else Array.fill(4)((rnd.nextInt(21) - 10).toFloat)
      vecs += ((i.toLong, v))
    }
    val df = vecs.toSeq.toDF("vec_id", "embedding")
    Graft.registerTable(spark, "prop_emb", df)
    if (IndexCatalog.get("prop_idx").isEmpty) {
      IndexCatalog.createIndex(spark, "prop_idx", "prop_emb", "embedding",
        Map("ef_search" -> "100000"))
    }
    ("prop_emb", "prop_idx")
  }

  test("radiusJoin == brute theta-join on duplicate-heavy random vectors, multiple radii") {
    val t = spark.table(table)
    val outer = t.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    for (r <- Seq(0.0, 5.0, 50.0, 1000.0)) {
      // compare full (qid, nid, dist) tuples — distances included, exact
      // (same sequential-fold kernel on both sides)
      val got = Graft.radiusJoin(spark, outer, "qid", "qvec", index, r,
          initialK = 3)
        .select(col("qid"), col("vec_id"), col("dist"))
        .orderBy(col("qid"), col("vec_id"), col("dist"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSeq
      val want = outer.crossJoin(t.select(col("vec_id"), col("embedding").as("iv")))
        .withColumn("dist", vector.array_distance_sq(col("qvec"), col("iv")))
        .where(col("dist") <= r)
        .select(col("qid"), col("vec_id"), col("dist"))
        .orderBy(col("qid"), col("vec_id"), col("dist"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSeq
      assert(got == want, s"radius $r: ${got.size} vs ${want.size} rows")
    }
  }

  test("indexTopKWhere == brute filtered top-k across predicates, duplicate ties included") {
    val t = spark.table(table)
    val qv = t.where(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    for (m <- Seq(2, 3, 7)) {
      val pred = col("vec_id") % m === 0
      val got = Graft.indexTopKWhere(spark, index, qv, 6, pred)
        .select(col("vec_id"), col("dist"))
        .orderBy(col("dist"), col("vec_id")).collect().toSeq
      val want = t
        .withColumn("dist", vector.array_distance_sq(col("embedding"), lit(qv)))
        .where(pred).orderBy(col("dist"), col(Graft.RowIdCol)).limit(6)
        .select(col("vec_id"), col("dist"))
        .orderBy(col("dist"), col("vec_id")).collect().toSeq
      assert(got == want, s"pred %$m")
    }
  }

  test("removeDuplicatedSpans matches a local reference implementation on random docs") {
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    // random docs with a planted shared span and random lengths 0..14
    val planted = Vector.fill(6)(vocab(rnd.nextInt(vocab.size)))
    val docs = (0L until 40L).map { i =>
      val len = rnd.nextInt(15)
      val toks = Vector.fill(len)(vocab(rnd.nextInt(vocab.size)))
      val withSpan = if (i % 7 == 0) toks ++ planted ++ toks else toks
      (i, withSpan.mkString(" "))
    }
    val w = 4
    // local reference: window hashes -> global counts -> covered positions
    val tokenized = docs.map { case (id, s) =>
      id -> s.split("\\s+").filter(_.nonEmpty).toVector
    }.toMap
    val winCounts = scala.collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    tokenized.values.foreach { ts =>
      ts.sliding(w).filter(_.length == w)
        .foreach(win => winCounts(win.mkString(" ")) += 1)
    }
    val wantRows = docs.map { case (id, _) =>
      val ts = tokenized(id)
      val covered = ts.sliding(w).zipWithIndex
        .filter { case (win, _) => win.length == w && winCounts(win.mkString(" ")) >= 2 }
        .flatMap { case (_, start) => start until (start + w) }.toSet
      val kept = ts.zipWithIndex.collect { case (t, i) if !covered.contains(i) => t }
      (id, kept.mkString(" "), ts.length.toLong, covered.size.toLong)
    }
    val got = Dedup.removeDuplicatedSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", windowLen = w, minOccurrences = 2)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == wantRows)
    // sanity: the planted span actually triggered removals somewhere
    assert(wantRows.exists(_._4 > 0))
  }

  test("VectorStats.centroids matches a local reference within float-reorder tolerance") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("embedding").isNotNull)
    val got = graft.ops.VectorStats.centroids(emb, "label", "embedding")
      .collect().map(r => (r.getInt(0),
        (r.getSeq[Double](1).toVector, r.getLong(2)))).toMap
    val local = emb.select(col("label"), col("embedding")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toVector)
      .groupBy(_._1).map { case (lbl, rows) =>
        val vecs = rows.map(_._2)
        val dim = vecs.head.length
        lbl -> (Vector.tabulate(dim)(d =>
          vecs.map(_(d).toDouble).sum / vecs.length), vecs.length.toLong)
      }
    assert(got.keySet == local.keySet)
    local.foreach { case (lbl, (want, n)) =>
      val (gc, gn) = got(lbl)
      assert(gn == n)
      want.indices.foreach { d =>
        assert(math.abs(gc(d) - want(d)) < 1e-9,
          s"label $lbl dim $d: ${gc(d)} vs ${want(d)}")
      }
    }
    // and the fixed-point projection divides back to the centroid ~1e-6
    val fp = graft.ops.VectorStats.centroidSumsFixedPoint(emb, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2).toDouble / (1048576.0 * r.getLong(3)))).toMap
    local.foreach { case (lbl, (want, _)) =>
      want.indices.take(8).foreach { d =>
        assert(math.abs(fp((lbl, d)) - want(d)) < 2e-6)
      }
    }
  }

  test("maxSimScores: hand-checked late-interaction scoring on axis vectors") {
    // unit axis vectors make cosines exact: e_i · e_j = 1 if i == j else 0
    def axis(i: Int): Array[Float] = Array.tabulate(4)(j => if (j == i) 1f else 0f)
    val queries = Seq((0L, axis(0)), (1L, axis(1))).toDF("qid", "qv")
    val corpus = Seq(
      // group 10 holds perfect matches for BOTH query vectors -> score 2
      (10, axis(0)), (10, axis(1)),
      // group 20 matches only query 0; its other member is orthogonal
      (20, axis(0)), (20, axis(2)),
      // group 30 is fully orthogonal -> score 0
      (30, axis(2)), (30, axis(3))).toDF("grp", "vec")
    val got = graft.ops.MultiVector.maxSimScores(
        queries, "qid", "qv", corpus, "grp", "vec")
      .orderBy(col("grp"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == Seq((10, 2.0, 2L), (20, 1.0, 2L), (30, 0.0, 2L)))
  }

  test("simHashNearDupPairs at bands=8 == brute pairs for hamming <= 7 on near-dup docs") {
    // docs that are near-copies (one token flipped) — dense small-hamming pairs
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = (0L until 12L).map { i =>
      val toks = base.split(" ").toVector
      val mutated =
        if (i == 0) toks
        else toks.updated(rnd.nextInt(toks.size), s"mut$i")
      (i, mutated.mkString(" "))
    }.toDF("doc_id", "text")
    val got = Dedup.simHashNearDupPairs(docs, "doc_id", "text",
        maxHamming = 7, bands = 8)
      .orderBy(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val sh = Dedup.simHash(docs, "doc_id", "text")
    val l = sh.select(col("doc_id").as("a"), col("simhash").as("ha"))
    val r2 = sh.select(col("doc_id").as("b"), col("simhash").as("hb"))
    val want = l.crossJoin(r2).where(col("a") < col("b"))
      .select(col("a"), col("b"),
        Dedup.hammingDist(col("ha"), col("hb")).as("h"))
      .where(col("h") <= 7)
      .orderBy(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == want)
    assert(got.nonEmpty, "near-copy fixture should produce close fingerprints")
  }
}
