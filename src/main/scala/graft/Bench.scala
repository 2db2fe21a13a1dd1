package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry: one JSON line with per-query seconds at the sf dir in
  * SPARK_GRAFT_SF_DIR. Each query is FULLY materialized through the noop
  * sink — `count()` would let Catalyst prune unreferenced compute-heavy
  * projections and report fantasy numbers. Failures propagate: a broken
  * query must break the bench, not score as fast.
  *
  * Output protocol: the harness that invokes this captures only the LAST
  * ~2000 characters of stdout, so the final stdout line is a COMPACT JSON
  * (short `qNN` keys, 3-decimal seconds — ~1.3k chars for 77 queries + 9
  * builds) that fits the tail window whole. The full-precision,
  * full-name JSON goes to the file named by BENCH_OUT (default
  * `BENCH_FULL.json` in the working directory). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Post-query settle, all OUTSIDE the timed region. Two leaks otherwise
    // degrade late-running queries as the suite grows (suite-interaction,
    // invisible when a query runs isolated — q45 measured 2.9 s alone vs
    // 6.4 s late in a 77-query suite):
    //  - localCheckpoint blocks: each op materializes its own intermediates
    //    per invocation; ~150 executions' blocks pile up in the block
    //    manager. Unpersist (blocking) drops them.
    //  - broadcasts + shuffle files: freed by the ContextCleaner only when
    //    the JVM garbage-collects the driver-side handles; a 100+ GiB heap
    //    GCs rarely, so hundreds of executions' broadcast blocks and
    //    shuffle files accumulate. A periodic System.gc() lets the cleaner
    //    reclaim them between queries instead of mid-measurement.
    // Session-cached index state is driver/parquet-resident, never a
    // persisted RDD, so none of this touches shared state.
    var sinceGc = 0
    def settle(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      sinceGc += 1
      if (sinceGc >= 8) { System.gc(); sinceGc = 0 }
    }

    // Warm-up outside timing: JVM, codegen, and parquet-footer costs land
    // here instead of inflating the first measured query. Index builds are
    // session-cached (SparkEntry.setupIndexOnce / sharedIndex / IVF reuse) —
    // running one query from each index family here moves the build cost out
    // of the measured runs, so per-query times compare across rounds; each
    // family's warm-up time (build + one query) is reported as its own
    // `build_*` metric below.
    run("q01_pricing_summary")
    val buildMetrics = runBuilds(run)
    // Then warm EVERY query once: the measured pass below reports
    // steady-state plan cost, not first-invocation codegen/JIT — without
    // this, regex- and aggregate-heavy queries carry 3-10 s of one-time
    // compilation that swamps cross-round comparison. Per-query work that
    // is PART of the operator (shuffles, localCheckpoint materializations)
    // still re-executes inside the measured run.
    SparkEntry.queries.keys.toSeq.sorted.foreach { q =>
      run(q); settle()
    }
    // settle before measuring: take the GC hit here, not inside the first
    // measured query
    System.gc()

    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val t0 = System.nanoTime()
      run(name)
      val dt = (System.nanoTime() - t0) / 1e9
      settle() // outside the timed region
      name -> dt
    }
    val all = results ++ buildMetrics
    val total = results.map(_._2).sum

    // Full-precision, full-name JSON → file (for STATUS and human diffing).
    val outPath = sys.env.getOrElse("BENCH_OUT", "BENCH_FULL.json")
    val fullQs = all.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (fullJson + "\n").getBytes("UTF-8"))

    // Compact line LAST on stdout: `q45_decontaminate` → `q45`,
    // `build_shared_index` → `b_shared_index`, seconds to 3 decimals.
    def shortKey(k: String): String =
      if (k.startsWith("build_")) "b_" + k.stripPrefix("build_")
      else k.takeWhile(_ != '_')
    // Locale.ROOT: the f-interpolator honors the JVM default locale, and a
    // comma-decimal locale would make this (the harness's only parsed
    // line) invalid JSON
    def sec3(v: Double): String =
      "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val compactQs = all
      .map { case (k, v) => s"""\"${shortKey(k)}\":${sec3(v)}""" }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"total","value":${sec3(total)},"unit":"sec","queries":$compactQs,"sf":"$sfDir","detail":"$outPath"}""")
  }

  private def runBuilds(run: String => Unit): Seq[(String, Double)] =
    Seq(
      "q16_index_topk" -> "build_shared_index",
      "q35_sharded_topk" -> "build_sharded_index",
      "q18_index_info" -> "build_q18_index",
      "q28_embedding_neardup" -> "build_q28_index",
      "q30_ivf_topk" -> "build_q30_ivf",
      "q41_pq_topk" -> "build_q41_pq",
      "q43_ivfpq_topk" -> "build_q43_ivfpq",
      "q53_bm25_indexed" -> "build_q53_term",
      "q55_sq_topk" -> "build_q55_sq",
      "q22_minhash_lsh_pairs" -> "build_dedup_sigs",
      "q24_jaccard_pairs" -> "build_shingle_index",
      "q23_simhash" -> "build_simhash_index",
      "q71_dedup_spans" -> "build_clean_corpus",
      "q79_graph_topk" -> "build_graph_index").map { case (q, metric) =>
      val t0 = System.nanoTime()
      run(q)
      metric -> (System.nanoTime() - t0) / 1e9
    }
}
