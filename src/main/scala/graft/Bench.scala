package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry: one JSON line with per-query seconds at the sf dir in
  * SPARK_GRAFT_SF_DIR. Each query is FULLY materialized through the noop
  * sink — `count()` would let Catalyst prune unreferenced compute-heavy
  * projections and report fantasy numbers. Failures propagate: a broken
  * query must break the bench, not score as fast. */
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

    // Drop finished queries' localCheckpoint blocks: each op materializes
    // its own intermediates per invocation, and letting ~150 executions'
    // blocks pile up in the block manager degrades late-running queries
    // (measured: q50 8.4s late-run vs 3.0s isolated). Session-cached index
    // state is driver/parquet-resident, never a persisted RDD, so this
    // touches nothing shared. BLOCKING, and called OUTSIDE the timed
    // region, so one query's eviction can't bleed into the next's number.
    def dropFinishedBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

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
      run(q); dropFinishedBlocks()
    }
    // settle before measuring: take the GC hit here, not inside the first
    // measured query
    System.gc()

    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val t0 = System.nanoTime()
      run(name)
      val dt = (System.nanoTime() - t0) / 1e9
      dropFinishedBlocks() // outside the timed region
      name -> dt
    }
    val qs = (results ++ buildMetrics)
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
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
      "q55_sq_topk" -> "build_q55_sq").map { case (q, metric) =>
      val t0 = System.nanoTime()
      run(q)
      metric -> (System.nanoTime() - t0) / 1e9
    }
}
