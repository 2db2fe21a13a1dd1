package graft

import org.apache.spark.sql.SparkSession

/** Adjudication harness for repeat over-bar `build_*` bench entries
  * (round-13 verdict ask #2: build_shared_index over 2× in three
  * consecutive records; build_shingle_index at 24.4 s vs ~6.8 s isolated).
  *
  * Replicates the bench's EXACT build protocol — family query cold
  * (build + JIT, untimed), drop the family's session artifacts, timed
  * steady-state REBUILD — but runs K consecutive drop+rebuild cycles in
  * one JVM, printing per-cycle wall/steal%/GC-count/GC-ms/live-heap.
  * The two hypotheses it separates:
  *   - ENVIRONMENTAL (the q24 story): cycle times are flat at the
  *     isolated denominator whenever per-cycle steal is low, and the
  *     inflated cycles are exactly the high-steal ones.
  *   - REAL suite-state cost (e.g. artifact-dir entries accumulating
  *     across the session, heap pressure): cycle times drift
  *     monotonically upward, or stay inflated at ~zero steal.
  * `--pollute N` first runs the suite's first N queries (their session
  * artifacts stay resident) so in-suite conditions are reproduced, the
  * same contrast the q24 adjudication used.
  *
  * Usage: `runMain graft.ProfileRebuild q16 q24 [--cycles 5] [--pollute 30]`
  * (args are warm-up-query prefixes from Bench.builds). */
object ProfileRebuild {
  def main(args: Array[String]): Unit = {
    val cycles = args.sliding(2).collectFirst {
      case Array("--cycles", n) => n.toInt }.getOrElse(5)
    val pollute = args.sliding(2).collectFirst {
      case Array("--pollute", n) => n.toInt }.getOrElse(0)
    val prefixes = args.filterNot(_.startsWith("--"))
      .filterNot(a => a.forall(_.isDigit))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    def ticks(): Option[(Long, Long)] = ProcStat.stealTotalTicks()
    import scala.jdk.CollectionConverters._
    def gc(): (Long, Long) = {
      val beans = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala
      (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
    }
    def heapUsedMb(): Long = java.lang.management.ManagementFactory
      .getMemoryMXBean.getHeapMemoryUsage.getUsed >> 20
    def settle(): Unit = { // bench-style: cleanup debt outside timed region
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(1500); System.gc(); Thread.sleep(500)
    }

    val targets = Bench.builds.filter { case (q, _, _) =>
      prefixes.isEmpty || prefixes.exists(q.startsWith) }
    if (pollute > 0) {
      val names = SparkEntry.queries.keys.toSeq.sorted.take(pollute)
      println(s"[rebuild] polluting session with ${names.size} suite queries")
      names.foreach { q => run(q); }
      settle()
      println(f"[rebuild] post-pollution heap=${heapUsedMb()}M")
    }
    targets.foreach { case (q, metric, _) =>
      run(q) // cold: family JIT + first artifact build, untimed
      settle()
      (1 to cycles).foreach { i =>
        SparkEntry.dropBuildArtifacts(spark, sfDir, q)
        settle()
        val k0 = ticks(); val (g0, m0) = gc()
        val t0 = System.nanoTime()
        run(q)
        val dt = (System.nanoTime() - t0) / 1e9
        val (g1, m1) = gc()
        val steal = (for { (s0, c0) <- k0; (s1, c1) <- ticks(); if c1 > c0 }
          yield 100.0 * (s1 - s0) / (c1 - c0)).getOrElse(-1.0)
        println(f"[rebuild] $metric cycle$i $dt%.2f s steal=$steal%.1f%% " +
          f"gc=${g1 - g0} gc_ms=${m1 - m0} heap=${heapUsedMb()}M")
      }
    }
    spark.stop()
  }
}
