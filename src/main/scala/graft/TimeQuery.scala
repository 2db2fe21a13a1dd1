package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing/plan harness: `runMain graft.TimeQuery q25 q07`
  * runs just those SparkEntry queries (prefix match) against
  * SPARK_GRAFT_SF_DIR with the Bench noop-sink protocol, printing seconds
  * per run (twice each — cold then warm) and, with SPARK_GRAFT_EXPLAIN=1,
  * the formatted plan. Bench stays the honest full-suite meter; this is the
  * iteration loop. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]"), sfDir, cpus.toInt)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-run hypervisor-steal%: a virtualized host can eat double-digit
    // CPU during a window while loadavg shows nothing — printing it per
    // timed run lets a contended sample be discarded instead of committed
    // into ISOLATED.json as a bogus warm baseline
    def ticks(): Option[(Long, Long)] = ProcStat.stealTotalTicks()
    // GC deltas per timed run: lets an in-suite-conditions sample (many
    // session artifacts resident, heap pressure) be compared against an
    // isolated one — the q24 adjudication asked for exactly this signal
    import scala.jdk.CollectionConverters._
    def gc(): (Long, Long) = {
      val beans = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala
      (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
    }
    def heapUsedMb(): Long = {
      val m = java.lang.management.ManagementFactory.getMemoryMXBean
        .getHeapMemoryUsage
      m.getUsed >> 20
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.isEmpty || args.exists(n.startsWith))
    names.foreach { name =>
      (1 to 2).foreach { i =>
        val k0 = ticks()
        val (gcN0, gcMs0) = gc()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val (gcN1, gcMs1) = gc()
        val steal = for { (s0, c0) <- k0; (s1, c1) <- ticks(); if c1 > c0 }
          yield 100.0 * (s1 - s0) / (c1 - c0)
        val stealStr = steal.map(s => f" steal $s%.1f%%").getOrElse("")
        println(f"[time] $name run$i $dt%.2f s$stealStr " +
          f"gc=${gcN1 - gcN0} gc_ms=${gcMs1 - gcMs0} heap=${heapUsedMb()}M")
        if (i == 1 && sys.env.contains("SPARK_GRAFT_EXPLAIN"))
          println(df.queryExecution.executedPlan.toString.take(8000))
      }
    }
    spark.stop()
  }
}
