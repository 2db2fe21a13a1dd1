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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.isEmpty || args.exists(n.startsWith))
    names.foreach { name =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        println(f"[time] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
        if (i == 1 && sys.env.contains("SPARK_GRAFT_EXPLAIN"))
          println(df.queryExecution.executedPlan.toString.take(8000))
      }
    }
    spark.stop()
  }
}
