package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-dump harness for the optimization-round evidence files:
  * `runMain graft.PlanDump /path/outdir q21 q56 ...` writes
  * `<outdir>/<query>.txt` with the `.explain("formatted")` output of each
  * matching SparkEntry query (prefix match; no args = every query) against
  * SPARK_GRAFT_SF_DIR. Build artifacts are created exactly as Bench would
  * (the query closures build their own session artifacts on first use), so
  * the dumped plan is the plan the bench times. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <outdir> [queryPrefix...]")
    val outDir = new java.io.File(args(0))
    outDir.mkdirs()
    val prefixes = args.drop(1)
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
      .filter(n => prefixes.isEmpty || prefixes.exists(n.startsWith))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        val f = new java.io.File(outDir, s"$name.txt")
        val w = new java.io.PrintWriter(f, "UTF-8")
        try w.write(txt) finally w.close()
        println(s"[plandump] wrote ${f.getPath} (${txt.length} chars)")
      } catch {
        case e: Exception =>
          println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
