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
    val spark = SessionTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]"), sfDir, cpus.toInt)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Exact name or name-boundary prefix ("q2" must not sweep q20–q29):
    // a prefix matches the full name or a `<prefix>_`-delimited head.
    def matches(n: String, p: String): Boolean =
      n == p || n.startsWith(p + "_")
    val unmatched = prefixes.filter(p =>
      !SparkEntry.queries.keys.exists(matches(_, p)))
    require(unmatched.isEmpty,
      s"no query matches: ${unmatched.mkString(",")}")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.isEmpty || prefixes.exists(matches(n, _)))
    // an evidence run must not silently produce an incomplete plan set:
    // track failures and exit non-zero after the loop
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
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
            failed += name
            println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    } finally spark.stop()
    if (failed.nonEmpty)
      sys.error(s"plan dump failed for: ${failed.mkString(",")}")
  }
}
