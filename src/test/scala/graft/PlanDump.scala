package graft

/** Scratch: dump plans of index-path queries while iterating on optimizer
  * rules. Not a spec. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val s = TestSpark.spark
    val dir = TestSpark.sfDir
    val df = SparkEntry.queries("q27_lateral_knn")(s, dir)
    println("=========== OPTIMIZED ===========")
    println(df.queryExecution.optimizedPlan.treeString)
    println("=========== EXECUTED ===========")
    println(df.queryExecution.executedPlan.treeString)
    df.show(20, truncate = false)
  }
}
