package graft

/** Ad-hoc plan dump for whatever query is under the microscope —
  * `sbt "Test/runMain graft.PlanDump q44 q45"` prints the executed plan of
  * each matching SparkEntry query at the test SF. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val s = TestSpark.spark
    val dir = TestSpark.sfDir
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.isEmpty || args.exists(n.startsWith))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(s, dir)
      println(s"########## $name ##########")
      println("=========== OPTIMIZED ===========")
      println(df.queryExecution.optimizedPlan.treeString)
      println("=========== EXECUTED ===========")
      println(df.queryExecution.executedPlan.treeString)
    }
  }
}
