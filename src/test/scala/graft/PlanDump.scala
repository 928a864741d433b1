package graft

/** Ad-hoc plan dump helper (test scope): prints executedPlan for the named
  * queries — used interactively while tuning plan shapes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    import TestSpark._
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
