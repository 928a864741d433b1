package graft

import org.apache.spark.sql.SparkSession

/** Plan-capture utility for the optimization-round deliverables: writes
  * `df.explain("formatted")` output for each named query to
  * `<outDir>/<query>_<suffix>.txt`. Session configured exactly like
  * [[Bench]] (same conf knobs, same `SPARK_GRAFT_CONF` A/B override) so
  * the captured plans are the benched plans.
  *
  * Usage: scripts/run.sh graft.PlanCap <outDir> <suffix> <query...>
  */
object PlanCap {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")
    val spark = sys.env.getOrElse("SPARK_GRAFT_CONF", "")
      .split(";").filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
      .foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val w = new java.io.PrintWriter(
        new java.io.File(outDir, s"${q}_$suffix.txt"), "UTF-8")
      try w.println(txt) finally w.close()
      System.err.println(s"[plancap] wrote $q ($suffix)")
    }
    spark.stop()
  }
}
