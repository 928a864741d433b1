package graft

import org.apache.spark.sql.SparkSession

/** Plan-capture tool (r19 optimization round): writes
  * `.explain("formatted")` output for named queries to files, and
  * optionally times each query through the noop sink (same methodology
  * as Bench, single pass).
  *
  * Usage: scripts/run.sh graft.PlanDump <sfDir> <outDir> <q1,q2,...> [--time]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val time = args.length > 3 && args(3) == "--time"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Warm exactly like Bench so timings are comparable.
    if (time) {
      SparkEntry.queries.get("q1_pricing_summary")
        .foreach(fn => fn(spark, sfDir).write.format("noop").mode("overwrite").save())
      operators.AnnIndex.locate(spark, sfDir)
      operators.AnnIndex.locateIvf(spark, sfDir)
      operators.AnnIndex.locateIncremental(spark, sfDir)
      operators.AnnIndex.locateWithDeletes(spark, sfDir)
      operators.Similarity.publishedNswGraph(spark, sfDir)
      operators.Similarity.publishedNswGraphIncr(spark, sfDir)
      operators.Similarity.publishedNswGraphDel(spark, sfDir)
      streaming.DedupIndex.locate(spark, sfDir)
      streaming.DedupIndex.locateGenerations(spark, sfDir)
    }
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(s"$outDir/$name.txt")
          try w.write(plan) finally w.close()
          if (time) {
            spark.sparkContext.setJobDescription(name)
            // min of two runs — same methodology as Bench (second run
            // amortizes codegen compile out of the number)
            def one(): Double = {
              val t0 = System.nanoTime()
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9
            }
            val a = one(); val b = one()
            println(f"[plandump] $name%-34s ${math.min(a, b)}%8.3f s  (p1=$a%.3f p2=$b%.3f)")
          } else println(s"[plandump] $name plan written")
      }
    }
    spark.stop()
  }
}
