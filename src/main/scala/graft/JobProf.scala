package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-query job profile (guide §1: find where the time goes before
  * touching anything): runs each named query through the bench's noop
  * sink with a listener recording every Spark job's wall time — the
  * kv/store lifecycle queries are SEQUENTIAL job chains, so the job list
  * IS the profile.
  *
  * Usage: scripts/run.sh graft.JobProf <query...>
  */
object JobProf {
  def main(args: Array[String]): Unit = {
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
    spark.sparkContext.setLogLevel("WARN")

    case class J(id: Int, desc: String, start: Long, var end: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .orElse(e.stageInfos.lastOption.map(si =>
            si.name.take(60) + s" [${si.numTasks}t]"))
          .getOrElse("")
        jobs.put(e.jobId, J(e.jobId, d, System.nanoTime()))
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.end = System.nanoTime()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // one warm pass (JVM/codegen), then the profiled pass
    args.foreach { q =>
      SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    args.foreach { q =>
      jobs.clear(); order.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain listener events (private bus — a short sleep suffices here)
      Thread.sleep(300)
      val js = order.toArray(Array.empty[Integer]).map(i => jobs.get(i.intValue()))
      println(f"==== $q%s wall=$wall%.3f s jobs=${js.length}%d")
      var prevEnd = 0L
      js.foreach { j =>
        val dur = (j.end - j.start) / 1e6
        val gap = if (prevEnd == 0L) 0.0 else (j.start - prevEnd) / 1e6
        prevEnd = math.max(prevEnd, j.end)
        println(f"  job ${j.id}%4d ${dur}%8.1f ms  (gap ${gap}%7.1f ms)  ${j.desc.take(110)}%s")
      }
    }
    spark.stop()
  }
}
