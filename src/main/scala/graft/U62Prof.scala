package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** THROWAWAY section profiler for the u62/u60/kv store-lifecycle floor —
  * times each driver-side phase of the u62 sequence. Not part of the
  * driver contract; delete after the round.
  */
object U62Prof {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      val t = System.nanoTime()
      println(f"  $tag%-28s ${(t - t0) / 1e6}%8.1f ms")
      t0 = t
    }
    (1 to 3).foreach { round =>
      println(s"== round $round")
      s.conf.set("spark.sql.catalog.graft_fns",
        classOf[graft.sources.GraftFunctionCatalog].getName)
      val root = java.nio.file.Files.createTempDirectory("graft-u62p").toString
      val fmt = classOf[graft.sources.BucketedPotV2Source].getName
      val nat = Tables.nation(s, d)
      def write(df: org.apache.spark.sql.DataFrame, upd: Int): Unit = df.select(
          lit("").as("pot_file"),
          concat(lit("n"), $"n_nationkey".cast("string")).as("key"),
          to_json(struct($"n_name".as("name"), lit(upd).as("upd")))
            .as("doc_json"))
        .write.format(fmt).option("path", root).option("buckets", "4")
        .mode("append").save()
      t0 = System.nanoTime()
      write(nat, 0); lap("write wave1")
      val base = graft.sources.BucketedPotV2Source.headVector(root, 4)
      lap("headVector")
      graft.sources.BucketedStmtLog.begin(root, "u62span",
        graft.sources.BucketedStmtLog.intentBody(
          "insert", "u62span", truncate = false, Long.MaxValue,
          base.keys.toSeq.sorted, base, Map.empty))
      lap("stmt begin")
      write(nat.filter($"n_regionkey" === 0), 1); lap("write wave2")
      val tIn = System.currentTimeMillis() + 3
      Thread.sleep(6)
      graft.sources.BucketedStmtLog.complete(root, "u62span", Seq.empty)
      lap("stmt complete")
      def probe(label: String) = {
        val df = s.read.format(fmt)
          .option("path", root).option("buckets", "4")
          .option("timestampAsOf", tIn.toString).load()
        lap(s"probe $label plan(load)")
        val out = df.agg(count(lit(1)).as("n"),
            sum(get_json_object($"doc_json", "$.upd").cast("long")).as("n_upd"))
          .select(lit(label).as("probe"), $"n", $"n_upd")
          .localCheckpoint(true)
        lap(s"probe $label exec")
        out
      }
      probe("a")
      s.sql(s"CALL graft_fns.sys.vacuum_pot_retain('$root', '1.0')").collect()
      lap("vacuum retain 1h")
      probe("b")
      write(nat, 2); lap("write wave3")
      s.sql(s"CALL graft_fns.sys.vacuum_pot_retain('$root', '0')").collect()
      lap("vacuum retain 0")
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      lap("cleanup")
    }
    s.stop()
  }
}
