package graft.tmp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object D3Prof {
  def t[A](label: String)(f: => A): A = {
    val s = System.nanoTime; val r = f
    println(f"$label%-28s ${(System.nanoTime - s) / 1e9}%.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val d = "/root/testdata/sf0.1"
    val w = graft.Tables.documents(s, d)
      .select($"doc_id", split(lower($"text"), " ").as("w"))
    // warm
    t("warm count docs")(w.count())
    t("split only")(w.select(size($"w")).agg(sum("size(w)")).collect())
    val docSh = w.filter(size($"w") >= 3)
      .select($"doc_id", explode(expr(
        "array_distinct(transform(sequence(0, size(w)-3), i -> xxhash64(w[i], w[i+1], w[i+2])))")).as("h"))
    t("shingle+explode count")(docSh.count())
    val rep = docSh.repartition($"h")
    t("repartition count")(rep.count())
    val ok = rep.groupBy($"h").agg(count(lit(1)).as("df")).filter($"df" <= 50)
    t("df agg count")(ok.count())
    val kept = rep.join(ok.select($"h"), Seq("h"), "left_semi")
    t("semi count")(kept.count())
    val full = graft.operators.Dedup.ngramJaccard(s, d)
    t("full d3")(full.count())
    t("full d3 again")(full.count())
    s.stop()
  }
}
