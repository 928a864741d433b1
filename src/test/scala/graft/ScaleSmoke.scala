package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measured scale smoke (test scope, run by hand):
  * `sbt "Test/runMain graft.ScaleSmoke"` — replicates the sf0.1 embeddings
  * 10x (20k vectors, ~200M candidate pairs) and times the sketch-prefilter
  * d5 against the round-1 brute-force shape on identical data. Numbers land
  * in SURVEY.md §7.4b.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.shuffle.compress", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("graft-smoke").toString
    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
    (0 until 10).map(k => base.select(
        ($"vec_id" + lit(k * 1000000L)).as("vec_id"), $"embedding", $"label"))
      .reduce(_ unionByName _)
      .write.parquet(s"$dir/embeddings.parquet")
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    println(s"vectors: $n (${n * (n - 1) / 2} pairs)")

    val t0 = System.nanoTime()
    val pairs = operators.Dedup.embedNearDup(spark, dir).count()
    println(f"sketch-prefilter d5: $pairs pairs in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val t1 = System.nanoTime()
    val brute = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        graft.functions.VectorFunctions
          .dot(col("a.embedding"), col("b.embedding")).as("cos"))
      .filter($"cos" >= 0.45).count()
    println(f"round-1 brute force:  $brute pairs in ${(System.nanoTime() - t1) / 1e9}%.1f s")
    spark.stop()
  }
}
