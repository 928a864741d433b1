package graft

import graft.operators.Scale
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleSpec extends AnyFunSuite {
  import TestSpark._

  test("salted join is row-identical to the plain join under heavy skew") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val big = (1 to 5000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toLong)).toDF("key", "id")
    val small = Seq(("HOT", "h"), ("k0", "a"), ("k3", "b")).toDF("key", "name")

    val plain = big.join(small, "key").select("key", "id", "name")
    val salted = Scale.saltedJoin(big, small, "key", saltFactor = 8,
      bigUniqueCol = "id").select("key", "id", "name")

    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("co-bucketed tables join without any shuffle exchange") {
    import spark.implicits._
    // in-memory catalog forgets tables across sessions but their managed
    // locations persist — clean both before writing
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val o = Tables.orders(spark, sf).select($"o_orderkey", $"o_totalprice")
    val l = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
    Scale.writeBucketed(o, "orders_b", "o_orderkey", 4)
    Scale.writeBucketed(l.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), "o_orderkey")
      val exec = joined.queryExecution.executedPlan
      val shuffles = exec.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"expected shuffle-free co-located join, got:\n${exec.treeString}")
      // and it still computes the right thing
      val expected = Tables.orders(spark, sf).join(
        Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
