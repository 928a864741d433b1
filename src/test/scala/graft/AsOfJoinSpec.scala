package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

/** Semantic unit test of the as-of join on a hand-built dataset. */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("asOf picks the latest right row at-or-before each left row per key") {
    import spark.implicits._
    // key, id, t, v
    val left = Seq(
      (1L, 100L, 10L, 0.0), // after right rows at t=5,8 -> expect v of t=8
      (1L, 101L, 5L, 0.0),  // ties right row at t=5 -> at-or-before includes it
      (1L, 102L, 3L, 0.0),  // before all right rows -> null
      (2L, 200L, 50L, 0.0)  // other key, right has nothing for key 2 -> null
    ).toDF("user_id", "event_id", "ts", "value")
    val right = Seq(
      (1L, 900L, 5L, 55.0),
      (1L, 901L, 8L, 88.0)
    ).toDF("user_id", "event_id", "ts", "value")

    val out = AsOfJoin.asOf(left, right, "ts", "ts", Seq("user_id"),
        "value", "event_id")
      .select("event_id", "asof_value")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    assert(out(100L) === Some(88.0))
    assert(out(101L) === Some(55.0))
    assert(out(102L) === None)
    assert(out(200L) === None)
  }
}
