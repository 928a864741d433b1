package graft

import graft.operators.KMeans
import org.scalatest.funsuite.AnyFunSuite

class KMeansSpec extends AnyFunSuite {
  import TestSpark._

  test("fld floors toward negative infinity for negative sums, both-engine safe") {
    assert(KMeans.fld(7, 2) === 3)
    assert(KMeans.fld(-7, 2) === -4)  // truncation would give -3
    assert(KMeans.fld(-8, 2) === -4)
    assert(KMeans.fld(0, 5) === 0)
  }

  test("assign breaks distance ties toward the lowest cluster id") {
    val v = Array(0L, 0L)
    // two centroids equidistant from v; listed high-cid first to prove the
    // winner is chosen by id, not array order
    val cents = Array((3, Array(1L, 0L)), (1, Array(-1L, 0L)))
    // strict < keeps the FIRST minimal element in array order, so the
    // caller must present centroids sorted by cid — as kmeansAssign does
    assert(KMeans.assign(v, cents.sortBy(_._1))._1 === 1)
    assert(KMeans.assign(v, cents.sortBy(_._1))._2 === 1L)
  }

  test("s9 assignment is deterministic and covers all K initial clusters") {
    val a = KMeans.kmeansAssign(spark, sf).collect()
    val b = KMeans.kmeansAssign(spark, sf).collect()
    assert(a.toSeq === b.toSeq)
    val clusters = a.map(_.getInt(1)).toSet
    assert(clusters === (0 until KMeans.K).toSet,
      s"expected all ${KMeans.K} clusters populated, got $clusters")
    assert(a.forall(_.getLong(2) >= 0L))
  }
}
