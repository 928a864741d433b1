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

  test("d9 semantic dedup: dropped iff a lower-id cluster-mate clears cos 0.45") {
    val out = graft.operators.Dedup.semanticDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(out.nonEmpty)
    val embs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(out.length === embs.size, "one row per vector")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val cluster = out.map(t => t._1 -> t._2).toMap
    out.foreach { case (id, cl, kept) =>
      // ground truth ignores the hamming prefilter on purpose: the spec is
      // the end-to-end semantic claim, so a prefilter miss would fail here
      val hasLowerMate = embs.keys.exists(o =>
        o < id && cluster(o) == cl && cos(embs(o), embs(id)) >= 0.45)
      assert(kept === !hasLowerMate,
        s"vec $id in cluster $cl: kept=$kept but lower-mate=$hasLowerMate")
    }
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
