package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("media table carries binary payloads with round-robin mime") {
    val m = Multimodal.mediaTable(spark, sf)
    val rows = m.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.media.nonEmpty))
    assert(rows.map(_.mime).toSet ===
      Set("image/png", "audio/wav", "video/mp4"))
  }

  test("decode pipeline produces deterministic features, distributed") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .collect().map(f => f.media_id -> f).toMap
    val again = Multimodal.extractFeatures(
      Multimodal.mediaTable(spark, sf).repartition(7))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats === again) // partitioning must not change results
    feats.values.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.width >= 16 && f.height >= 16)
      if (f.mime.startsWith("video")) assert(f.n_frames >= 1)
      else assert(f.n_frames === 1)
    }
  }
}
