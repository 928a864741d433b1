package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRecord
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  private def md = MessageDigest.getInstance("MD5")

  test("media table carries binary containers with round-robin mime") {
    val m = Multimodal.mediaTable(spark, sf)
    val rows = m.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.media.length > 4))
    assert(rows.map(_.mime).toSet ===
      Set("image/png", "audio/wav", "video/mp4"))
    // every container opens with a known magic
    assert(rows.forall(r =>
      Set("GIMG", "GAUD", "GVID")(
        new String(r.media, 0, 4, StandardCharsets.US_ASCII))))
  }

  test("decode parses header fields and payload checksum from bytes alone") {
    val payload = "hello wörld" // multi-byte UTF-8 payload
    val bytes = s"GVID|w=320|h=240|c=3|f=12|$payload".getBytes(StandardCharsets.UTF_8)
    // mime deliberately wrong in the record: decode must trust the magic
    val f = Multimodal.decode(MediaRecord(7L, bytes, "image/png", "t"), md)
    assert(f.mime === "video/mp4")
    assert(f.width === 320 && f.height === 240 && f.channels === 3)
    assert(f.n_frames === 12)
    val payloadBytes = payload.getBytes(StandardCharsets.UTF_8)
    assert(f.n_payload === payloadBytes.length)
    assert(f.checksum_md5 ===
      md.digest(payloadBytes).map("%02x".format(_)).mkString)
  }

  test("frame hashes partition the payload: n_frames slices, exact cover") {
    import spark.implicits._
    val payload = "0123456789abcdefghij" // 20 bytes into 7 frames
    val bytes = s"GVID|w=8|h=8|c=3|f=7|$payload".getBytes(StandardCharsets.UTF_8)
    val ds = Seq(MediaRecord(3L, bytes, "video/mp4", "t")).toDS()
    val hashes = Multimodal.frameHashes(ds).collect().sortBy(_.frame_idx)
    assert(hashes.length === 7)
    assert(hashes.map(_.frame_idx).toSeq === (0 until 7))
    // each hash is the md5 of the contiguous slice [i*len/f, (i+1)*len/f)
    val expected = (0 until 7).map { i =>
      val from = i * payload.length / 7
      val until = (i + 1) * payload.length / 7
      md.digest(payload.substring(from, until)
        .getBytes(StandardCharsets.UTF_8)).map("%02x".format(_)).mkString
    }
    assert(hashes.map(_.frame_md5).toSeq === expected)
    // non-video containers contribute no frames
    val still = s"GIMG|w=8|h=8|c=3|f=1|$payload".getBytes(StandardCharsets.UTF_8)
    assert(Multimodal.frameHashes(
      Seq(MediaRecord(4L, still, "image/png", "t")).toDS()).count() === 0L)
  }

  test("decode fails loudly on unknown magic and malformed headers") {
    def rec(s: String) =
      MediaRecord(1L, s.getBytes(StandardCharsets.UTF_8), "x", "t")
    intercept[IllegalArgumentException](Multimodal.decode(rec("XXXX|w=1|h=1|c=1|f=1|p"), md))
    intercept[IllegalArgumentException](Multimodal.decode(rec("GIMG|w=|h=1|c=1|f=1|p"), md))
    intercept[IllegalArgumentException](Multimodal.decode(rec("GIMG|w=1|h=1|c=1|f=1"), md))
    intercept[IllegalArgumentException](Multimodal.decode(rec("GI"), md))
  }

  test("decode pipeline produces deterministic features, distributed") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .collect().map(f => f.media_id -> f).toMap
    val again = Multimodal.extractFeatures(
      Multimodal.mediaTable(spark, sf).repartition(7))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats === again) // partitioning must not change results
    feats.values.foreach { f =>
      assert(f.n_payload > 0)
      assert(f.width >= 16 && f.height >= 16)
      if (f.mime.startsWith("video")) assert(f.n_frames >= 1)
      else assert(f.n_frames === 1)
      assert(Set(1, 3)(f.channels))
    }
  }

  test("decode is the exact inverse of the synthesized encode") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // features parsed from bytes must equal the synthesis parameters
    val decoded = Multimodal.mediaFeatures(spark, sf)
    val expected = Tables.documents(spark, sf).select(
      $"doc_id".as("media_id"),
      element_at(typedLit(Seq("image/png", "audio/wav", "video/mp4")),
        ($"doc_id" % 3).cast("int") + 1).as("mime"),
      (lit(16) + $"doc_id" % 640).cast("int").as("width"),
      (lit(16) + ($"doc_id" * 7) % 480).cast("int").as("height"),
      when($"doc_id" % 3 === 1, 1).otherwise(3).cast("int").as("channels"),
      when($"doc_id" % 3 === 2, $"doc_id" % 30 + 1).otherwise(1)
        .cast("int").as("n_frames"),
      length($"text".cast("binary")).cast("int").as("n_payload"),
      md5($"text".cast("binary")).as("checksum_md5"))
      .orderBy($"media_id")
    assert(decoded.exceptAll(expected).isEmpty &&
      expected.exceptAll(decoded).isEmpty)
  }
}
