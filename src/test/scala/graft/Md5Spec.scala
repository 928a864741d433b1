package graft

import java.security.MessageDigest

import graft.functions.Md5
import org.scalatest.funsuite.AnyFunSuite

/** Bit-identity of the allocation-free incremental [[Md5]] against
  * `MessageDigest.getInstance("MD5")` across all block-boundary cases, plus
  * the snapshot/replay (`copyFrom`) semantics the MinHash hot loop relies on.
  */
class Md5Spec extends AnyFunSuite {

  private def jdk(bytes: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("MD5").digest(bytes)

  private def ours(bytes: Array[Byte]): Array[Byte] = {
    val m = new Md5
    m.update(bytes, 0, bytes.length)
    val out = new Array[Byte](16)
    m.digestInto(out)
    out
  }

  test("matches MessageDigest for every length 0..130 (covers both padding branches)") {
    val rnd = new scala.util.Random(42)
    for (len <- 0 to 130) {
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      assert(ours(b).toSeq === jdk(b).toSeq, s"mismatch at len=$len")
    }
  }

  test("matches MessageDigest for large multi-block inputs") {
    val rnd = new scala.util.Random(7)
    for (len <- Seq(1024, 4096 + 13, 65536)) {
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      assert(ours(b).toSeq === jdk(b).toSeq, s"mismatch at len=$len")
    }
  }

  test("chunked updates equal one-shot digest regardless of split points") {
    val rnd = new scala.util.Random(99)
    val b = new Array[Byte](777)
    rnd.nextBytes(b)
    val expected = jdk(b).toSeq
    for (trial <- 0 until 20) {
      val m = new Md5
      var off = 0
      while (off < b.length) {
        val take = math.min(1 + rnd.nextInt(100), b.length - off)
        if (take == 1 && rnd.nextBoolean()) m.updateByte(b(off))
        else m.update(b, off, take)
        off += take
      }
      val out = new Array[Byte](16)
      m.digestInto(out)
      assert(out.toSeq === expected, s"mismatch on trial $trial")
    }
  }

  test("copyFrom snapshots mid-stream state; replaying suffixes matches fresh digests") {
    val rnd = new scala.util.Random(5)
    // prefix lengths straddling the 64-byte block boundary
    for (prefixLen <- Seq(0, 1, 63, 64, 65, 127, 128, 200)) {
      val prefix = new Array[Byte](prefixLen)
      rnd.nextBytes(prefix)
      val base = new Md5
      base.update(prefix, 0, prefixLen)
      val tmp = new Md5
      val out = new Array[Byte](16)
      for (s <- 0 until 8) {
        val suffix = s":$s".getBytes("UTF-8")
        tmp.copyFrom(base)
        tmp.update(suffix, 0, suffix.length)
        tmp.digestInto(out)
        assert(out.toSeq === jdk(prefix ++ suffix).toSeq,
          s"prefixLen=$prefixLen seed=$s")
      }
    }
  }

  test("reset allows instance reuse") {
    val m = new Md5
    val junk = Array.fill[Byte](100)(3)
    m.update(junk, 0, junk.length)
    val out = new Array[Byte](16)
    m.digestInto(out)
    m.reset()
    val b = "hello world".getBytes("UTF-8")
    m.update(b, 0, b.length)
    m.digestInto(out)
    assert(out.toSeq === jdk(b).toSeq)
  }
}
