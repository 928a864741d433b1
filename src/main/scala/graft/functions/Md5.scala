package graft.functions

/** Minimal incremental MD5 (RFC 1321) with allocation-free state snapshot.
  *
  * `java.security.MessageDigest` forces one `clone()` (3 heap objects) plus
  * one 16-byte `digest()` allocation per (shingle, seed) — at 8 seeds over
  * millions of shingles that is the dominant GC cost of the MinHash
  * pipeline. This implementation exposes exactly what that hot loop needs:
  *
  *   - `copyFrom(other)` — snapshot/restore of the running state (4 ints +
  *     the <64-byte block buffer), so the digest state over a shingle's
  *     bytes is computed once and replayed per seed suffix with zero
  *     allocation;
  *   - `digestInto(out)` — finalization into a caller-owned 16-byte buffer.
  *
  * Instances are single-threaded (one per partition task). Output is
  * bit-identical to `MessageDigest.getInstance("MD5")` (Md5Spec proves it
  * over random inputs spanning all block-boundary cases).
  */
final class Md5 {
  private var a = 0
  private var b = 0
  private var c = 0
  private var d = 0
  private val buf = new Array[Byte](64)
  private var bufLen = 0
  private var total = 0L
  private val x = new Array[Int](16)
  reset()

  def reset(): Unit = {
    a = 0x67452301; b = 0xefcdab89; c = 0x98badcfe; d = 0x10325476
    bufLen = 0; total = 0L
  }

  /** Become a copy of `o` (the allocation-free `clone()`). */
  def copyFrom(o: Md5): Unit = {
    a = o.a; b = o.b; c = o.c; d = o.d
    System.arraycopy(o.buf, 0, buf, 0, o.bufLen)
    bufLen = o.bufLen; total = o.total
  }

  def update(bytes: Array[Byte], off: Int, len: Int): Unit = {
    var o = off
    var rem = len
    total += len
    if (bufLen > 0) {
      val take = math.min(64 - bufLen, rem)
      System.arraycopy(bytes, o, buf, bufLen, take)
      bufLen += take; o += take; rem -= take
      if (bufLen == 64) { transform(buf, 0); bufLen = 0 }
    }
    while (rem >= 64) { transform(bytes, o); o += 64; rem -= 64 }
    if (rem > 0) {
      System.arraycopy(bytes, o, buf, bufLen, rem)
      bufLen += rem
    }
  }

  def updateByte(v: Byte): Unit = {
    total += 1
    buf(bufLen) = v
    bufLen += 1
    if (bufLen == 64) { transform(buf, 0); bufLen = 0 }
  }

  /** Finalize into `out(0..15)`. Consumes the state — `reset()` or
    * `copyFrom()` before reuse.
    */
  def digestInto(out: Array[Byte]): Unit = {
    val bitLen = total << 3
    updateByte(0x80.toByte)
    if (bufLen > 56) {
      java.util.Arrays.fill(buf, bufLen, 64, 0.toByte)
      transform(buf, 0)
      bufLen = 0
    }
    java.util.Arrays.fill(buf, bufLen, 56, 0.toByte)
    var i = 0
    while (i < 8) {
      buf(56 + i) = ((bitLen >>> (8 * i)) & 0xff).toByte
      i += 1
    }
    transform(buf, 0)
    writeLE(out, 0, a); writeLE(out, 4, b); writeLE(out, 8, c); writeLE(out, 12, d)
  }

  private def writeLE(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte
    out(off + 1) = ((v >>> 8) & 0xff).toByte
    out(off + 2) = ((v >>> 16) & 0xff).toByte
    out(off + 3) = ((v >>> 24) & 0xff).toByte
  }

  private def transform(block: Array[Byte], off: Int): Unit = {
    var i = 0
    while (i < 16) {
      val o = off + i * 4
      x(i) = (block(o) & 0xff) | ((block(o + 1) & 0xff) << 8) |
        ((block(o + 2) & 0xff) << 16) | ((block(o + 3) & 0xff) << 24)
      i += 1
    }
    var aa = a; var bb = b; var cc = c; var dd = d
    val k = Md5.K
    val s = Md5.S
    i = 0
    while (i < 64) {
      var f = 0
      var g = 0
      if (i < 16) { f = (bb & cc) | (~bb & dd); g = i }
      else if (i < 32) { f = (dd & bb) | (~dd & cc); g = (5 * i + 1) & 15 }
      else if (i < 48) { f = bb ^ cc ^ dd; g = (3 * i + 5) & 15 }
      else { f = cc ^ (bb | ~dd); g = (7 * i) & 15 }
      val tmp = dd
      dd = cc
      cc = bb
      bb = bb + Integer.rotateLeft(aa + f + k(i) + x(g), s(i))
      aa = tmp
      i += 1
    }
    a += aa; b += bb; c += cc; d += dd
  }
}

object Md5 {
  // RFC 1321 sine-derived constants: K(i) = floor(abs(sin(i+1)) * 2^32)
  private val K: Array[Int] = Array(
    0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee,
    0xf57c0faf, 0x4787c62a, 0xa8304613, 0xfd469501,
    0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
    0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821,
    0xf61e2562, 0xc040b340, 0x265e5a51, 0xe9b6c7aa,
    0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
    0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed,
    0xa9e3e905, 0xfcefa3f8, 0x676f02d9, 0x8d2a4c8a,
    0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
    0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70,
    0x289b7ec6, 0xeaa127fa, 0xd4ef3085, 0x04881d05,
    0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
    0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039,
    0x655b59c3, 0x8f0ccc92, 0xffeff47d, 0x85845dd1,
    0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
    0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391)

  private val S: Array[Int] = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)
}
