package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signatures computed directly from a WORD array: for seed s,
  * minhash_s = min over word-k-gram shingles of
  * md5(concat_ws(' ', w[i..i+k-1]) ++ ":" ++ s) as lowercase hex — value-
  * identical to [[MinHashSignatures]] over
  * `transform(sequence(0, size(w)-k), i -> concat_ws(' ', slice(w, i+1, k)))`
  * for inputs with size(w) >= k — the composed form THROWS on shorter arrays
  * (descending `sequence`), where this expression returns null
  * (MinHashWordsSpec proves the equivalence on the guarded domain), and
  * byte-identical to the
  * DuckDB oracle's `min(md5(sh || ':' || s))` over the same shingling.
  *
  * Why fuse shingling into the expression instead of composing Catalyst
  * `transform`/`slice`/`concat_ws` + [[MinHashSignatures]]: the composed form
  * materializes every shingle as a fresh UTF8String (k word copies + struct
  * array per row) and pays one `MessageDigest.clone()` + 16-byte `digest()`
  * allocation per (shingle, seed). This expression keeps a single flat byte
  * buffer of the row's word bytes, feeds each shingle's bytes straight into
  * an incremental [[Md5]], and replays the per-seed suffix via allocation-
  * free state snapshot — zero per-shingle allocation. Measured 2.5-3x on the
  * d2 LSH pipeline at sf0.1.
  *
  * Rows with fewer than k words yield null (callers filter `size(w) >= k`,
  * matching the oracle's `len(w) >= k`). Null words are skipped exactly like
  * `concat_ws` skips null arguments.
  *
  * CodegenFallback is fine here: the cost is the digesting itself, not
  * expression dispatch.
  */
case class MinHashWords(child: Expression, k: Int, numSeeds: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && numSeeds >= 1)

  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_words requires array<string>, got ${other.catalogString}")
  }

  @transient private lazy val suffixes: Array[Array[Byte]] =
    Array.tabulate(numSeeds)(s => s":$s".getBytes("UTF-8"))

  // Per-task scratch (each task deserializes its own expression instance;
  // nullSafeEval is single-threaded within a task).
  @transient private lazy val base = new Md5
  @transient private lazy val tmp = new Md5
  @transient private lazy val out = new Array[Byte](16)
  @transient private lazy val mins: Array[Array[Byte]] =
    Array.fill(numSeeds)(new Array[Byte](16))
  @transient private var flat: Array[Byte] = _
  @transient private var offs: Array[Int] = _
  @transient private var lens: Array[Int] = _

  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val o = new Array[Char](32)
    var i = 0
    while (i < 16) {
      o(2 * i) = hexChars((d(i) >> 4) & 0xf)
      o(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(o)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return null
    // Flatten the row's word bytes once: each word is read from its
    // UTF8String exactly once, each shingle then streams slices of `flat`.
    if (offs == null || offs.length < n) {
      offs = new Array[Int](math.max(n, 64))
      lens = new Array[Int](math.max(n, 64))
    }
    var need = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) need += arr.getUTF8String(i).numBytes()
      i += 1
    }
    if (flat == null || flat.length < need)
      flat = new Array[Byte](math.max(need, 1024))
    var pos = 0
    i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        offs(i) = pos; lens(i) = -1
      } else {
        val u = arr.getUTF8String(i)
        val l = u.numBytes()
        Platform.copyMemory(u.getBaseObject, u.getBaseOffset,
          flat, Platform.BYTE_ARRAY_OFFSET + pos, l)
        offs(i) = pos; lens(i) = l
        pos += l
      }
      i += 1
    }
    var any = false
    i = 0
    while (i <= n - k) {
      base.reset()
      var first = true
      var j = 0
      while (j < k) {
        val l = lens(i + j)
        if (l >= 0) { // null words skipped, like concat_ws
          if (!first) base.updateByte(' '.toByte)
          base.update(flat, offs(i + j), l)
          first = false
        }
        j += 1
      }
      var s = 0
      while (s < numSeeds) {
        tmp.copyFrom(base)
        tmp.update(suffixes(s), 0, suffixes(s).length)
        tmp.digestInto(out)
        if (!any || lessThan(out, mins(s)))
          System.arraycopy(out, 0, mins(s), 0, 16)
        s += 1
      }
      any = true
      i += 1
    }
    if (!any) return null
    new GenericArrayData(
      mins.map(d => UTF8String.fromString(hex(d))).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashWords {
  /** Column API: `numSeeds` minhashes over word-`k`-gram shingles of a word
    * array (null if the array has fewer than `k` words).
    */
  def minhashWords(words: Column, k: Int, numSeeds: Int): Column =
    ColumnBridge.column(
      MinHashWords(ColumnBridge.expression(words), k, numSeeds))
}
