package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** DISTINCT xxhash64 values of word-`k`-gram shingles of a text, fused into
  * one pass over the raw bytes — value-identical (as a set; output is
  * sorted) to the composed form d3 previously ran:
  * {{{
  *   array_distinct(transform(sequence(0, size(w)-k),
  *     i -> xxhash64(w[i], ..., w[i+k-1])))     // w = split(text, " ")
  * }}}
  * Spark's variadic `xxhash64` chains the 64-bit state through its
  * arguments (seed 42, then each string's bytes via XXH64); this expression
  * replays exactly that chaining over (start, len) slices of the row's byte
  * buffer, so the hash VALUES are bit-identical — ShingleHashesSpec proves
  * it against the composed expression.
  *
  * What the fusion removes, per row: the split allocation (one UTF8String
  * per word), the `transform` closure + intermediate array, and the
  * `array_distinct` pass (dedup here is an allocation-free sort + compact
  * of the primitive long array). Tokenization mirrors `split(text, ' ')`
  * with limit -1: split at every single 0x20 byte, empty tokens (and a
  * trailing empty) preserved; a 0x20 byte never occurs inside a multi-byte
  * UTF-8 sequence, so byte scanning is code-point safe. Callers lowercase
  * upstream (`lower(text)`), matching the composed form.
  *
  * Fewer than `k` tokens yields an EMPTY array (the composed pipeline
  * reached the same end by filtering `size(w) >= k` before exploding).
  *
  * CodegenFallback is fine: the cost is hashing, not dispatch.
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires string, got ${other.catalogString}")
  }

  private val Seed = 42L // xxhash64's default seed (HashExpression)

  // Per-task scratch; nullSafeEval is single-threaded within a task.
  @transient private var tokStart: Array[Int] = _
  @transient private var tokLen: Array[Int] = _
  @transient private var hashes: Array[Long] = _

  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[UTF8String].getBytes
    // tokenize: split at every single space byte, empties preserved
    var nTok = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' '.toByte) nTok += 1; i += 1 }
    if (nTok < k) return new GenericArrayData(Array.emptyLongArray)
    if (tokStart == null || tokStart.length < nTok) {
      tokStart = new Array[Int](math.max(nTok, 64))
      tokLen = new Array[Int](math.max(nTok, 64))
    }
    var t = 0
    var st = 0
    i = 0
    while (i < b.length) {
      if (b(i) == ' '.toByte) {
        tokStart(t) = st; tokLen(t) = i - st; t += 1; st = i + 1
      }
      i += 1
    }
    tokStart(t) = st; tokLen(t) = b.length - st
    // hash every k-gram with xxhash64's seed chaining
    val nSh = nTok - k + 1
    if (hashes == null || hashes.length < nSh)
      hashes = new Array[Long](math.max(nSh, 64))
    i = 0
    while (i < nSh) {
      var h = Seed
      var j = 0
      while (j < k) {
        h = XXH64.hashUnsafeBytes(
          b, Platform.BYTE_ARRAY_OFFSET + tokStart(i + j), tokLen(i + j), h)
        j += 1
      }
      hashes(i) = h
      i += 1
    }
    // distinct via sort + compact: no boxing, no hash-set allocation
    java.util.Arrays.sort(hashes, 0, nSh)
    var w = 1
    i = 1
    while (i < nSh) {
      if (hashes(i) != hashes(w - 1)) { hashes(w) = hashes(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, math.min(w, nSh)))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ShingleHashes {
  /** Column API: sorted distinct xxhash64 values of the text's word-k-gram
    * shingles (empty array below k tokens; tokenization = split on ' ').
    */
  def shingleHashes(text: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), k))
}
