package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature computation over a shingle array: for seed s,
  * minhash_s = min over shingles of md5(shingle ++ ":" ++ s) as lowercase
  * hex — byte-identical to the SQL `min(md5(sh || ':' || s))` the DuckDB
  * oracle runs (hex is per-byte monotone, so comparing raw digests equals
  * comparing hex strings).
  *
  * Why a native expression beats the composed form
  * (8 x array_min(transform(shs, x -> md5(concat(x, lit(":s")))))):
  *   - the seed goes in the SUFFIX, so the MD5 state over the shingle bytes
  *     is computed once and cloned per seed — ~num_seeds x less hashing;
  *   - min-tracking compares 16-byte digests, not 32-char strings, and only
  *     the num_seeds winners are hex-encoded per row;
  *   - one pass over the array instead of num_seeds lambda-evaluated passes.
  * CodegenFallback is fine here: the cost is the digesting itself, not
  * expression dispatch.
  */
case class MinHashSignatures(child: Expression, numSeeds: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = true

  // public API beyond the internal call site: reject non-string arrays at
  // analysis time instead of ClassCastException at runtime
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhashes requires array<string>, got ${other.catalogString}")
  }

  @transient private lazy val suffixes: Array[Array[Byte]] =
    Array.tabulate(numSeeds)(s => s":$s".getBytes("UTF-8"))

  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = new Array[Array[Byte]](numSeeds)
    val base = MessageDigest.getInstance("MD5")
    var i = 0
    var seen = false
    while (i < n) {
      // null elements are absent values, like SQL MIN over NULLs (the
      // shingle pipeline filters them, but the expression is public API)
      if (!arr.isNullAt(i)) {
        seen = true
        base.reset()
        base.update(arr.getUTF8String(i).getBytes)
        var s = 0
        while (s < numSeeds) {
          val md = base.clone().asInstanceOf[MessageDigest]
          md.update(suffixes(s))
          val dig = md.digest()
          if (mins(s) == null || lessThan(dig, mins(s))) mins(s) = dig
          s += 1
        }
      }
      i += 1
    }
    if (!seen) return null
    new GenericArrayData(
      mins.map(d => UTF8String.fromString(hex(d))).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashSignatures {
  /** Column API: array<string> of `numSeeds` minhashes for a shingle array. */
  def minhashes(shingles: Column, numSeeds: Int): Column =
    ColumnBridge.column(
      MinHashSignatures(ColumnBridge.expression(shingles), numSeeds))
}
