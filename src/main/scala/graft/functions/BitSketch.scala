package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane bit sketch of an `array<float>` embedding: `numPlanes`
  * sign bits (dot with hyperplane p > 0) packed into `numPlanes/64` longs —
  * the compact cosine estimator behind the embedding near-dup prefilter
  * (hamming(sketch_a, sketch_b) concentrates at numPlanes * angle/pi, so a
  * cheap xor+popcount bounds the angle before any exact dot product runs).
  *
  * Determinism contract with the DuckDB oracle: hyperplane component (p, j)
  * is +1.0 iff the top bit of the first hex digit of md5("p:j") is set (the
  * same derivation as graft.operators.Similarity's 8-plane signature), each
  * product is (double)emb[j] * (+-1.0) — exact — and the per-plane sum
  * accumulates strictly left-to-right from 0.0, matching the oracle's
  * list_reduce. Bit order: word w of the result holds planes [64w, 64w+63],
  * plane p at bit position (p % 64).
  *
  * One pass per row computes all planes (numPlanes x dim fused
  * multiply-adds); CodegenFallback is fine because the arithmetic dominates
  * expression dispatch, same as [[MinHashSignatures]].
  */
case class BitSketch(child: Expression, numPlanes: Int, dim: Int)
    extends UnaryExpression with CodegenFallback {
  require(numPlanes % 64 == 0, s"numPlanes must be a multiple of 64: $numPlanes")

  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bit_sketch requires array<float>, got ${other.catalogString}")
  }

  /** Flattened plane components, [p * dim + j]. */
  @transient private lazy val planes: Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Double](numPlanes * dim)
    var p = 0
    while (p < numPlanes) {
      var j = 0
      while (j < dim) {
        md.reset()
        val hex = md.digest(s"$p:$j".getBytes("UTF-8"))
        // top bit of the first hex digit == bit 7 of the first byte
        out(p * dim + j) = if (((hex(0) >> 7) & 1) == 1) 1.0 else -1.0
        j += 1
      }
      p += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    val emb = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (arr.isNullAt(j)) return null
      emb(j) = arr.getFloat(j).toDouble
      j += 1
    }
    val words = new Array[Long](numPlanes / 64)
    var p = 0
    while (p < numPlanes) {
      var acc = 0.0
      val base = p * dim
      var i = 0
      while (i < dim) {
        acc += emb(i) * planes(base + i)
        i += 1
      }
      if (acc > 0.0) words(p / 64) |= 1L << (p % 64)
      p += 1
    }
    new GenericArrayData(words)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BitSketch {
  /** Column API: packed hyperplane sign bits for a float-array embedding. */
  def sketch(emb: Column, numPlanes: Int, dim: Int = 64): Column =
    ColumnBridge.column(
      BitSketch(ColumnBridge.expression(emb), numPlanes, dim))
}
