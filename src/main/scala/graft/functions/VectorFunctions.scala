package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Vector math over `array<float>` embedding columns (SURVEY.md §2-B
  * "similarity"; fixture: embeddings.embedding, 64-dim unit-norm).
  *
  * Determinism contract shared with the DuckDB oracle: each float pair is
  * widened to double (exact), multiplied (exact in double for float inputs),
  * and accumulated strictly left-to-right from 0.0 — the same op sequence as
  * DuckDB `list_reduce(list_prepend(0.0, list_transform(...)), +)`, so the
  * resulting doubles are bit-identical across engines regardless of SIMD or
  * partitioning.
  */
object VectorFunctions {

  /** Reference implementation via higher-order functions (codegen'd by
    * Catalyst, no UDF).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x)

  /** Native Catalyst expression: tight loop over the two float arrays, no
    * per-element lambda dispatch — the hot-path form for 100 TB scans. Same
    * left-to-right double accumulation as [[dotHof]] (verified equal in
    * VectorFunctionsSpec).
    */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Cosine similarity for not-necessarily-normalized vectors. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))
}

/** dot(array<float>, array<float>) -> double, accumulated left-to-right in
  * double precision. Whole-stage-codegen capable via doGenCode.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // nullable even for non-null children: length mismatch yields null (the
  // codegen assigns ev.isNull, which must exist as a variable)
  override def nullable: Boolean = true

  // Length mismatch => null (a ragged embedding is a data error; a partial
  // dot would be a plausible-looking wrong score, and the DuckDB oracle's
  // out-of-range list index also yields NULL — consistent).
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    if (x.length != y.length) null
    else {
      var acc = 0.0
      var i = 0
      while (i < x.length) {
        acc += x(i).toDouble * y(i).toDouble
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val i = ctx.freshName("i")
      s"""
         |float[] $x = $a.toFloatArray();
         |float[] $y = $b.toFloatArray();
         |if ($x.length != $y.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = 0.0;
         |  for (int $i = 0; $i < $x.length; $i++) {
         |    ${ev.value} += ((double) $x[$i]) * ((double) $y[$i]);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
