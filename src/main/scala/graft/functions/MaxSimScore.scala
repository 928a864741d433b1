package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** s20's late-interaction scorer as a NATIVE whole-stage-codegen expression.
  *
  * The higher-order-function formulation (nested transform/aggregate/
  * zip_with) is CodegenFallback in Spark: every row pays interpreted lambda
  * dispatch plus slice allocations for the tokens²·subdim multiplies — the
  * measured cost at 10x data was 16x wall. This expression is the tight
  * triple loop instead: two flat BIGINT arrays in, one BIGINT out, no
  * allocation beyond the two array copies, fully inside whole-stage codegen
  * — the hot-path form for a 100 TB corpus scan (same discipline as
  * [[FloatDot]]). Semantics are bit-identical to the HOF form (pinned by
  * the PropertySpec exact replay and a FunctionsSpec equivalence test):
  * score = Σ over query tokens of max over doc tokens of the integer dot.
  */
object MaxSimScore {
  /** maxsim(doc, query) over flat quantized arrays split into `tokens`
    * equal-length token vectors.
    */
  def maxsim(doc: Column, query: Column, tokens: Int): Column =
    ColumnBridge.column(MaxSimScore(
      ColumnBridge.expression(doc), ColumnBridge.expression(query), tokens))
}

/** maxsim(array<bigint>, array<bigint>) -> bigint. Null on ragged input
  * (length mismatch or not divisible by `tokens`) — consistent with
  * [[FloatDot]]'s ragged-input contract.
  */
case class MaxSimScore(left: Expression, right: Expression, tokens: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val d = a.asInstanceOf[ArrayData].toLongArray()
    val q = b.asInstanceOf[ArrayData].toLongArray()
    if (d.length != q.length || d.length % tokens != 0) null
    else {
      val sub = d.length / tokens
      var acc = 0L
      var qt = 0
      while (qt < tokens) {
        var best = Long.MinValue
        var dt = 0
        while (dt < tokens) {
          var dot = 0L
          var i = 0
          while (i < sub) {
            dot += q(qt * sub + i) * d(dt * sub + i)
            i += 1
          }
          if (dot > best) best = dot
          dt += 1
        }
        acc += best
        qt += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("d")
      val q = ctx.freshName("q")
      val sub = ctx.freshName("sub")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val dot = ctx.freshName("dot")
      val qt = ctx.freshName("qt")
      val dt = ctx.freshName("dt")
      val i = ctx.freshName("i")
      s"""
         |long[] $d = $a.toLongArray();
         |long[] $q = $b.toLongArray();
         |if ($d.length != $q.length || $d.length % $tokens != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $sub = $d.length / $tokens;
         |  long $acc = 0L;
         |  for (int $qt = 0; $qt < $tokens; $qt++) {
         |    long $best = Long.MIN_VALUE;
         |    for (int $dt = 0; $dt < $tokens; $dt++) {
         |      long $dot = 0L;
         |      for (int $i = 0; $i < $sub; $i++) {
         |        $dot += $q[$qt * $sub + $i] * $d[$dt * $sub + $i];
         |      }
         |      if ($dot > $best) $best = $dot;
         |    }
         |    $acc += $best;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
