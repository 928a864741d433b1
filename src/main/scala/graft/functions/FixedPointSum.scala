package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.trees.{TernaryLike, UnaryLike}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Fast-math core of [[FixedPointSum]]: double -> scale-6 fixed point,
  * BIT-IDENTICAL to Spark's `CAST(x AS DECIMAL(38,6))`.
  *
  * Spark's cast goes `Decimal(BigDecimal(x)).changePrecision(38, 6)` =
  * `java.math.BigDecimal.valueOf(x)` (the SHORTEST decimal representation,
  * via `Double.toString`) then `setScale(6, HALF_UP)` — a per-row string
  * format + BigDecimal parse + BigDecimal round. [[scaled6]] produces the
  * same rounded value as a primitive long without strings for ~all rows:
  *
  *  - `a*1e6` is computed EXACTLY as a double pair via `Math.fma`
  *    (|a| < 4e9 so the head is below 2^52 and floor/fraction arithmetic
  *    is exact);
  *  - the only way shortest-repr rounding can differ from rounding `a`
  *    itself is when the true scaled value lies within `ulp(a)*5e5` of a
  *    HALF_UP boundary (shortest repr is within ulp/2 of a); outside a
  *    2x-margin band the fast path is therefore provably identical, and
  *    inside the band (probability ~ulp(a)*1e6 per row; ~1e-11 for
  *    price-sized values) it falls back to the exact BigDecimal route.
  */
object FixedPoint {
  /** Fast-path bound: above this, [[FixedPointSum]] routes the row through
    * a plain `CAST(x AS DECIMAL(38,6))` (the margin band nears 0.5 ulps of
    * the boundary spacing at 4e9, where the fast path stops paying).
    */
  final val FastBound: Double = 4e9

  /** HALF_UP(shortest-decimal-repr(x), 6) as a scaled long (value * 1e6).
    * Caller guarantees `!isNaN(x) && |x| < FastBound`.
    */
  def scaled6(x: Double): Long = {
    val a = Math.abs(x)
    val v = a * 1e6
    val r = Math.fma(a, 1e6, -v) // a*1e6 == v + r exactly
    var fl = Math.floor(v)
    var frac = (v - fl) + r // v - fl exact (both < 2^52, Sterbenz)
    if (frac < 0) { fl -= 1; frac += 1 }
    else if (frac >= 1) { fl += 1; frac -= 1 }
    // margin = 2 * (max distance of the shortest repr from a, scaled)
    //        + slack for the one rounding in `frac`'s final add
    val margin = Math.ulp(a) * 1e6 + 1e-15
    val n =
      if (Math.abs(frac - 0.5) <= margin) slowScaled6(a)
      else if (frac > 0.5) fl.toLong + 1
      else fl.toLong
    if (x < 0) -n else n
  }

  /** The exact route: identical operation sequence to Spark's cast. */
  private def slowScaled6(a: Double): Long =
    java.math.BigDecimal.valueOf(a)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** Final step of [[FixedPointSum]]: exact 128-bit scaled sum (hi, lo)
    * plus the optional DECIMAL(38,6) side-sum of out-of-fast-range rows,
    * overflow-checked to DECIMAL(38,6) (null on overflow, mirroring
    * `CheckOverflowInSum` with ANSI off) and cast to double exactly like
    * `CAST(decimal AS DOUBLE)` (`BigDecimal.doubleValue`).
    */
  def finish(hi: Long, lo: Long, big: Decimal): java.lang.Double = {
    var bd = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(hi).shiftLeft(64)
        .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo))),
      6)
    if (big != null) bd = bd.add(big.toJavaBigDecimal)
    if (bd.precision > 38) null else java.lang.Double.valueOf(bd.doubleValue())
  }
}

/** `CAST(x AS DECIMAL(38,6))` as a scaled LONG for the fast range
  * (finite, |x| < [[FixedPoint.FastBound]]); null outside it (the
  * aggregate routes those rows through the real decimal cast).
  */
case class ScaledLong6(child: Expression)
    extends UnaryExpression with UnaryLike[Expression] {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"scaled_long6 requires a DOUBLE child, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val x = v.asInstanceOf[Double]
      if (java.lang.Double.isNaN(x) || x >= FixedPoint.FastBound ||
        x <= -FixedPoint.FastBound) null
      else FixedPoint.scaled6(x)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val x = ctx.freshName("x")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${c.isNull}) {
        double $x = ${c.value};
        if (!(java.lang.Double.isNaN($x) || $x >= ${FixedPoint.FastBound}D ||
            $x <= -${FixedPoint.FastBound}D)) {
          ${ev.isNull} = false;
          ${ev.value} = graft.functions.FixedPoint.scaled6($x);
        }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): ScaledLong6 =
    copy(child = newChild)
}

/** Evaluation head of [[FixedPointSum]]: (hi, lo, big) -> nullable double.
  * hi/lo are non-nullable buffer longs; big is the nullable decimal
  * side-sum. Null result = decimal-38 overflow (legacy sum semantics).
  */
case class FinishFixedSum(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with TernaryLike[Expression] {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val hi = first.eval(input).asInstanceOf[Long]
    val lo = second.eval(input).asInstanceOf[Long]
    val b = third.eval(input)
    val r = FixedPoint.finish(hi, lo,
      if (b == null) null else b.asInstanceOf[Decimal])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = first.genCode(ctx)
    val l = second.genCode(ctx)
    val b = third.genCode(ctx)
    val boxed = ctx.freshName("boxed")
    ev.copy(code = code"""
      ${h.code}
      ${l.code}
      ${b.code}
      java.lang.Double $boxed = graft.functions.FixedPoint.finish(
        ${h.value}, ${l.value}, ${b.isNull} ? null : ${b.value});
      boolean ${ev.isNull} = ($boxed == null);
      double ${ev.value} = ${ev.isNull} ? 0.0D : $boxed.doubleValue();""")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): FinishFixedSum =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)` as a codegen'd
  * fixed-point aggregate — the engine-exact double sum (Ora.dsum) without
  * the per-row string-format/BigDecimal churn or the 16-byte decimal
  * buffer writes of the stock decimal Sum.
  *
  * Shape: per row, [[ScaledLong6]] converts the fast range (|x| < 4e9) to
  * a scaled long, accumulated into a 128-bit (hi, lo) long pair — plain
  * codegen long arithmetic, wrap-free by construction (|row| < 2^52, so
  * 2^75 rows would be needed to leave 127 bits). Out-of-range rows (huge,
  * NaN, infinities — none exist in realistic data) take the stock
  * `Cast -> DecimalAddNoOverflowCheck` route in a decimal side-slot, which
  * keeps the value semantics of the original form for every finite input.
  * The final value re-assembles hi/lo + side-sum into one BigDecimal,
  * applies the DECIMAL(38,6) overflow check (null, as with ANSI off), and
  * casts to double — the identical operation sequence, so results are
  * BIT-IDENTICAL to the original form (FixedPointSumSpec pins this
  * property-style; the cross-engine oracle contract is untouched).
  *
  * Overflow caveat (documented, not reachable by fixtures): with ANSI on,
  * the original form raises on decimal overflow / NaN input where this
  * aggregate returns null — identical behavior everywhere short of
  * overflow, which the Ora.dsum contract (price-scale values) excludes.
  */
case class FixedPointSum(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fixed_point_sum requires a DOUBLE child, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "fixed_point_sum"

  private val DecT = DecimalType(38, 6)
  private def nullDec = Literal.create(null, DecT)
  private def zeroDec = Literal(Decimal(0L, 38, 6), DecT)

  private lazy val isEmpty =
    AttributeReference("isEmpty", BooleanType, nullable = false)()
  private lazy val sumHi =
    AttributeReference("sumHi", LongType, nullable = false)()
  private lazy val sumLo =
    AttributeReference("sumLo", LongType, nullable = false)()
  private lazy val big = AttributeReference("big", DecT, nullable = true)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(isEmpty, sumHi, sumLo, big)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(true), Literal(0L), Literal(0L), nullDec)

  /** Carry-out bit of the unsigned 64-bit add `a + b = sum`. */
  private def carryOf(a: Expression, b: Expression, sum: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b),
        BitwiseAnd(BitwiseOr(a, b), BitwiseNot(sum))),
      Literal(63))

  private def add128(hi: Expression, lo: Expression, nHi: Expression,
      nLo: Expression): (Expression, Expression) = {
    val newLo = Add(lo, nLo, EvalMode.LEGACY)
    val carry = carryOf(lo, nLo, newLo)
    val newHi = Add(Add(hi, nHi, EvalMode.LEGACY), carry, EvalMode.LEGACY)
    (newHi, newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val n = ScaledLong6(child)
    val nOr0 = Coalesce(Seq(n, Literal(0L)))
    // out-of-fast-range rows (incl. NaN: Spark orders NaN greatest, and
    // the legacy cast of NaN/Inf/overflow yields null = row skipped)
    val hugeRow = If(
      Or(GreaterThanOrEqual(child, Literal(FixedPoint.FastBound)),
        LessThanOrEqual(child, Literal(-FixedPoint.FastBound))),
      Cast(child, DecT, None, EvalMode.LEGACY), nullDec)
    val (newHi, newLo) =
      add128(sumHi, sumLo, ShiftRight(nOr0, Literal(63)), nOr0)
    Seq(
      And(isEmpty, And(IsNull(n), IsNull(hugeRow))),
      newHi,
      newLo,
      If(IsNull(hugeRow), big,
        DecimalAddNoOverflowCheck(Coalesce(Seq(big, zeroDec)), hugeRow, DecT)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (newHi, newLo) = add128(sumHi.left, sumLo.left, sumHi.right, sumLo.right)
    Seq(
      And(isEmpty.left, isEmpty.right),
      newHi,
      newLo,
      If(IsNull(big.right), big.left,
        DecimalAddNoOverflowCheck(Coalesce(Seq(big.left, zeroDec)), big.right,
          DecT)))
  }

  override lazy val evaluateExpression: Expression =
    If(isEmpty, Literal.create(null, DoubleType),
      FinishFixedSum(sumHi, sumLo, big))

  override protected def withNewChildInternal(newChild: Expression): FixedPointSum =
    copy(child = newChild)
}

object FixedPointSum {
  /** Column face: engine-exact double sum, bit-identical to
    * `sum(c.cast(DecimalType(38,6))).cast("double")`.
    */
  def fixedSum(c: Column): Column =
    ColumnBridge.column(
      FixedPointSum(ColumnBridge.expression(c.cast("double")))
        .toAggregateExpression())
}
