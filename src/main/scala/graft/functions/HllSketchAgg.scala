package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** q43's deterministic HyperLogLog as a NATIVE typed-imperative aggregate.
  *
  * The SQL formulation (q43, `Aggregates.hllDeterministic`) builds the
  * sketch in two exchanges: groupBy (group, bucket) -> max(rho), then
  * groupBy (group) -> harmonic sum. Correct and oracle-checked, but at
  * 100 TB it ships one row per DISTINCT (group, bucket, rho-carrier) into
  * the first shuffle and pays two full aggregate stages. This aggregate is
  * the production form: a 64-byte register buffer updated in place per
  * partition (ObjectHashAggregate partial), merged by bytewise max —
  * shuffle traffic collapses to #groups x 64 bytes regardless of input
  * size, exactly how a 1000-executor HLL should behave.
  *
  * Bit-parity contract: bucket/rho derivation is byte-identical to
  * [[graft.operators.Aggregates]]' md5 rho stream (b = first md5 byte
  * mod 64; rho = 1 + position of the first 1-bit in the next 60 bits, 61
  * if all-zero), so the emitted (hll_s_hi, hll_s_lo, hll_estimate) struct
  * hash-matches the same DuckDB oracle CTEs as q43. The final estimate is
  * computed in exact BigInteger arithmetic (floor((709 * 4096 * 2^61) /
  * (1000 * S))) — no floating point, same as the SQL path's DECIMAL(38,0)
  * division. u9 proves the parity query-level; FunctionsSpec pins the
  * merge associativity the distributed form relies on.
  */
object HllSketchAgg {
  /** hll_sketch(key) -> struct(hll_s_hi, hll_s_lo, hll_estimate), all
    * BIGINT (the q43 surface encoding: S as two base-2^34 halves).
    */
  def hllSketch(key: Column): Column =
    ColumnBridge.column(
      HllSketchAgg(ColumnBridge.expression(key)).toAggregateExpression())

  private val threadDigest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** (bucket, rho) from the md5 of the key's UTF-8 bytes — the native
    * mirror of the q43/q52 rho stream (hex-string arithmetic done on raw
    * digest nibbles: chars 1-2 = byte 0; chars 3..17 = nibbles 2..16).
    */
  private[graft] def bucketRho(key: Array[Byte]): (Int, Int) = {
    val md = threadDigest.get()
    md.reset()
    val h = md.digest(key)
    val b = h(0) & 63
    var z = 0
    var v = 0
    while (z < 15 && v == 0) {
      val nib = 2 + z
      v = if ((nib & 1) == 0) (h(nib >> 1) >> 4) & 0xf else h(nib >> 1) & 0xf
      if (v == 0) z += 1
    }
    val rho =
      if (z == 15) 61
      else z * 4 + (if (v >= 8) 0 else if (v >= 4) 1 else if (v >= 2) 2 else 3) + 1
    (b, rho)
  }

  /** Exact integer surface encoding shared with q43: S scaled to 2^61,
    * emitted as (S div 2^34, S mod 2^34, floor(alpha*m^2*2^61 / S)).
    */
  private[graft] def evalRegisters(regs: Array[Byte]): (Long, Long, Long) = {
    var s = java.math.BigInteger.ZERO
    val one = java.math.BigInteger.ONE
    var i = 0
    while (i < 64) {
      val mj = regs(i) & 0xff
      s = s.add(one.shiftLeft(61 - (if (mj == 0) 0 else mj)))
      i += 1
    }
    val hiLo = s.divideAndRemainder(java.math.BigInteger.valueOf(17179869184L))
    val est = new java.math.BigInteger("6696315672709156913020928")
      .divide(s.multiply(java.math.BigInteger.valueOf(1000L)))
    (hiLo(0).longValueExact(), hiLo(1).longValueExact(), est.longValueExact())
  }
}

case class HllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](64)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val (b, rho) = HllSketchAgg.bucketRho(v.asInstanceOf[UTF8String].getBytes)
      if (rho > (buffer(b) & 0xff)) buffer(b) = rho.toByte
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < 64) {
      if ((other(i) & 0xff) > (buffer(i) & 0xff)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = {
    val (hi, lo, est) = HllSketchAgg.evalRegisters(buffer)
    InternalRow(hi, lo, est)
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage

  override def dataType: DataType = StructType(Seq(
    StructField("hll_s_hi", LongType, nullable = false),
    StructField("hll_s_lo", LongType, nullable = false),
    StructField("hll_estimate", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}
