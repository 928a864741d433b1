package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ORDER physical layout (r15) — q83's pruning arithmetic turned into
  * an operator: a parquet layout writer that clusters rows by the bit-
  * interleave of two lookup dimensions, plus the planning-time bucket
  * derivation that turns a SECONDARY-dimension range predicate into a
  * literal partition filter.
  *
  * Why this shape: a linear layout (partition by the leading dimension)
  * gives file skipping on that dimension only — a predicate on the
  * second dimension scans EVERY file, the 100 TB failure q83 measures.
  * Interleaving the dimensions' bits puts BOTH dimensions' high bits in
  * the partition id, so each partition is a small box in (a, b) space
  * and a b-range predicate overlaps only the boxes whose fixed b-bits
  * admit it. The candidate-bucket set is derived DRIVER-SIDE from pure
  * bit structure (never from data): bucket boxes are the maximal b-range
  * the bucket's fixed bits allow, so the derived set is a guaranteed
  * superset of every file holding a matching row — pruning is always
  * sound, and the exact predicate still applies on top.
  *
  * Spark-first: the layout is plain `partitionBy("zb")` parquet — the
  * pruned read is ordinary partition pruning (`zb IN (...)` resolves at
  * file listing; `.explain` shows it in PartitionFilters and the scan
  * opens the predicted fraction of files). No custom reader, no stats
  * index to maintain: the z-bucket id IS the statistic.
  *
  * Domain: two dimensions, [[Bits]]-bit each (callers map their columns
  * into the domain, q83's `pmod 256` discipline); `bucketBits` top bits
  * of the interleave become the partition id (default 5 => 32 buckets,
  * q83's `div 2048`).
  */
object ZOrderLayout {
  val Bits = 8

  /** 16-bit interleave: z bit 2i = a_i, bit 2i+1 = b_i (q83's zExpr). */
  def zval(a: Column, b: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Write `df` z-clustered under `dir`: one `zb=<id>` partition dir per
    * occupied bucket, rows co-located by bucket before the write (one
    * shuffle, one file per occupied bucket per final partition). `a`/`b`
    * must already be in the [0, 2^Bits) domain.
    */
  def cluster(df: DataFrame, a: Column, b: Column, dir: String,
      bucketBits: Int = 5): Unit = {
    require(bucketBits >= 1 && bucketBits <= 2 * Bits,
      s"bucketBits must be in [1, ${2 * Bits}]")
    graft.Tables.spread(
        df.withColumn("zb",
          shiftright(zval(a, b), 2 * Bits - bucketBits).cast("long")),
        col("zb"))
      .write.partitionBy("zb").mode("errorifexists").parquet(dir)
  }

  /** Buckets whose structural b-box overlaps [lo, hi] — pure bit
    * arithmetic at planning, no data read. A bucket id fixes the z bits
    * [2*Bits-1 .. 2*Bits-bucketBits]; every b bit landing in that range
    * is pinned, the rest are free, so the bucket's reachable b interval
    * is [pinned bits with free=0, pinned bits with free=1].
    */
  def bucketsForBRange(lo: Int, hi: Int, bucketBits: Int = 5): Seq[Int] =
    (0 until (1 << bucketBits)).filter { zb =>
      var bmin = 0
      var bmax = 0
      (0 until Bits).foreach { bit =>
        val zpos = 2 * bit + 1
        if (zpos >= 2 * Bits - bucketBits) {
          val v = (zb >> (zpos - (2 * Bits - bucketBits))) & 1
          bmin |= v << bit
          bmax |= v << bit
        } else bmax |= 1 << bit
      }
      bmin <= hi && bmax >= lo
    }

  /** Pruned read for a b-range predicate: the derived bucket set becomes
    * a literal `zb IN (...)` partition filter (pruned at file listing);
    * the caller layers the exact row predicate on top.
    */
  def readBRange(s: SparkSession, dir: String, lo: Int, hi: Int,
      bucketBits: Int = 5): DataFrame =
    // Int literals: the discovered partition column infers IntegerType,
    // and a same-type IN list prunes at file listing — a Long list would
    // wrap zb in a cast and silently turn the partition filter into a
    // post-scan one
    s.read.parquet(dir).filter(
      col("zb").isin(bucketsForBRange(lo, hi, bucketBits): _*))

  // ======================= N-dim generalization (r16) ====================
  // The store-native persisted layout (BucketedPotTable.cluster) needs
  // more than two lookup dimensions; the interleave generalizes round-
  // robin — z bit (i*n + j) = bit i of dimension j — so the 2-dim [[zval]]
  // is exactly [[zvalN]](Seq(a, b)). Bucket derivation stays pure bit
  // structure: a bucket id pins the top `bucketBits` z bits, each
  // dimension's reachable interval follows from which of ITS bits land in
  // the pinned range.

  /** Round-robin n-dim interleave over [[Bits]]-bit dimensions. */
  def zvalN(cols: Seq[Column]): Column = {
    val n = cols.length
    require(n >= 2, "zvalN needs at least two dimensions")
    (for {
      i <- 0 until Bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j))
      .reduce(_ + _)
  }

  /** Buckets whose structural box overlaps [lo, hi] on dimension
    * `dimIdx` of an `nDims`-dim interleave — the N-dim
    * [[bucketsForBRange]] (which equals dimIdx=1, nDims=2). */
  def bucketsForRangeN(dimIdx: Int, nDims: Int, lo: Int, hi: Int,
      bucketBits: Int): Seq[Int] = {
    require(dimIdx >= 0 && dimIdx < nDims)
    require(bucketBits >= 1 && bucketBits <= nDims * Bits)
    (0 until (1 << bucketBits)).filter { zb =>
      var dmin = 0
      var dmax = 0
      (0 until Bits).foreach { bit =>
        val zpos = bit * nDims + dimIdx
        if (zpos >= nDims * Bits - bucketBits) {
          val v = (zb >> (zpos - (nDims * Bits - bucketBits))) & 1
          dmin |= v << bit
          dmax |= v << bit
        } else dmax |= 1 << bit
      }
      dmin <= hi && dmax >= lo
    }
  }
}
