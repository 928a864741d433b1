package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED ingest-dedup index st6/st7 match against — built once per
  * corpus, the way [[graft.operators.AnnIndex]] persists the ANN index
  * (same content-addressed location scheme and the same
  * [[graft.kv.CommitMarker]] stage-then-publish arbitration, so concurrent
  * cold-start builders race safely and a crashed builder never wedges
  * readers).
  *
  * This is the operational shape, not a bench trick: a production ingest
  * stream does NOT recompute its corpus fingerprint/LSH/band sets inside
  * every micro-batch's static-side plan — it maintains them as a persisted
  * index that ingestion reads (and the batch dedup jobs update). Persisting
  * here makes st6/st7's "match the stream against the corpus index" story
  * literal: the streaming queries read these parquet relations and
  * broadcast them, paying index BUILD cost at ingest time like s2-s4.
  *
  * Three relations, one generation under one marker:
  *   - `fp`:       distinct md5 text fingerprints of the corpus (st6 exact)
  *   - `bands`:    distinct (band, sig) MinHash LSH band signatures (st6)
  *   - `embbands`: bucket-capped per-band BitSketch signatures with the
  *                 member embedding (st7's verify side)
  */
object DedupIndex {

  /** Index-format version — BUMP THIS whenever [[build]]'s baked-in
    * signature semantics change: the shingle/minhash layout inside
    * [[graft.operators.Dedup.bandSigs]] (currently 3-shingles, 8 hashes,
    * 4 bands), the BitSketch planes behind `cappedCorpusBands`, or the
    * corpus split predicates below. The persisted index is
    * content-addressed by fixture dir and SURVIVES JVM restarts under
    * java.io.tmpdir, so without a version in the location a semantics
    * change would keep serving the stale relations while the oracle
    * reflects the new code — hash-red with no local pointer to the cause
    * (the same failure class AnnIndex's `graft-ivft` prefix bump closed).
    * The bucket cap is referenced directly so cap tuning invalidates
    * automatically.
    */
  private def prefix: String =
    s"graft-dedupidx-f1c${graft.operators.Dedup.LshBucketCap}"

  /** Committed index dir for fixture `d`, building on first use. */
  def locate(s: SparkSession, d: String): String =
    graft.operators.AnnIndex.locateIndex(s, d, prefix)(build)

  private def build(s: SparkSession, d: String, out: String): Unit = {
    import s.implicits._
    val docs = graft.Tables.documents(s, d)
    val corp = docs.filter($"source" =!= "src0")
    corp.select(md5($"text").as("c_fp")).distinct()
      .write.parquet(s"$out/fp")
    graft.operators.Dedup.bandSigs(s, d)
      .join(corp.select($"doc_id"), Seq("doc_id"))
      .select($"band", $"sig").distinct()
      .write.parquet(s"$out/bands")
    StreamingQueries.cappedCorpusBands(
        graft.Tables.embeddings(s, d).filter($"vec_id" % 5 =!= 3))
      .write.parquet(s"$out/embbands")
  }

  def fingerprints(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${locate(s, d)}/fp")

  def bands(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${locate(s, d)}/bands")

  def embBands(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${locate(s, d)}/embbands")

  // ------------------------------------------------------------------
  // Appendable generations (st10): the corpus GROWS after the index is
  // first built — the d2/p4 band relations change, and a production
  // ingest stream must see the appended batch without a full rebuild.
  // Same maintenance story AnnIndex got in r10: each corpus batch is one
  // CommitMarker-published generation; readers union the committed
  // generations. (A compactor folding generations periodically is
  // AnnIndex.compact's role; the dedup relations are re-derivable from
  // the corpus, so a fold here is just a rebuild at a higher generation.)
  // ------------------------------------------------------------------

  /** The fixture's append split: the corpus (`source <> 'src0'`) arrives
    * as a base batch (`doc_id % AppendMod != AppendRem`) and a later
    * append (`== AppendRem`). Mirrored LITERALLY in the st10 oracle via
    * p4's full-corpus SQL — base + append = corpus, which is exactly the
    * equivalence st10 checks.
    */
  private[graft] val AppendMod = 4L
  private[graft] val AppendRem = 1L

  /** Generation-addressed variant of [[prefix]] — same invalidation keys. */
  private def prefixIncr: String =
    s"graft-dedupidxincr-f1c${graft.operators.Dedup.LshBucketCap}"

  /** Build `fp` + `bands` for one corpus slice (the appendable index's
    * per-generation payload; `embbands` stays with the build-once index).
    */
  private def buildSlice(
      s: SparkSession, d: String, out: String,
      pred: org.apache.spark.sql.Column): Unit = {
    import s.implicits._
    val corp = graft.Tables.documents(s, d)
      .filter($"source" =!= "src0").filter(pred)
    corp.select(md5($"text").as("c_fp")).distinct()
      .write.parquet(s"$out/fp")
    graft.operators.Dedup.bandSigs(s, d)
      .join(corp.select($"doc_id"), Seq("doc_id"))
      .select($"band", $"sig").distinct()
      .write.parquet(s"$out/bands")
  }

  /** Base + appended generations, building either on first use — the
    * generations' content is a pure function of the immutable fixture, so
    * [[graft.operators.AnnIndex.ensureGeneration]]'s adopt-on-loss CAS is
    * the right arbitration (a non-reproducible production batch would go
    * through AnnIndex.append semantics instead).
    */
  def locateGenerations(s: SparkSession, d: String): Seq[(Long, String)] = {
    import s.implicits._
    val base = graft.operators.AnnIndex.indexBase(prefixIncr, d)
    val g1 = graft.operators.AnnIndex.ensureGeneration(s, base, 1L)(out =>
      buildSlice(s, d, out, $"doc_id" % AppendMod =!= AppendRem))
    val g2 = graft.operators.AnnIndex.ensureGeneration(s, base, 2L)(out =>
      buildSlice(s, d, out, $"doc_id" % AppendMod === AppendRem))
    Seq((1L, g1), (2L, g2))
  }

  /** Union-of-generations readers. The band relation is re-DISTINCTed
    * after the union: a (band, sig) present in both batches would
    * otherwise appear twice and DUPLICATE stream rows through st10's
    * per-band left joins — multiplicity, not just membership, matters
    * there. The distinct shuffles the (small) index relation, never the
    * corpus; periodic folding keeps the generation count bounded.
    */
  def fingerprintsAll(s: SparkSession, d: String): DataFrame =
    locateGenerations(s, d)
      .map { case (_, dir) => s.read.parquet(s"$dir/fp") }
      .reduce(_ unionByName _).distinct()

  def bandsAll(s: SparkSession, d: String): DataFrame =
    locateGenerations(s, d)
      .map { case (_, dir) => s.read.parquet(s"$dir/bands") }
      .reduce(_ unionByName _).distinct()
}
