package graft.operators

import graft.Tables
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` / `embeddings` corpora —
  * the LLM-training-data pipeline surface (BASELINE.json north_star): exact,
  * MinHash+LSH banding, n-gram Jaccard, SimHash, embedding-cosine near-dup.
  *
  * Hashing is md5-based wherever the hash VALUE is part of the result
  * (d1/d2/d4 — both engines emit identical lowercase-hex md5). d3 is the
  * one exception: its shingle keys are Spark xxhash64 values used only as
  * join/grouping keys (never emitted), while the oracle joins on the exact
  * shingle strings — equality holds modulo 64-bit collisions (see
  * [[ngramJaccard]] for the quantified, accepted collision bound).
  *
  * Scale shapes (the part that matters at 100 TB):
  *   - shingling/minhashing is a narrow map + partial-aggregate per (doc,
  *     seed) — no shuffle grows beyond O(docs x seeds);
  *   - LSH banding turns near-dup search from O(n^2) into a self-join on
  *     (band, signature) — the shuffle key is the bucket, so only colliding
  *     docs ever meet; skewed buckets (boilerplate text) can be salted or
  *     capped without changing semantics;
  *   - the brute-force cosine pair scan is deliberately the BASELINE variant;
  *     the bucketed variant lives in Similarity.annLsh.
  */
object Dedup {

  /** Tokenized, lowercased word arrays. */
  private[operators] def words(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", split(lower($"text"), " ").as("w"))
  }

  /** Shared oracle CTE: distinct word-3-gram shingles per doc in DuckDB
    * (window-lead form) — the string-domain shingling that the fused
    * Spark-side forms mirror (MinHashWords' digest loop for d2, hashed
    * shingle keys for d3). There is deliberately no Spark-side string
    * materialization of this set anymore.
    */
  private[operators] val shinglesCte: String =
    """words AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |tok AS (SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i
      |        FROM words WHERE len(w) >= 3),
      |sh3 AS (SELECT doc_id,
      |          word || ' ' || LEAD(word,1) OVER (PARTITION BY doc_id ORDER BY i)
      |               || ' ' || LEAD(word,2) OVER (PARTITION BY doc_id ORDER BY i) AS sh
      |        FROM tok),
      |sh AS (SELECT DISTINCT doc_id, sh FROM sh3 WHERE sh IS NOT NULL)""".stripMargin

  /** Exact dedup: md5 fingerprint groups with representative doc (min id) and
    * copy count — `dropDuplicates` semantics made deterministic.
    */
  def exactFingerprint(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .groupBy(md5($"text").as("fp"))
      .agg(min($"doc_id").as("rep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy($"fp")
  }

  val exactFingerprintSql: String =
    """SELECT md5(text) AS fp, MIN(doc_id) AS rep_doc_id, COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY md5(text)
      |ORDER BY fp""".stripMargin

  /** Skew cap for LSH band buckets: buckets bigger than this are dropped
    * (quadratic in-bucket pair expansion; see the inline note in
    * [[minhashLsh]]). Mirrored in the oracle's HAVING.
    */
  val LshBucketCap = 100

  /** MinHash (8 seeds) + LSH banding (4 bands x 2 rows): candidate near-dup
    * pairs = docs agreeing on any band signature whose bucket is within
    * [[LshBucketCap]].
    */
  /** Per-doc LSH band signatures (doc_id, band, sig): fully map-side via
    * the native MinHashWords expression (shingling fused into the digest
    * loop, per-seed state snapshot, zero per-shingle allocation — see its
    * scaladoc): no explode, no aggregation shuffle. min over a
    * lexicographic md5 set is duplicate-insensitive, so no distinct needed.
    * Shared by [[minhashLsh]] and the incremental-dedup pipeline composite.
    */
  private[graft] def bandSigs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // r19 opt: spread before the MinHash digest — 8 seeds x one md5 per
    // shingle per doc is the heaviest map work in the dedup family, and
    // it ran at the scan's couple-of-input-splits parallelism for every
    // consumer (d2/d6/d11/d13/d16/d21, the incremental pipeline).
    val sigs = Tables.spread(words(s, d).filter(size($"w") >= 3), $"doc_id")
      .withColumn("mh",
        graft.functions.MinHashWords.minhashWords($"w", 3, 8))
      .select($"doc_id" +: (0 to 7).map(i => element_at($"mh", i + 1).as(s"h$i")): _*)
    sigs.select($"doc_id", expr(
      """stack(4, 0, concat(h0, h1), 1, concat(h2, h3),
        |         2, concat(h4, h5), 3, concat(h6, h7)) AS (band, sig)""".stripMargin))
  }

  /** Shared oracle CTE for [[bandSigs]] (builds `bands` on top of `sh`). */
  private[operators] val bandsCte: String =
    """mh AS (SELECT doc_id, seed, min(md5(sh || ':' || CAST(seed AS VARCHAR))) AS h
      |       FROM sh CROSS JOIN generate_series(0, 7) AS t(seed)
      |       GROUP BY doc_id, seed),
      |bands AS (SELECT doc_id, seed // 2 AS band,
      |            string_agg(h, '' ORDER BY seed) AS sig
      |          FROM mh GROUP BY doc_id, seed // 2)""".stripMargin

  def minhashLsh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bands = bandSigs(s, d)
    // Bucket-local pair generation (one shuffle keyed by the bucket, one pass
    // over the signatures) instead of a self-join, which would re-execute the
    // whole map-side pipeline for each side. Oversized buckets (a band
    // signature shared by boilerplate-heavy docs) are dropped outright: the
    // in-bucket pair expansion is quadratic in bucket size, and a bucket
    // over [[LshBucketCap]] is degenerate boilerplate, not near-dup signal.
    // Fixture max bucket is 12 (sf0.1), so fixture results are unchanged.
    bands
      .groupBy($"band", $"sig")
      .agg(collect_list($"doc_id").as("ids"))
      .filter(size($"ids") >= 2 && size($"ids") <= LshBucketCap)
      .select(explode(expr(
        "filter(flatten(transform(ids, a -> transform(ids, b -> struct(a, b)))), p -> p.a < p.b)"))
        .as("p"))
      .select($"p.a".as("doc_a"), $"p.b".as("doc_b"))
      .distinct()
      .orderBy($"doc_a", $"doc_b")
  }

  val minhashLshSql: String =
    """WITH __SH__,
       |__BANDS__,
       |ok AS (SELECT band, sig FROM bands
       |       GROUP BY band, sig HAVING COUNT(*) BETWEEN 2 AND 100)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
       |JOIN ok ON ok.band = a.band AND ok.sig = a.sig
       |ORDER BY doc_a, doc_b""".stripMargin
      .replace("__SH__", shinglesCte)
      .replace("__BANDS__", bandsCte)

  /** Document-frequency cap for the Jaccard shingle join: a shingle shared
    * by k docs contributes k^2 rows to ONE shuffle partition of the
    * self-join, so one boilerplate shingle ("all rights reserved ...") makes
    * a quadratic straggler at scale. Shingles with df > cap are dropped from
    * BOTH sets symmetrically (standard MinHash practice — ubiquitous
    * shingles carry no similarity signal), bounding every shingle's join
    * fan-out at cap^2. Fixture max df is 25 (sf0.1), so fixture results are
    * unchanged; ScaleSpec proves the bound on a synthetic hot shingle.
    */
  val ShingleDfCap = 50

  /** n-gram Jaccard: shingle-set similarity >= 0.8 via shingle
    * co-occurrence join, computed over the xxhash64-HASHED shingle domain
    * (the oracle joins exact strings): a 64-bit collision merges two
    * shingles' doc sets, so engine equality is modulo that collision —
    * birthday bound ~3 expected collisions at 10^10 distinct shingles,
    * ~1e-8 at fixture scale, immaterial jaccard noise either way, accepted
    * deliberately for the 8-byte shuffle key. Re-verify d3 after any
    * fixture/vocab change. Exact-integer jaccard (c / (na+nb-c)) so the
    * double division is engine-identical. Jaccard is over the df-capped
    * shingle sets — see [[ShingleDfCap]]; the cap is applied before BOTH
    * the per-doc counts and the co-occurrence join, mirrored in the oracle
    * CTE.
    *
    * Performance, accepted (round 6): the scale-correct plan — fused
    * [[graft.functions.ShingleHashes]] map side, one pinned h-keyed
    * exchange, count-agg df-cap before any doc list buffers — runs ~2.2 s
    * at sf0.1/local[32] (was 2.9 s before the fused expression) vs
    * DuckDB's 0.58 s. The residual is Spark's per-stage floor across the
    * 4-stage pipeline (exchange + 3 aggregations/joins) on a dataset small
    * enough that DuckDB finishes in-cache; the gap amortizes with data
    * volume and no further constant-factor work is planned here.
    */
  /** The d3/d14 shared relations: per-doc df-capped shingle counts (`cnt`:
    * doc_id, n) and per-pair co-occurrence counts (`common`: doc_a, doc_b,
    * c) over the hashed-shingle domain. Exactly d3's original body — d14
    * reuses the same plan with a different final metric.
    */
  private def cappedShinglePairs(
      s: SparkSession, d: String): (DataFrame, DataFrame) = {
    import s.implicits._
    // Map side: the fused ShingleHashes expression tokenizes, hashes every
    // 3-gram with variadic-xxhash64 seed chaining, and dedups within-doc
    // repeats in ONE pass over the raw text bytes (no split allocation, no
    // transform closure, no array_distinct pass — bit-identical values,
    // ShingleHashesSpec). 8-byte hashes cross the shuffle instead of
    // arbitrary-length strings. doc_id is unique in `documents`, so
    // (doc_id, h) is globally distinct with NO distinct shuffle at all.
    // The explicit repartition pins ONE physical h-keyed exchange that both
    // consumers below (df-count and semi-join probe) share via
    // ReuseExchange — without it each branch re-runs scan+shingle+hash.
    // After it, count, semi-join, and collect_set are all h-co-partitioned:
    // one shuffle of docSh total, shingling computed exactly once.
    // r19 opt: the pin is now REPARTITION_BY_NUM (Tables.spread) — a bare
    // repartition($"h") is REPARTITION_BY_COL, which AQE's byte-based
    // coalescing still shrinks, serializing the pair explosion +
    // aggregations downstream of this exchange (d14 measured 1.4x slower
    // with coalescing on).
    val docSh = Tables.spread(
      Tables.documents(s, d)
        .select($"doc_id", explode(
          graft.functions.ShingleHashes.shingleHashes(lower($"text"), 3))
          .as("h")),
      $"h")
    // Df-cap FIRST via a count aggregate — partial aggregation keeps each
    // task's state at (hash, long), so a boilerplate shingle with df = 10^8
    // costs a counter, never a materialized doc list. Only shingles under
    // the cap reach collect_set, whose per-key buffer is then bounded at
    // ShingleDfCap doc ids. (The previous shape collect_set-ed the full
    // doc list and size-filtered AFTER — O(df) memory in one reducer.)
    val ok = docSh.groupBy($"h").agg(count(lit(1)).as("df"))
      .filter($"df" <= ShingleDfCap)
    // ScaleSpec pins the shape: collect_set consumes the LeftSemi, so no
    // reducer ever buffers an uncapped doc list.
    val kept = docSh.join(ok.select($"h"), Seq("h"), "left_semi")
    val cnt = kept.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val common = kept
      .groupBy($"h").agg(collect_set($"doc_id").as("ids"))
      .filter(size($"ids") >= 2)
      .select(explode(expr(
        "filter(flatten(transform(ids, a -> transform(ids, b -> struct(a, b)))), p -> p.a < p.b)"))
        .as("p"))
      .groupBy($"p.a".as("doc_a"), $"p.b".as("doc_b"))
      .agg(count(lit(1)).as("c"))
    (cnt, common)
  }

  def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (cnt, common) = cappedShinglePairs(s, d)
    common
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select($"doc_a", $"doc_b",
        ($"c".cast("double") / (col("ca.n") + col("cb.n") - $"c")).as("jaccard"))
      .filter($"jaccard" >= 0.8)
      .orderBy($"doc_a", $"doc_b")
  }

  val ngramJaccardSql: String =
    """WITH __SH__,
       |shc AS (SELECT s.doc_id, s.sh FROM sh s
       |        JOIN (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= 50) ok
       |          USING (sh)),
       |cnt AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
       |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
       |           FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  CAST(c AS DOUBLE) / (ca.n + cb.n - c) AS jaccard
       |FROM common
       |JOIN cnt ca ON ca.doc_id = doc_a
       |JOIN cnt cb ON cb.doc_id = doc_b
       |WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin
      .replace("__SH__", shinglesCte)

  /** d14 containment threshold (percent), mirrored literally in the oracle. */
  val ContainmentMinPct = 90L

  /** d14: ASYMMETRIC containment dedup — pairs where the smaller doc's
    * shingle set is >= [[ContainmentMinPct]]% contained in the larger's
    * (c / min(na, nb) — Broder's containment, vs d3's symmetric Jaccard
    * c / (na + nb - c)). This is the subset-duplicate catch Jaccard
    * misses: a document prepended to a 10x-larger one has containment 1.0
    * but Jaccard ~0.1, so a Jaccard-thresholded dedup keeps both copies.
    * The `subset_only` flag marks exactly those pairs (containment-high,
    * Jaccard < d3's 0.8 bar); on this fixture every high-containment pair
    * is a full duplicate (flag false — the fixture plants copies, not
    * truncations), which the oracle verifies rather than assumes. All
    * comparisons are integer cross-multiplications — no division anywhere.
    *
    * Scale: identical to d3 (same shared [[cappedShinglePairs]] relations,
    * same single h-keyed exchange, ShingleDfCap bounds the pair fan-out at
    * cap^2 per shingle); the final metric is a per-pair integer test.
    */
  def containment(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (cnt, common) = cappedShinglePairs(s, d)
    common
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select($"doc_a", $"doc_b", $"c",
        col("ca.n").as("na"), col("cb.n").as("nb"),
        least(col("ca.n"), col("cb.n")).as("nmin"))
      .filter($"c" * 100L >= lit(ContainmentMinPct) * $"nmin")
      .select($"doc_a", $"doc_b", $"na", $"nb", $"c",
        expr("(c * 100) div nmin").as("cont_pct"),
        ($"c" * 5L < ($"na" + $"nb" - $"c") * 4L).as("subset_only"))
      .orderBy($"doc_a", $"doc_b")
  }

  val containmentSql: String =
    s"""WITH __SH__,
       |shc AS (SELECT s.doc_id, s.sh FROM sh s
       |        JOIN (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= $ShingleDfCap) ok
       |          USING (sh)),
       |cnt AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
       |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
       |           FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2)
       |SELECT doc_a, doc_b, ca.n AS na, cb.n AS nb, c,
       |  (c * 100) // LEAST(ca.n, cb.n) AS cont_pct,
       |  c * 5 < (ca.n + cb.n - c) * 4 AS subset_only
       |FROM common
       |JOIN cnt ca ON ca.doc_id = doc_a
       |JOIN cnt cb ON cb.doc_id = doc_b
       |WHERE c * 100 >= $ContainmentMinPct * LEAST(ca.n, cb.n)
       |ORDER BY doc_a, doc_b""".stripMargin
      .replace("__SH__", shinglesCte)

  /** SimHash: 32-bit signature per doc from token md5 bit-votes. Near-dups
    * share band prefixes (candidates via minhashLsh-style banding on the
    * signature; the signature itself is the oracle-checked artifact).
    */
  def simhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // One md5 per token row, all 32 bit-vote sums partial-aggregated in a
    // single groupBy — one shuffle of O(docs) x 32 longs, no bit explosion.
    val toks = words(s, d)
      .select($"doc_id", explode(array_distinct($"w")).as("tok"))
      .withColumn("h", md5($"tok"))
    val votes = (0 until 32).map { j =>
      sum(expr(
        s"(shiftright(CAST(conv(substring(h, ${j / 4 + 1}, 1), 16, 10) AS INT), ${3 - j % 4}) & 1) * 2 - 1"))
        .as(s"s$j")
    }
    val sums = toks.groupBy($"doc_id").agg(votes.head, votes.tail: _*)
    val sig = concat((0 until 32).map(j =>
      when(col(s"s$j") > 0, lit("1")).otherwise(lit("0"))): _*)
    sums.select($"doc_id", sig.as("simhash")).orderBy($"doc_id")
  }

  val simhashSql: String =
    """WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      |             FROM documents),
      |h AS (SELECT doc_id, md5(tok) AS h FROM tok),
      |bits AS (SELECT doc_id, j,
      |           ((strpos('0123456789abcdef', substr(h, j // 4 + 1, 1)) - 1)
      |             >> (3 - j % 4)) & 1 AS bit
      |         FROM h CROSS JOIN generate_series(0, 31) AS g(j)),
      |sums AS (SELECT doc_id, j, SUM(bit * 2 - 1) AS sw FROM bits GROUP BY doc_id, j)
      |SELECT doc_id,
      |  string_agg(CASE WHEN sw > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
      |FROM sums
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Number of hyperplanes in the embedding near-dup bit sketch, and the
    * hamming prefilter threshold (both mirrored in the oracle SQL).
    *
    * Why a hamming prefilter and not LSH band buckets: the fixture's true
    * pairs sit at cos 0.45-0.60 — INSIDE the bulk of the pairwise cosine
    * distribution (random 64-dim unit vectors, sigma ~ 0.125), where
    * sign-LSH per-bit agreement is 0.65 for a true pair vs 0.50 background.
    * Band amplification at that gap cannot reach full recall with real
    * pruning at ANY band shape (b bits/band: recall needs ~0.1*2^b bands,
    * i.e. >10^4 planes). The scalable EXACT design is coarse-then-fine:
    * a 256-bit sketch whose hamming distance estimates the angle
    * (h ~ Binomial(256, theta/pi)), a 4-long xor+popcount prefilter, and
    * the full 64-dim dot only on survivors — the quantize-then-rerank shape
    * production vector engines use.
    *
    * H=110 empirics on the fixtures: worst true-pair hamming is 98 (sf0.01,
    * 14 pairs) / 105 (sf0.1, 144 pairs) — zero misses with margin — while
    * background hamming concentrates at 128 +- 8, so only ~9% of pairs
    * reach the exact dot (11x fewer full-precision dots).
    */
  val SketchPlanes = 256
  val SketchHammingMax = 110

  /** Block-matrix split count for the pair-enumeration join: each vector
    * lands in block (vec_id mod K); the K^2 (block_a, block_b) cells are an
    * EQUI-join key, so pair enumeration is a hash/sort-merge join evenly
    * spread over K^2 cells — no broadcast-nested-loop, no cartesian, no
    * single hot partition. Each side is replicated K times (the standard
    * block-matrix trade: sqrt-of-cells replication); at cluster scale pick
    * K ~ sqrt(2 * target parallelism).
    */
  val BlockK = 8

  /** Embedding-cosine near-dup pairs (vectors are unit-norm so dot ==
    * cosine): exact dot >= 0.45 over sketch-prefiltered candidates.
    *
    * Shape: narrow map computes the [[graft.functions.BitSketch]] once per
    * vector; a broadcast K^2 cell relation turns all-pairs into a block
    * equi-join; the join residual is the 4-long xor+popcount hamming test;
    * only survivors pay the exact [[VectorFunctions.dot]]. Replaces the
    * round-1 brute-force non-equi self-join (nested-loop with a full dot
    * per pair — the worst plan in the repo per the round-2 verdict).
    */
  def embedNearDup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val K = BlockK
    val e = Tables.embeddings(s, d).select(
      $"vec_id", $"embedding",
      graft.functions.BitSketch.sketch($"embedding", SketchPlanes).as("sk"),
      pmod($"vec_id", lit(K.toLong)).as("blk"))
    val cells = s.range(K.toLong * K)
      .select(expr(s"id div $K").as("ba"), expr(s"id % $K").as("bb"))
    val a = e.select($"vec_id".as("vid_a"), $"embedding".as("emb_a"),
        $"sk".as("sk_a"), $"blk".as("ba"))
      .join(broadcast(cells), "ba")
    val b = e.select($"vec_id".as("vid_b"), $"embedding".as("emb_b"),
        $"sk".as("sk_b"), $"blk".as("bb"))
      .join(broadcast(cells), "bb")
    val ham = (0 until SketchPlanes / 64).map { w =>
      bit_count(element_at($"sk_a", w + 1)
        .bitwiseXOR(element_at($"sk_b", w + 1)))
    }.reduce(_ + _)
    // The cos threshold lives IN the join condition, after the cheap
    // conjuncts: were it a post-join filter, PushPredicateThroughJoin would
    // prepend it to the join condition and the full dot would run BEFORE the
    // popcount prefilter on every pair (verified on the physical plan).
    // Conjunct order in a hand-built condition is preserved and
    // short-circuits, so each pair pays: long compare, 4x xor+popcount,
    // and only then — for the ~9% hamming survivors — the exact dot.
    a.join(b,
        a("ba") === b("ba") && a("bb") === b("bb") &&
          $"vid_a" < $"vid_b" && ham <= SketchHammingMax &&
          VectorFunctions.dot($"emb_a", $"emb_b") >= 0.45)
      .select($"vid_a".as("vec_a"), $"vid_b".as("vec_b"),
        VectorFunctions.dot($"emb_a", $"emb_b").as("cos"))
      .orderBy($"vec_a", $"vec_b")
  }

  /** Shared oracle CTE chain deriving the 256-bit sketch of every vector as
    * a '0'/'1' string (char p+1 = plane p — the same md5 plane derivation
    * and left-to-right double accumulation as [[graft.functions.BitSketch]];
    * bit p of BitSketch word p/64 sits at position p%64). Shared by the d5
    * hamming prefilter and the d7 band derivation.
    */
  private[graft] val sketchSigsCte: String =
    """planes AS (
      |  SELECT p, j,
      |    CASE WHEN (((strpos('0123456789abcdef',
      |        substr(md5(CAST(p AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 1)) - 1)
      |        >> 3) & 1) = 1
      |      THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS v
      |  FROM generate_series(0, 255) t(p) CROSS JOIN generate_series(0, 63) u(j)),
      |plv AS (SELECT p, list(v ORDER BY j) AS vl FROM planes GROUP BY p),
      |dots AS (
      |  SELECT e.vec_id, q.p,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(range(1, 65),
      |        j -> CAST(e.embedding[j] AS DOUBLE) * q.vl[j])),
      |      (acc, x) -> acc + x) AS dotp
      |  FROM embeddings e CROSS JOIN plv q),
      |sigs AS (
      |  SELECT vec_id,
      |    string_agg(CASE WHEN dotp > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS sig
      |  FROM dots GROUP BY vec_id)""".stripMargin

  /** Oracle mirror: the hamming prefilter is semantic (a candidate pair must
    * agree on >= 146 of the 256 md5-derived hyperplane signs), so the oracle
    * derives the identical bit string per vector and applies the identical
    * hamming(sig_a, sig_b) <= 110 predicate; the block split is pure
    * physical layout (every pair maps to exactly one cell) and needs no
    * mirror.
    */
  val embedNearDupSql: String =
    """WITH __SIGS__
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list_transform(range(1, len(a.embedding) + 1),
      |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
      |    (acc, x) -> acc + x) AS cos
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |JOIN sigs sa ON sa.vec_id = a.vec_id
      |JOIN sigs sb ON sb.vec_id = b.vec_id
      |WHERE hamming(sa.sig, sb.sig) <= 110
      |  AND list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list_transform(range(1, len(a.embedding) + 1),
      |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
      |    (acc, x) -> acc + x) >= 0.45
      |ORDER BY vec_a, vec_b""".stripMargin
      .replace("__SIGS__", sketchSigsCte)

  /** Band width (bits) for d7's banded candidate generation on the fixture.
    * The sub-quadraticity/recall trade is governed by band width vs target
    * threshold (per-bit agreement p = 1 - theta/pi):
    *
    *   - cos >= 0.95 (the true near-duplicate-embedding regime, p ~ 0.90):
    *     16-bit bands x 16 -> ~96% recall with ~2^-16 background collision
    *     per band — genuinely sub-quadratic candidates. ScaleSpec proves
    *     this shape at 10x fixture scale with planted near-dups.
    *   - the FIXTURE's true pairs sit at cos 0.45-0.60 (no pair reaches
    *     0.8 at sf0.01 or sf0.1 — measured), where 16-bit bands find
    *     nothing; 8-bit bands x 32 catch 10/14 (sf0.01) and 100/144
    *     (sf0.1) of d5's exact pairs — so the d7-vs-d5 row counts ARE the
    *     measured banding recall, the honest price tag on skipping the
    *     all-pairs scan (d5 enumerates every block-join pair; d7 only
    *     bucket collisions).
    */
  val BandBits = 8

  /** Candidate pairs whose [[graft.functions.BitSketch]] agrees on at least
    * one `bandBits`-wide band — d2's bucket machinery over sketch bands:
    * one narrow map (sketch + band split), one bucket-keyed shuffle,
    * cap-bounded in-bucket pair expansion, distinct. `e` must carry
    * (vec_id, sk).
    */
  private[graft] def sketchBandPairs(
      e: DataFrame, bandBits: Int, cap: Int): DataFrame = {
    import e.sparkSession.implicits._
    val numBands = SketchPlanes / bandBits
    val mask = (1L << bandBits) - 1
    val bands = (0 until numBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(element_at($"sk", b * bandBits / 64 + 1), (b * bandBits) % 64)
          .bitwiseAND(lit(mask)).as("sig"))
    }
    e.select($"vec_id", explode(array(bands: _*)).as("bs"))
      .select($"vec_id", $"bs.band".as("band"), $"bs.sig".as("sig"))
      .groupBy($"band", $"sig")
      .agg(collect_list($"vec_id").as("ids"))
      .filter(size($"ids") >= 2 && size($"ids") <= cap)
      .select(explode(expr(
        "filter(flatten(transform(ids, a -> transform(ids, b -> struct(a, b)))), p -> p.a < p.b)"))
        .as("p"))
      .select($"p.a".as("vec_a"), $"p.b".as("vec_b"))
      .distinct()
  }

  /** d7: banded embedding near-dup — the sub-quadratic companion to the
    * exact [[embedNearDup]]: instead of enumerating every (block, block)
    * pair, only vectors COLLIDING on a sketch band ever meet (the d2 LSH
    * shape lifted onto [[graft.functions.BitSketch]] bands), then the
    * exact dot verifies survivors. Same 0.45 threshold as d5 so the two
    * results are directly comparable: rows(d7)/rows(d5) is the banding
    * recall. See [[BandBits]] for the band-width/threshold trade at scale.
    */
  def bandedEmbedNearDup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
    val sk = emb.select($"vec_id",
      graft.functions.BitSketch.sketch($"embedding", SketchPlanes).as("sk"))
    sketchBandPairs(sk, BandBits, LshBucketCap)
      .join(emb.select($"vec_id".as("vec_a"), $"embedding".as("emb_a")), "vec_a")
      .join(emb.select($"vec_id".as("vec_b"), $"embedding".as("emb_b")), "vec_b")
      .select($"vec_a", $"vec_b",
        VectorFunctions.dot($"emb_a", $"emb_b").as("cos"))
      .filter($"cos" >= 0.45)
      .orderBy($"vec_a", $"vec_b")
  }

  /** Oracle: bands are 8-char substrings of the shared sketch-sig string
    * (substr position b*8+1 = planes 8b..8b+7, exactly the bit range of
    * Spark's word/shift extraction), bucket cap mirrored literally, same
    * exact-dot threshold.
    */
  val bandedEmbedNearDupSql: String =
    """WITH __SIGS__,
      |bands AS (
      |  SELECT s.vec_id, t.b, substr(s.sig, t.b * 8 + 1, 8) AS bsig
      |  FROM sigs s CROSS JOIN generate_series(0, 31) t(b)),
      |ok AS (SELECT b, bsig FROM bands
      |       GROUP BY b, bsig HAVING COUNT(*) BETWEEN 2 AND 100),
      |cand AS (
      |  SELECT DISTINCT a.vec_id AS vec_a, b2.vec_id AS vec_b
      |  FROM bands a
      |  JOIN bands b2 ON a.b = b2.b AND a.bsig = b2.bsig AND a.vec_id < b2.vec_id
      |  JOIN ok ON ok.b = a.b AND ok.bsig = a.bsig)
      |SELECT c.vec_a, c.vec_b,
      |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list_transform(range(1, len(a.embedding) + 1),
      |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
      |    (acc, x) -> acc + x) AS cos
      |FROM cand c
      |JOIN embeddings a ON a.vec_id = c.vec_a
      |JOIN embeddings b ON b.vec_id = c.vec_b
      |WHERE list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list_transform(range(1, len(a.embedding) + 1),
      |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
      |    (acc, x) -> acc + x) >= 0.45
      |ORDER BY vec_a, vec_b""".stripMargin
      .replace("__SIGS__", sketchSigsCte)

  /** d8: embedding near-dup CLUSTERS — connected components over the d7
    * banded pair graph, each vector labeled with its component's minimum
    * vec_id: the canonical-representative assignment that turns banded
    * candidate pairs into an actionable embedding dedup (keep the
    * representative, drop the rest), completing the embedding story the
    * same way [[neardupClusters]] completes the text-LSH story.
    */
  def embedClusters(s: SparkSession, d: String): DataFrame =
    minLabelClusters(
      bandedEmbedNearDup(s, d).select(col("vec_a"), col("vec_b")),
      "vec_a", "vec_b", "vec_id")

  /** Oracle: recursive-CTE transitive closure over the d7 pair statement
    * (same shape as [[neardupClustersSql]]).
    */
  val embedClustersSql: String =
    """WITH RECURSIVE pairs AS (__PAIRS__),
      |edges AS (SELECT vec_a AS src, vec_b AS dst FROM pairs
      |          UNION SELECT vec_b, vec_a FROM pairs),
      |reach(src, dst) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
      |SELECT src AS vec_id, MIN(dst) AS cluster_id
      |FROM reach
      |GROUP BY src
      |ORDER BY vec_id""".stripMargin
      .replace("__PAIRS__", bandedEmbedNearDupSql)

  /** d9: SEMANTIC dedup — the SemDeDup shape (Abbas et al. 2023,
    * arXiv:2303.09540): partition the embedding space with k-means, then
    * look for near-duplicates ONLY within each cluster, keeping the
    * lowest-id member of every within-cluster similarity group. The
    * cluster scope is what makes embedding dedup tractable at corpus
    * scale: with K chosen so clusters are bounded (K ~ n / target cluster
    * size; the fixture's [[KMeans.K]] = 4 demonstrates the shape), the
    * quadratic term is per-cluster, not per-corpus — this is the published
    * recipe SemDeDup used to dedup LAION-scale corpora, and it composes
    * two pieces this repo already trusts: the bit-exact one-round Lloyd
    * assignment ([[KMeans.assignments]] — broadcast centroids, one
    * tree-aggregated pass, no shuffle) and d5's coarse-then-fine pair
    * verification (block equi-join, 256-bit sketch hamming prefilter,
    * exact dot on survivors).
    *
    * Semantics: vector v is DROPPED iff some lower-id vector in the same
    * k-means cluster has cos >= 0.45 (same threshold as d5/d7 so the
    * three embedding-dedup paths are directly comparable on the fixture);
    * else v is kept. Output is one row per vector: (vec_id, cluster,
    * kept). Pair enumeration joins on (cluster, block-cell): the cluster
    * equality scopes candidates semantically, the K^2 block cells keep the
    * within-cluster expansion evenly spread over the shuffle — no BNLJ,
    * no hot partition even if one cluster dominates.
    *
    * The hamming<=110 prefilter is d5's: its zero-miss margin was measured
    * on ALL fixture pairs, and d9's within-cluster pairs are a subset.
    */
  def semanticDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val K = BlockK
    val asg = KMeans.assignments(s, d).select($"vec_id", $"cluster")
    val e = Tables.embeddings(s, d).select(
        $"vec_id", $"embedding",
        graft.functions.BitSketch.sketch($"embedding", SketchPlanes).as("sk"),
        pmod($"vec_id", lit(K.toLong)).as("blk"))
      .join(asg, "vec_id")
    val cells = s.range(K.toLong * K)
      .select(expr(s"id div $K").as("ba"), expr(s"id % $K").as("bb"))
    val a = e.select($"vec_id".as("vid_a"), $"embedding".as("emb_a"),
        $"sk".as("sk_a"), $"cluster".as("cl_a"), $"blk".as("ba"))
      .join(broadcast(cells), "ba")
    val b = e.select($"vec_id".as("vid_b"), $"embedding".as("emb_b"),
        $"sk".as("sk_b"), $"cluster".as("cl_b"), $"blk".as("bb"))
      .join(broadcast(cells), "bb")
    val ham = (0 until SketchPlanes / 64).map { w =>
      bit_count(element_at($"sk_a", w + 1)
        .bitwiseXOR(element_at($"sk_b", w + 1)))
    }.reduce(_ + _)
    // Same conjunct-order discipline as d5: cheap equi keys, id order,
    // popcount, and only then the exact dot (see embedNearDup's note on
    // why the threshold must live IN the join condition).
    val dropped = a.join(b,
        a("cl_a") === b("cl_b") && a("ba") === b("ba") && a("bb") === b("bb") &&
          $"vid_a" < $"vid_b" && ham <= SketchHammingMax &&
          VectorFunctions.dot($"emb_a", $"emb_b") >= 0.45)
      .select($"vid_b".as("vec_id")).distinct()
    asg.join(dropped.withColumn("hit", lit(1)), Seq("vec_id"), "left_outer")
      .select($"vec_id", $"cluster", $"hit".isNull.as("kept"))
      .orderBy($"vec_id")
  }

  /** Oracle: the s9 assignment statement verbatim as the cluster scope
    * (nested WITH inside a derived table — DuckDB composes it), the shared
    * sketch-sig CTE for the identical hamming(sig_a, sig_b) <= 110
    * prefilter, and the exact left-to-right dot — a vector is kept iff no
    * lower-id cluster-mate clears the 0.45 threshold.
    */
  val semanticDedupSql: String =
    """WITH asg AS (SELECT vec_id, cluster FROM (__KMEANS__) t),
      |__SIGS__,
      |dropped AS (
      |  SELECT DISTINCT b.vec_id
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |  JOIN asg ca ON ca.vec_id = a.vec_id
      |  JOIN asg cb ON cb.vec_id = b.vec_id AND cb.cluster = ca.cluster
      |  JOIN sigs sa ON sa.vec_id = a.vec_id
      |  JOIN sigs sb ON sb.vec_id = b.vec_id
      |  WHERE hamming(sa.sig, sb.sig) <= 110
      |    AND list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(range(1, len(a.embedding) + 1),
      |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
      |      (acc, x) -> acc + x) >= 0.45)
      |SELECT c.vec_id, c.cluster, (d.vec_id IS NULL) AS kept
      |FROM asg c LEFT JOIN dropped d ON d.vec_id = c.vec_id
      |ORDER BY c.vec_id""".stripMargin
      .replace("__SIGS__", sketchSigsCte)
      .replace("__KMEANS__", KMeans.kmeansAssignSql)

  /** Near-dup CLUSTERS: connected components over the [[minhashLsh]] pair
    * graph, each doc labeled with its component's minimum doc_id — the
    * canonical-representative assignment that turns candidate pairs into an
    * actionable dedup (keep the representative, drop the rest).
    *
    * Deterministic min-label propagation: every round each node takes the
    * min of its own label and its neighbors' labels; converges in
    * O(component diameter) rounds (dup groups are near-cliques, so 2-4
    * rounds in practice). Each round is one join + one aggregation —
    * the Pregel shape without per-node state; lineage is truncated per
    * round (localCheckpoint) so the loop composes at any scale. Throws
    * after 50 rounds rather than returning an unconverged (wrong) answer.
    */
  /** Deterministic min-label propagation over an undirected pair graph:
    * every node ends up labeled with its connected component's minimum id.
    * `pairs` carries (aCol, bCol); the result is (idCol, cluster_id),
    * sorted. Shared by the d6 (LSH pair graph) and d8 (banded embedding
    * pair graph) cluster operators — see [[neardupClusters]] for the
    * convergence/scale notes.
    */
  private[operators] def minLabelClusters(
      pairs: DataFrame, aCol: String, bCol: String, idCol: String): DataFrame = {
    import pairs.sparkSession.implicits._
    val edges = pairs
      .unionByName(pairs.select(col(bCol).as(aCol), col(aCol).as(bCol)))
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .localCheckpoint(true)
    var labels = edges.select($"src".as(idCol)).distinct()
      .withColumn("cluster_id", col(idCol))
      .localCheckpoint(true)
    var converged = false
    var rounds = 0
    while (!converged) {
      rounds += 1
      if (rounds > 50)
        throw new IllegalStateException("label propagation did not converge")
      val prop = edges
        .join(labels, edges("src") === labels(idCol))
        .select($"dst".as(idCol), $"cluster_id")
      val next = labels.unionByName(prop)
        .groupBy(col(idCol)).agg(min($"cluster_id").as("cluster_id"))
        .localCheckpoint(true)
      val changed = next.as("n")
        .join(labels.as("o"), idCol)
        .filter(col("n.cluster_id") =!= col("o.cluster_id"))
        .limit(1).count()
      converged = changed == 0L
      labels = next
    }
    labels.orderBy(col(idCol))
  }

  def neardupClusters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    minLabelClusters(
      minhashLsh(s, d).select($"doc_a", $"doc_b"), "doc_a", "doc_b", "doc_id")
  }

  /** Oracle: transitive closure via recursive CTE (UNION dedups, so cycles
    * terminate), cluster = min reachable node including self.
    */
  val neardupClustersSql: String =
    """WITH RECURSIVE pairs AS (__PAIRS__),
      |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      |          UNION SELECT doc_b, doc_a FROM pairs),
      |reach(src, dst) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
      |SELECT src AS doc_id, MIN(dst) AS cluster_id
      |FROM reach
      |GROUP BY src
      |ORDER BY doc_id""".stripMargin
      .replace("__PAIRS__", minhashLshSql)

  /** Span width for [[repeatedSpans]] (tokens per window), mirrored
    * literally in the oracle's LEAD chain. 10 on the fixture (docs are
    * 10-99 words); the published substring-dedup recipes run 50 at corpus
    * scale — a constant change on both sides.
    */
  val SpanWidth = 10

  /** d12: split-leakage audit — near-duplicate pairs that straddle the
    * p13 train/val/test boundary. The eval-contamination failure mode
    * hash-split pipelines actually hit: the test document itself never
    * appears in train (p13 guarantees that), but a near-duplicate of it
    * does, and the eval number is quietly inflated. Composition: d2's
    * LSH candidate pairs (bucket-keyed, cap-bounded — reused verbatim)
    * joined to p13's per-doc assignment on both endpoints, keeping pairs
    * whose splits differ.
    *
    * Scale shape: the assignment is a narrow map over the corpus scan;
    * both joins are plain equi-joins keyed on doc id (the pair side can
    * reach millions of rows under heavy duplication — ScaleSmoke measured
    * d2's output at ~3500× for 10× planted-dup data — so neither side is
    * assumed broadcastable); the d2 leg keeps its own bucket caps. At
    * 100 TB this is d2's cost plus two keyed shuffles of the pair list.
    */
  def splitLeakage(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val assign = Pipeline.splitAssignOf(Tables.documents(s, d))
      .select($"doc_id", $"split")
    minhashLsh(s, d)
      .join(assign.select($"doc_id".as("doc_a"), $"split".as("split_a")), "doc_a")
      .join(assign.select($"doc_id".as("doc_b"), $"split".as("split_b")), "doc_b")
      .filter($"split_a" =!= $"split_b")
      .select($"doc_a", $"doc_b", $"split_a", $"split_b")
      .orderBy($"doc_a", $"doc_b")
  }

  val splitLeakageSql: String =
    """WITH pairs AS (__PAIRS__),
      |asg AS (
      |  SELECT doc_id,
      |    CASE WHEN b < 230 THEN 'train' WHEN b < 243 THEN 'val' ELSE 'test' END AS split
      |  FROM (SELECT doc_id,
      |    (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
      |    (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS b
      |  FROM documents) t)
      |SELECT p.doc_a, p.doc_b, a.split AS split_a, b.split AS split_b
      |FROM pairs p
      |JOIN asg a ON a.doc_id = p.doc_a
      |JOIN asg b ON b.doc_id = p.doc_b
      |WHERE a.split <> b.split
      |ORDER BY doc_a, doc_b""".stripMargin
      .replace("__PAIRS__", minhashLshSql)

  /** d10: cross-corpus repeated-span coverage — the token-level
    * "exact substring" dedup signal (the suffix-array ExactSubstr recipe
    * of Lee et al., arXiv:2107.06499, §4.1, recast as a rolling window
    * over the hashed-shingle domain): for every document, how many of its
    * distinct [[SpanWidth]]-token windows also occur in ANOTHER document,
    * and the integer percentage of the document that coverage represents.
    * d1 catches whole-doc copies and d2/d3 whole-doc near-dups; this
    * catches partial copies — quoted paragraphs, syndicated boilerplate,
    * template prefixes — that doc-level similarity misses. Downstream,
    * `dup_pct >= 20` is the usual drop/trim gate.
    *
    * Same hashed-domain semantics as d3 (xxhash64 spans cross the shuffle
    * as 8-byte keys; the oracle joins exact strings — equality is modulo
    * 64-bit collisions, immaterial at any realistic scale). Scale shape:
    * the fused [[graft.functions.ShingleHashes]] pass emits per-doc
    * DISTINCT span hashes map-side, so (doc_id, h) needs NO distinct
    * shuffle; one pinned h-keyed exchange feeds both the duplicated-span
    * count-aggregate and the semi-join (ReuseExchange, d3's pattern); no
    * operator ever buffers a per-span doc list, so a boilerplate span
    * shared by 10^8 docs costs a counter, never memory.
    */
  def repeatedSpans(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sh = graft.functions.ShingleHashes
      .shingleHashes(lower($"text"), SpanWidth)
    val spans = Tables.documents(s, d)
      .select($"doc_id", explode(sh).as("h"))
      .repartition($"h")
    // (doc_id, h) is distinct, so the per-span row count IS the distinct
    // doc count; partial aggregation keeps hot-span state at (hash, long).
    val dup = spans.groupBy($"h").agg(count(lit(1)).as("nd"))
      .filter($"nd" >= 2)
    val dupPerDoc = spans.join(dup.select($"h"), Seq("h"), "left_semi")
      .groupBy($"doc_id").agg(count(lit(1)).as("dup_spans"))
    Tables.documents(s, d)
      .select($"doc_id", size(sh).as("n_spans"))
      .filter($"n_spans" > 0)
      .join(dupPerDoc, Seq("doc_id"), "left")
      .select($"doc_id", $"n_spans",
        coalesce($"dup_spans", lit(0L)).as("dup_spans"))
      .withColumn("dup_pct",
        expr("(dup_spans * 100) div CAST(n_spans AS BIGINT)"))
      .orderBy($"doc_id")
  }

  val repeatedSpansSql: String = {
    val leads = (1 until SpanWidth).map(j =>
      s"|| ' ' || LEAD(word,$j) OVER (PARTITION BY doc_id ORDER BY i)")
      .mkString("\n         ")
    s"""WITH words AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
       |tok AS (
       |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i
       |  FROM words WHERE len(w) >= $SpanWidth),
       |sp0 AS (
       |  SELECT doc_id, word __LEADS__ AS sp
       |  FROM tok),
       |sp AS (SELECT DISTINCT doc_id, sp FROM sp0 WHERE sp IS NOT NULL),
       |dup AS (
       |  SELECT sp FROM (SELECT sp, COUNT(*) AS nd FROM sp GROUP BY sp) t
       |  WHERE nd >= 2),
       |dpd AS (
       |  SELECT s.doc_id, COUNT(*) AS dup_spans
       |  FROM sp s JOIN dup USING (sp) GROUP BY s.doc_id),
       |ns AS (
       |  SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_spans
       |  FROM sp GROUP BY doc_id)
       |SELECT ns.doc_id, ns.n_spans,
       |  CAST(COALESCE(d.dup_spans, 0) AS BIGINT) AS dup_spans,
       |  (CAST(COALESCE(d.dup_spans, 0) AS BIGINT) * 100)
       |    // CAST(ns.n_spans AS BIGINT) AS dup_pct
       |FROM ns LEFT JOIN dpd d USING (doc_id)
       |ORDER BY doc_id""".stripMargin
      .replace("__LEADS__", leads)
  }

  /** d11: the MinHash estimator's MEASURED error — for every d2 candidate
    * pair, the signature-agreement estimate (matching seeds / 8, in exact
    * basis points: hits × 1250) next to the true shingle-set Jaccard
    * (exact integer bps over the hashed-shingle domain, d3's documented
    * approximation) and their signed difference. The honest-price-tag
    * family member for d2, like s6 for ANN pruning and q48 for Count-Min:
    * an 8-seed signature is a coarse estimator, and this entry hash-checks
    * HOW coarse instead of asserting it. Scale shape: the exact side runs
    * only over candidate docs (left-semi on the pair membership — at
    * 100 TB that is the tiny output of the LSH pass, not the corpus), and
    * the signature side is the same map-side MinHashWords pass d2 runs.
    *
    * Performance, accepted (round 7): ~3 s at sf0.1 vs the oracle's ~1 s —
    * the query contains a full d2 run plus two checkpoint barriers and the
    * candidate-scoped exact pass (~4 sequential job floors). The shape is
    * the scale-correct one (nothing quadratic, nothing corpus-wide beyond
    * d2 itself); don't re-profile for the fixture's constant factor.
    */
  def minhashError(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // The pair list is consumed twice (candidate-doc derivation + final
    // join); materialize the tiny LSH output once instead of re-running
    // the whole d2 pipeline per consumer — the same persist any multi-pass
    // consumer of a mining stage does.
    val pairs = minhashLsh(s, d).select($"doc_a", $"doc_b").localCheckpoint()
    val sigs = words(s, d)
      .filter(size($"w") >= 3)
      .select($"doc_id",
        graft.functions.MinHashWords.minhashWords($"w", 3, 8).as("mh"))
    val cand = pairs
      .select(explode(array($"doc_a", $"doc_b")).as("doc_id")).distinct()
    // Also bounded (candidate docs only) and consumed twice (counts +
    // co-occurrence self-join, whose two sides would otherwise re-shingle
    // the corpus scan twice more).
    val docSh = Tables.documents(s, d)
      .join(broadcast(cand), Seq("doc_id"), "left_semi")
      .select($"doc_id", explode(
        graft.functions.ShingleHashes.shingleHashes(lower($"text"), 3)).as("h"))
      .localCheckpoint()
    val cnt = docSh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    // Shingle co-occurrence, scoped to the CANDIDATE PAIRS: the all-pairs
    // form (docSh self-join on h, grouped, then left-joined to pairs) is
    // quadratic in duplicate-GROUP size — sum over shingles of
    // (docs containing it)^2, measured 128x wall time for 10x data on a
    // corpus of planted 10-way duplicate groups (ScaleSmoke r10). Only the
    // pair list ever consumes it, so drive the join BY the pairs: explode
    // each pair into doc_a's shingle occurrences, match doc_b's on
    // (doc_id, h) — cost is |pairs| x shingles/doc, linear in the LSH
    // output. Same multiplicity semantics (occurrence-product per h), so
    // the oracle's all-pairs `co` CTE is unchanged.
    val co = pairs
      .join(docSh.as("x"), $"doc_a" === col("x.doc_id"))
      .join(docSh.as("y"),
        $"doc_b" === col("y.doc_id") && col("x.h") === col("y.h"))
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("c"))
    pairs
      .join(sigs.as("sa"), $"doc_a" === col("sa.doc_id"))
      .join(sigs.as("sb"), $"doc_b" === col("sb.doc_id"))
      .withColumn("hits", expr(
        "size(filter(zip_with(sa.mh, sb.mh, (x, y) -> x = y), b -> b))"))
      .join(co, Seq("doc_a", "doc_b"), "left")
      .join(cnt.as("ca"), $"doc_a" === col("ca.doc_id"))
      .join(cnt.as("cb"), $"doc_b" === col("cb.doc_id"))
      .select($"doc_a", $"doc_b", $"hits",
        (expr("CAST(hits AS BIGINT)") * 1250).as("est_bps"),
        expr("CAST(coalesce(c, 0) * 10000 div (ca.n + cb.n - coalesce(c, 0)) AS BIGINT)")
          .as("true_bps"))
      .withColumn("err_bps", $"est_bps" - $"true_bps")
      .orderBy($"doc_a", $"doc_b")
  }

  val minhashErrorSql: String =
    """WITH __SH__,
      |__BANDS__,
      |ok AS (SELECT band, sig FROM bands
      |       GROUP BY band, sig HAVING COUNT(*) BETWEEN 2 AND 100),
      |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
      |  JOIN ok ON ok.band = a.band AND ok.sig = a.sig),
      |hitc AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS hits
      |  FROM pairs p
      |  JOIN mh a ON a.doc_id = p.doc_a
      |  JOIN mh b ON b.doc_id = p.doc_b AND b.seed = a.seed AND b.h = a.h
      |  GROUP BY 1, 2),
      |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |co AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
      |  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2)
      |SELECT p.doc_a, p.doc_b,
      |  CAST(h.hits AS INTEGER) AS hits,
      |  CAST(h.hits * 1250 AS BIGINT) AS est_bps,
      |  CAST(COALESCE(co.c, 0) * 10000 // (ca.n + cb.n - COALESCE(co.c, 0))
      |    AS BIGINT) AS true_bps,
      |  CAST(h.hits * 1250
      |    - COALESCE(co.c, 0) * 10000 // (ca.n + cb.n - COALESCE(co.c, 0))
      |    AS BIGINT) AS err_bps
      |FROM pairs p
      |JOIN hitc h ON h.doc_a = p.doc_a AND h.doc_b = p.doc_b
      |LEFT JOIN co ON co.doc_a = p.doc_a AND co.doc_b = p.doc_b
      |JOIN cnt ca ON ca.doc_id = p.doc_a
      |JOIN cnt cb ON cb.doc_id = p.doc_b
      |ORDER BY p.doc_a, p.doc_b""".stripMargin
      .replace("__SH__", shinglesCte)
      .replace("__BANDS__", bandsCte)

  /** d13: EDIT-DISTANCE verification of the d2 LSH candidate pairs — the
    * final fuzzy-dedup gate: MinHash bands propose, an exact character
    * metric disposes. `verified` = Levenshtein within [[EditPctMax]]% of
    * the longer text, decided by integer cross-multiply (no float ratio).
    * The discipline is the candidate-verify shape every fuzzy matcher
    * needs at 100 TB: the O(len²) distance runs ONLY on pairs the
    * sub-quadratic candidate generation surfaced (bucket-capped, so the
    * pair list is bounded), fetched through two id-keyed joins — never on
    * the corpus cross product.
    */
  val EditPctMax = 20L

  /** d15 SNM constants (mirrored literally in the oracle): neighbor
    * window w, block-key prefix length, near-dup edit-distance percent.
    * Declared ABOVE the query/oracle maps — the maps force the d15 SQL
    * at object init, and a later-declared val would still read 0 (the
    * q43 lesson applied to initialization order).
    */
  val SnmWindow = 3
  val SnmBlkLen = 4
  val SnmEditPct = 5L

  def editVerify(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    // r19 opt: spread the candidate pairs BEFORE the levenshtein DP and
    // hash-exchange the verified rows before the range sort — same two
    // pathologies as d15 (AQE byte-coalescing serializes the DP; range
    // sampling re-runs it). 2.1 s -> ~1.2 s at sf0.1. See Tables.spread.
    val verified = Tables.spread(
        minhashLsh(s, d)
          .join(docs.select($"doc_id".as("doc_a"), $"text".as("ta")),
            Seq("doc_a"))
          .join(docs.select($"doc_id".as("doc_b"), $"text".as("tb")),
            Seq("doc_b")),
        $"doc_a", $"doc_b")
      .select($"doc_a", $"doc_b",
        levenshtein($"ta", $"tb").cast("long").as("lev"),
        length($"ta").cast("long").as("len_a"),
        length($"tb").cast("long").as("len_b"))
      .withColumn("verified",
        $"lev" * 100L <= lit(EditPctMax) * greatest($"len_a", $"len_b"))
    Tables.spread(verified, $"doc_a").orderBy($"doc_a", $"doc_b")
  }

  val editVerifySql: String =
    s"""WITH __SH__,
       |__BANDS__,
       |ok AS (SELECT band, sig FROM bands
       |       GROUP BY band, sig HAVING COUNT(*) BETWEEN 2 AND $LshBucketCap),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
       |  JOIN ok ON ok.band = a.band AND ok.sig = a.sig)
       |SELECT p.doc_a, p.doc_b,
       |  CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev,
       |  CAST(length(da.text) AS BIGINT) AS len_a,
       |  CAST(length(db.text) AS BIGINT) AS len_b,
       |  CAST(levenshtein(da.text, db.text) AS BIGINT) * 100
       |    <= $EditPctMax * greatest(length(da.text), length(db.text)) AS verified
       |FROM pairs p
       |JOIN documents da ON da.doc_id = p.doc_a
       |JOIN documents db ON db.doc_id = p.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin
      .replace("__SH__", shinglesCte)
      .replace("__BANDS__", bandsCte)

  /** d16: canonical selection — the KEEP POLICY layer over d6's clusters:
    * dedup pipelines that drop all-but-one doc per near-dup cluster must
    * decide WHICH one survives, and "keep the longest" (quality proxy;
    * ties to the lowest doc_id) beats p1's keep-first when duplicates are
    * truncations or boilerplate-stripped copies of each other. Singleton
    * docs are their own canonical. Emits the full decision table:
    * (doc, its cluster, the cluster's canonical, keep?) — the relation a
    * downstream filter joins against.
    *
    * Scale: the cluster relation covers only near-dup docs (pairs-bounded,
    * tiny next to the corpus → the left join broadcasts it); the pick is
    * one cluster-keyed window; the canonical backfill is a self-join on
    * cluster_id of the rn=1 slice (also near-dup-bounded + singletons).
    */
  def canonicalPick(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val clusters = neardupClusters(s, d) // doc_id, cluster_id (near-dups only)
    val lab = Tables.documents(s, d).select($"doc_id", $"n_chars")
      .join(broadcast(clusters), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce($"cluster_id", $"doc_id"))
    val w = Window.partitionBy($"cluster_id")
      .orderBy($"n_chars".desc, $"doc_id".asc)
    val ranked = lab.withColumn("rn", row_number().over(w))
    ranked
      .join(ranked.filter($"rn" === 1)
        .select($"cluster_id", $"doc_id".as("canonical_id")), Seq("cluster_id"))
      .select($"doc_id", $"cluster_id", $"canonical_id", ($"rn" === 1).as("keep"))
      .orderBy($"doc_id")
  }

  val canonicalPickSql: String =
    """WITH RECURSIVE pairs AS (__PAIRS__),
      |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      |          UNION SELECT doc_b, doc_a FROM pairs),
      |reach(src, dst) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      |cl AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
      |       FROM reach GROUP BY src),
      |lab AS (
      |  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
      |    d.n_chars
      |  FROM documents d LEFT JOIN cl c USING (doc_id)),
      |rk AS (
      |  SELECT doc_id, cluster_id,
      |    ROW_NUMBER() OVER (PARTITION BY cluster_id
      |      ORDER BY n_chars DESC, doc_id) AS rn
      |  FROM lab)
      |SELECT r.doc_id, r.cluster_id, c.doc_id AS canonical_id,
      |  r.rn = 1 AS keep
      |FROM rk r
      |JOIN (SELECT cluster_id, doc_id FROM rk WHERE rn = 1) c
      |  USING (cluster_id)
      |ORDER BY r.doc_id""".stripMargin
      .replace("__PAIRS__", minhashLshSql)

  /** d17: TF-IDF cosine verification of LSH candidates — the THIRD verify
    * metric beside d13's edit distance and d5's embedding dot: sparse
    * lexical cosine weights shared RARE terms high and boilerplate low,
    * catching pairs that share vocabulary but not wording (edit distance
    * punishes reordering; tf-idf cosine doesn't). Runs ONLY on d2's
    * bucket-capped candidate pairs (never a corpus pair scan); the dot is
    * two (doc, word)-keyed fetch joins over the weighted term relation.
    *
    * Determinism: idf = ln(n/df) through the t5 DECIMAL(38,6) cast; every
    * product (w·w for norms, wa·wb for dots) is cast to DECIMAL(38,6)
    * BEFORE summation so the aggregation order can't move a ulp; the
    * final sqrt/division run on identical doubles. `near` at cosine ≥ 0.5.
    */
  def tfidfVerify(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val Dec6 = "DECIMAL(38,6)"
    val docs = Tables.documents(s, d)
    val toks = docs
      .select($"doc_id", explode(split(lower($"text"), " ")).as("word"))
      .groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
    // idf materialized per WORD (vocab-sized, broadcast) so the 1-row
    // n_docs scalar join happens once, not once per use of `w`; at a
    // vocabulary too large to broadcast this join falls back to keyed.
    val dfIdf = toks.groupBy($"word").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
      .select($"word", log($"n_docs".cast("double") / $"df")
        .cast(org.apache.spark.sql.types.DecimalType(38, 6)).cast("double")
        .as("idf"))
    val w = toks.join(broadcast(dfIdf), Seq("word"))
      .select($"doc_id", $"word", ($"tf" * $"idf").as("w"))
    val norm = w.groupBy($"doc_id")
      .agg(sqrt(sum(expr(s"CAST(w * w AS $Dec6)")).cast("double")).as("nrm"))
    val pairs = minhashLsh(s, d).select($"doc_a", $"doc_b")
    val dots = pairs
      .join(w.select($"doc_id".as("doc_a"), $"word", $"w".as("wa")), Seq("doc_a"))
      .join(w.select($"doc_id".as("doc_b"), $"word", $"w".as("wb")),
        Seq("doc_b", "word"))
      .groupBy($"doc_a", $"doc_b")
      .agg(sum(expr(s"CAST(wa * wb AS $Dec6)")).cast("double").as("dot"))
    dots
      .join(norm.select($"doc_id".as("doc_a"), $"nrm".as("na")), Seq("doc_a"))
      .join(norm.select($"doc_id".as("doc_b"), $"nrm".as("nb")), Seq("doc_b"))
      .select($"doc_a", $"doc_b", ($"dot" / ($"na" * $"nb")).as("cos"))
      .withColumn("near", $"cos" >= 0.5)
      .orderBy($"doc_a", $"doc_b")
  }

  val tfidfVerifySql: String =
    """WITH pairs AS (__PAIRS__),
      |toks AS (
      |  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
      |    FROM documents)
      |  GROUP BY 1, 2),
      |dfr AS (SELECT word, COUNT(*) AS df FROM toks GROUP BY 1),
      |nn AS (SELECT COUNT(*) AS n_docs FROM documents),
      |w AS (
      |  SELECT t.doc_id, t.word,
      |    t.tf * CAST(CAST(LN(CAST(n.n_docs AS DOUBLE) / d.df)
      |      AS DECIMAL(38,6)) AS DOUBLE) AS w
      |  FROM toks t JOIN dfr d USING (word) CROSS JOIN nn n),
      |nrm AS (
      |  SELECT doc_id,
      |    sqrt(CAST(SUM(CAST(w * w AS DECIMAL(38,6))) AS DOUBLE)) AS nrm
      |  FROM w GROUP BY 1),
      |dots AS (
      |  SELECT p.doc_a, p.doc_b,
      |    CAST(SUM(CAST(a.w * b.w AS DECIMAL(38,6))) AS DOUBLE) AS dot
      |  FROM pairs p
      |  JOIN w a ON a.doc_id = p.doc_a
      |  JOIN w b ON b.doc_id = p.doc_b AND b.word = a.word
      |  GROUP BY 1, 2)
      |SELECT d.doc_a, d.doc_b, d.dot / (na.nrm * nb.nrm) AS cos,
      |  d.dot / (na.nrm * nb.nrm) >= 0.5 AS near
      |FROM dots d
      |JOIN nrm na ON na.doc_id = d.doc_a
      |JOIN nrm nb ON nb.doc_id = d.doc_b
      |ORDER BY doc_a, doc_b""".stripMargin
      .replace("__PAIRS__", minhashLshSql)

  /** d18: corpus VERSION DIFF — the release-to-release audit a dataset
    * card cites (kv7's generation diff lifted to corpus granularity):
    * v2 is derived deterministically from the fixture (every 17th doc
    * REMOVED, every 13th surviving doc's text CHANGED via a marker
    * prefix, ids shifted +10⁹ ADDED for every 11th doc), and the diff
    * classifies by doc_id full-outer join + md5 content compare into
    * added / removed / changed / unchanged — reported per class with doc
    * and char volume, so "what moved between v1 and v2" is one table.
    *
    * Scale: two narrow fingerprint projections + ONE doc_id-keyed
    * full-outer join + a 4-row rollup — content equality by md5, never
    * by text compare, so the join carries 32-byte fingerprints, not
    * documents.
    */
  def versionDiff(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val v1 = Tables.documents(s, d).select($"doc_id", $"text")
    val v2 = v1.filter($"doc_id" % 17 =!= 0)
      .withColumn("text",
        when($"doc_id" % 13 === 0, concat(lit("v2: "), $"text"))
          .otherwise($"text"))
      .unionByName(v1.filter($"doc_id" % 11 === 0)
        .select(($"doc_id" + 1000000000L).as("doc_id"), $"text"))
    val a = v1.select($"doc_id", md5($"text").as("fp1"),
      length($"text").cast("long").as("ch1"))
    val b = v2.select($"doc_id", md5($"text").as("fp2"),
      length($"text").cast("long").as("ch2"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select($"doc_id",
        when($"fp1".isNull, "added")
          .when($"fp2".isNull, "removed")
          .when($"fp1" === $"fp2", "unchanged")
          .otherwise("changed").as("status"),
        coalesce($"ch2", $"ch1").as("chars"))
      .groupBy($"status")
      .agg(count(lit(1)).as("n_docs"), sum($"chars").as("sum_chars"))
      .orderBy($"status")
  }

  val versionDiffSql: String =
    """WITH v1 AS (SELECT doc_id, text FROM documents),
      |v2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 0 THEN 'v2: ' || text ELSE text END AS text
      |  FROM v1 WHERE doc_id % 17 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000000, text FROM v1 WHERE doc_id % 11 = 0),
      |a AS (SELECT doc_id, md5(text) AS fp1,
      |        CAST(LENGTH(text) AS BIGINT) AS ch1 FROM v1),
      |b AS (SELECT doc_id, md5(text) AS fp2,
      |        CAST(LENGTH(text) AS BIGINT) AS ch2 FROM v2),
      |j AS (
      |  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
      |    CASE WHEN a.fp1 IS NULL THEN 'added'
      |         WHEN b.fp2 IS NULL THEN 'removed'
      |         WHEN a.fp1 = b.fp2 THEN 'unchanged'
      |         ELSE 'changed' END AS status,
      |    COALESCE(b.ch2, a.ch1) AS chars
      |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
      |SELECT status, COUNT(*) AS n_docs,
      |  CAST(SUM(chars) AS BIGINT) AS sum_chars
      |FROM j
      |GROUP BY status
      |ORDER BY status""".stripMargin

  /** d19: INCREMENTAL cross-shard near-dedup — the production ingest
    * shape: a NEW shard (doc_id % 3 == 0) is admitted against the OLD
    * corpus's LSH band index only; new-vs-new pairs are deferred to the
    * next full sweep (d2/d6's job). Per new doc: the earliest old doc
    * sharing any in-cap band bucket (`dup_of`, NULL = admitted). At
    * 100 TB the old side is a persisted (band, sig, min doc_id) index —
    * 3 small columns per bucket, no documents, no old-corpus rescan; the
    * probe is one equi-join keyed by (band, sig) sized to the NEW shard.
    * Old buckets over [[LshBucketCap]] are boilerplate, not signal, and
    * are excluded exactly as d2 excludes them (cap mirrored in the
    * oracle's HAVING). Docs under 3 words have no band signatures and
    * admit trivially — the outer join from the new-doc spine keeps them.
    */
  def incrementalDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sigs = bandSigs(s, d)
    val old = sigs.filter($"doc_id" % 3 =!= 0)
      .groupBy($"band", $"sig")
      .agg(min($"doc_id").as("hit"), count(lit(1)).as("bn"))
      .filter($"bn" <= LshBucketCap)
      .drop("bn")
    val probes = sigs.filter($"doc_id" % 3 === 0)
      .join(old, Seq("band", "sig"), "left")
      .groupBy($"doc_id").agg(min($"hit").as("dup_of"))
    Tables.documents(s, d).filter($"doc_id" % 3 === 0).select($"doc_id")
      .join(probes, Seq("doc_id"), "left")
      .select($"doc_id", $"dup_of", $"dup_of".isNull.as("admitted"))
      .orderBy($"doc_id")
  }

  val incrementalDedupSql: String =
    s"""WITH __SH__,
       |__BANDS__,
       |old AS (
       |  SELECT band, sig, MIN(doc_id) AS hit
       |  FROM bands WHERE doc_id % 3 <> 0
       |  GROUP BY band, sig HAVING COUNT(*) <= $LshBucketCap),
       |probes AS (
       |  SELECT b.doc_id, MIN(o.hit) AS dup_of
       |  FROM bands b LEFT JOIN old o ON o.band = b.band AND o.sig = b.sig
       |  WHERE b.doc_id % 3 = 0
       |  GROUP BY b.doc_id)
       |SELECT d.doc_id, p.dup_of, p.dup_of IS NULL AS admitted
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) d
       |LEFT JOIN probes p ON p.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
      .replace("__SH__", shinglesCte)
      .replace("__BANDS__", bandsCte)

  /** d20: EXACT set-similarity self-join via prefix filtering (the
    * PPJoin family, Xiao et al., WWW'08 — public literature): all pairs
    * with word-set Jaccard >= 4/5, found WITHOUT MinHash approximation
    * and WITHOUT an all-pairs scan. Under a global token order (document
    * frequency ascending, word as tie-break — rarest first), a doc of
    * |T| = n tokens need only index its first n - ceil(4n/5) + 1 tokens:
    * if two docs reach the threshold they MUST share a prefix token
    * (pigeonhole on the required overlap), so the candidate join is an
    * equi-join on RARE tokens — the inverted index touches the long tail,
    * never the head. Size filter 4|a| <= 5|b| (and symmetric) prunes
    * before the join; candidates verify by exact overlap (a codegen'd
    * `array_intersect` over the per-doc token SETS — per-pair O(n) with
    * no exploded pair×token shuffle) against the threshold as the integer
    * cross-multiplication 9*o >= 4*(|a|+|b|) — no floats anywhere, so
    * the pair set is bit-reproducible. This is the third dedup mechanism
    * class: d2 approximates (MinHash), d3 caps a full inverted index (df
    * cap drops hot tokens), d20 is EXACT and sub-quadratic by
    * construction. Jaccard emitted in integer ppm. Threshold 4/5 and the
    * `doc_id % 5 == 2` shard mirrored literally in the oracle (change
    * both or neither). The shard is fixture-pathology containment, not
    * algorithm: the synthesized corpus is ~50-way templated, so the
    * QUALIFYING pair list itself is quadratic in dup-group size (7.1M
    * pairs at tau=3/5, 3.0M at 4/5, full sf0.1 corpus — measured; a
    * pair-LIST workload, d17/p21's attribution, not an operator cost);
    * the 1-in-5 shard cuts group membership 5x and the pair list 25x
    * while exercising every stage. A real corpus at 100 TB is not 50-way
    * templated — there this code runs unsharded, and the d2-cap
    * discipline handles whatever boilerplate groups remain.
    */
  def prefixFilterJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, d)
      .filter($"doc_id" % 5 === 2)
      .select($"doc_id", explode(split(lower($"text"), " ")).as("word"))
      .distinct()
    val dfreq = toks.groupBy($"word").agg(count(lit(1)).as("df"))
    val docs = toks.groupBy($"doc_id")
      .agg(collect_set($"word").as("ws"), count(lit(1)).as("n"))
    // rarest-first prefix via a per-doc ARRAY SORT (r14, replacing a
    // per-doc row_number window): prefix SETS are order-free, so one
    // hash aggregate collecting (df, word) structs + sort_array + slice
    // to the pigeonhole bound yields the identical prefix rows with no
    // sort-based window stage — the most expensive stage of the r13 plan
    // gone. Struct order (df, word) reproduces the window's tie-break.
    val pref = toks.join(dfreq, Seq("word"))
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"df", $"word"))).as("ranked"),
        count(lit(1)).as("n"))
      .select($"doc_id", $"n",
        explode(slice($"ranked", lit(1),
          ($"n" - expr("(4 * n + 4) div 5") + 1).cast("int"))).as("dw"))
      .select($"doc_id", $"dw.word".as("word"), $"n")
    val cand = pref.as("a").join(pref.as("b"),
        $"a.word" === $"b.word" && $"a.doc_id" < $"b.doc_id" &&
        $"b.n" * 5 >= $"a.n" * 4 && $"a.n" * 5 >= $"b.n" * 4)
      .select($"a.doc_id".as("da"), $"b.doc_id".as("db"))
      .distinct()
    // r19 opt: spread the candidate pairs BEFORE the array_intersect
    // verify (AQE's byte-based coalescing was serializing the per-pair
    // O(n) set intersection into ~1 task — 6.3 s -> ~1.8 s at sf0.1),
    // and hash-exchange the verified rows so the final range sort's
    // sampling pass doesn't re-run the verify (see Tables.spread).
    val verified = Tables.spread(
        cand
          .join(docs.select($"doc_id".as("da"), $"ws".as("wa"), $"n".as("na")),
            Seq("da"))
          .join(docs.select($"doc_id".as("db"), $"ws".as("wb"), $"n".as("nb")),
            Seq("db")),
        $"da", $"db")
      .select($"da", $"db", $"na", $"nb",
        size(array_intersect($"wa", $"wb")).cast("long").as("inter_n"))
      .filter($"inter_n" * 9 >= ($"na" + $"nb") * 4)
      .select($"da".as("doc_a"), $"db".as("doc_b"), $"inter_n",
        ($"na" + $"nb" - $"inter_n").as("union_n"),
        expr("(1000000 * inter_n) div (na + nb - inter_n)").as("jac_ppm"))
    Tables.spread(verified, $"doc_a").orderBy($"doc_a", $"doc_b")
  }

  val prefixFilterJoinSql: String =
    """WITH toks AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS word
      |  FROM documents WHERE doc_id % 5 = 2),
      |dfreq AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM toks GROUP BY 1),
      |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY 1),
      |pref AS (
      |  SELECT doc_id, word, n FROM (
      |    SELECT t.doc_id, t.word, s.n,
      |      ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.word) AS rn
      |    FROM toks t JOIN dfreq d USING (word) JOIN sz s USING (doc_id)) r
      |  WHERE rn <= n - (4 * n + 4) // 5 + 1),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |  FROM pref a JOIN pref b
      |    ON a.word = b.word AND a.doc_id < b.doc_id
      |   AND b.n * 5 >= a.n * 4 AND a.n * 5 >= b.n * 4),
      |ov AS (
      |  SELECT c.da, c.db, CAST(COUNT(*) AS BIGINT) AS inter_n
      |  FROM cand c
      |  JOIN toks ta ON ta.doc_id = c.da
      |  JOIN toks tb ON tb.doc_id = c.db AND tb.word = ta.word
      |  GROUP BY 1, 2)
      |SELECT o.da AS doc_a, o.db AS doc_b, o.inter_n,
      |  sa.n + sb.n - o.inter_n AS union_n,
      |  (1000000 * o.inter_n) // (sa.n + sb.n - o.inter_n) AS jac_ppm
      |FROM ov o JOIN sz sa ON sa.doc_id = o.da JOIN sz sb ON sb.doc_id = o.db
      |WHERE o.inter_n * 9 >= (sa.n + sb.n) * 4
      |ORDER BY doc_a, doc_b""".stripMargin

  /** d21: LSH BANDING parameter sweep — s22's nprobe table for MinHash:
    * the (bands x rows) tradeoff measured on this corpus, one row per
    * config (b4r2 = d2's production geometry, b2r4, b1r8), reporting
    * candidate volume (cost), exact-verified trues (shingle Jaccard >=
    * 1/2 by integer cross-multiply 3c >= na+nb), precision, and recall
    * relative to the loosest config. Banding theory says larger rows-
    * per-band sharpens the S-curve (higher precision, lower recall) —
    * this measures it, which is what you consult before re-tuning d2.
    * The pair UNIVERSE is d2's in-cap candidate set; because the three
    * configs' band keys are nested prefixes of the same 8-signature
    * vector, tighter configs are true subsets evaluated PER PAIR on the
    * signatures already in hand (no per-config re-bucketing, no second
    * corpus pass) — one d2 run + d11's candidate-scoped exact pass
    * prices the whole sweep. Thresholds and the 2..100 bucket cap are
    * d2/d11's, mirrored in the oracle.
    */
  def bandingSweep(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = minhashLsh(s, d).select($"doc_a", $"doc_b").localCheckpoint()
    val sigs = words(s, d)
      .filter(size($"w") >= 3)
      .select($"doc_id",
        graft.functions.MinHashWords.minhashWords($"w", 3, 8).as("mh"))
    val cand = pairs
      .select(explode(array($"doc_a", $"doc_b")).as("doc_id")).distinct()
    val docSh = Tables.documents(s, d)
      .join(broadcast(cand), Seq("doc_id"), "left_semi")
      .select($"doc_id", explode(
        graft.functions.ShingleHashes.shingleHashes(lower($"text"), 3)).as("h"))
      .localCheckpoint()
    val cnt = docSh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val co = pairs
      .join(docSh.as("x"), $"doc_a" === col("x.doc_id"))
      .join(docSh.as("y"),
        $"doc_b" === col("y.doc_id") && col("x.h") === col("y.h"))
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("c"))
    val scored = pairs
      .join(sigs.as("sa"), $"doc_a" === col("sa.doc_id"))
      .join(sigs.as("sb"), $"doc_b" === col("sb.doc_id"))
      .withColumn("m", expr("zip_with(sa.mh, sb.mh, (x, y) -> x = y)"))
      .withColumn("c_b4r2",
        expr("exists(sequence(0, 3), i -> m[2*i] AND m[2*i+1])"))
      .withColumn("c_b2r4", expr(
        "exists(sequence(0, 1), i -> m[4*i] AND m[4*i+1] AND m[4*i+2] AND m[4*i+3])"))
      .withColumn("c_b1r8", expr("aggregate(m, true, (a, x) -> a AND x)"))
      .join(co, Seq("doc_a", "doc_b"), "left")
      .join(cnt.as("ca"), $"doc_a" === col("ca.doc_id"))
      .join(cnt.as("cb"), $"doc_b" === col("cb.doc_id"))
      .withColumn("is_true",
        expr("3 * coalesce(c, 0) >= ca.n + cb.n"))
      .localCheckpoint()
    val rows = Seq(("b4r2", "c_b4r2"), ("b2r4", "c_b2r4"),
        ("b1r8", "c_b1r8")).map { case (name, cc) =>
      scored.filter(col(cc))
        .agg(count(lit(1)).as("n_cand"),
          coalesce(sum(when($"is_true", 1L).otherwise(0L)), lit(0L))
            .as("n_true"))
        .select(lit(name).as("config"), $"n_cand", $"n_true")
    }.reduce(_ unionByName _)
    val base = rows.filter($"config" === "b4r2")
      .select($"n_true".as("base_true"))
    rows.crossJoin(broadcast(base))
      .select($"config", $"n_cand", $"n_true",
        expr("CASE WHEN n_cand = 0 THEN NULL " +
          "ELSE n_true * 1000000 div n_cand END").as("precision_ppm"),
        expr("CASE WHEN base_true = 0 THEN NULL " +
          "ELSE n_true * 1000000 div base_true END").as("recall_ppm"))
      .orderBy($"config")
  }

  val bandingSweepSql: String =
    """WITH __SH__,
      |__BANDS__,
      |ok AS (SELECT band, sig FROM bands
      |       GROUP BY band, sig HAVING COUNT(*) BETWEEN 2 AND 100),
      |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
      |  JOIN ok ON ok.band = a.band AND ok.sig = a.sig),
      |mtc AS (SELECT p.doc_a, p.doc_b, a.seed, (a.h = b.h) AS m
      |  FROM pairs p
      |  JOIN mh a ON a.doc_id = p.doc_a
      |  JOIN mh b ON b.doc_id = p.doc_b AND b.seed = a.seed),
      |g2 AS (SELECT doc_a, doc_b, seed // 2 AS g, BOOL_AND(m) AS bm
      |       FROM mtc GROUP BY 1, 2, 3),
      |c2 AS (SELECT doc_a, doc_b, BOOL_OR(bm) AS memb FROM g2 GROUP BY 1, 2),
      |g4 AS (SELECT doc_a, doc_b, seed // 4 AS g, BOOL_AND(m) AS bm
      |       FROM mtc GROUP BY 1, 2, 3),
      |c4 AS (SELECT doc_a, doc_b, BOOL_OR(bm) AS memb FROM g4 GROUP BY 1, 2),
      |c8 AS (SELECT doc_a, doc_b, BOOL_AND(m) AS memb FROM mtc GROUP BY 1, 2),
      |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |co AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
      |  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2),
      |truth AS (SELECT p.doc_a, p.doc_b,
      |    (3 * COALESCE(co.c, 0) >= ca.n + cb.n) AS is_true
      |  FROM pairs p
      |  LEFT JOIN co ON co.doc_a = p.doc_a AND co.doc_b = p.doc_b
      |  JOIN cnt ca ON ca.doc_id = p.doc_a
      |  JOIN cnt cb ON cb.doc_id = p.doc_b),
      |cfg AS (
      |  SELECT 'b4r2' AS config, CAST(COUNT(*) AS BIGINT) AS n_cand,
      |    CAST(COALESCE(SUM(CASE WHEN t.is_true THEN 1 ELSE 0 END), 0)
      |      AS BIGINT) AS n_true
      |  FROM truth t JOIN c2 ON c2.doc_a = t.doc_a AND c2.doc_b = t.doc_b
      |  WHERE c2.memb
      |  UNION ALL
      |  SELECT 'b2r4', CAST(COUNT(*) AS BIGINT),
      |    CAST(COALESCE(SUM(CASE WHEN t.is_true THEN 1 ELSE 0 END), 0)
      |      AS BIGINT)
      |  FROM truth t JOIN c4 ON c4.doc_a = t.doc_a AND c4.doc_b = t.doc_b
      |  WHERE c4.memb
      |  UNION ALL
      |  SELECT 'b1r8', CAST(COUNT(*) AS BIGINT),
      |    CAST(COALESCE(SUM(CASE WHEN t.is_true THEN 1 ELSE 0 END), 0)
      |      AS BIGINT)
      |  FROM truth t JOIN c8 ON c8.doc_a = t.doc_a AND c8.doc_b = t.doc_b
      |  WHERE c8.memb)
      |SELECT config, n_cand, n_true,
      |  CASE WHEN n_cand = 0 THEN NULL
      |       ELSE n_true * 1000000 // n_cand END AS precision_ppm,
      |  CASE WHEN b.bt = 0 THEN NULL
      |       ELSE n_true * 1000000 // b.bt END AS recall_ppm
      |FROM cfg CROSS JOIN
      |  (SELECT n_true AS bt FROM cfg WHERE config = 'b4r2') b
      |ORDER BY config""".stripMargin
      .replace("__SH__", shinglesCte)
      .replace("__BANDS__", bandsCte)

  /** d22: RELEASE MANIFEST — the shipping checksum table for a corpus
    * release: per content shard (`doc_id % 16`), document count, char
    * volume, and a shard DIGEST = md5 over the doc fingerprints sorted
    * and concatenated — so two parties (or two releases) compare 16
    * digest rows instead of terabytes, any mismatch localizes to a
    * shard, and d18's version diff is the drill-down. Order-free by
    * construction (fingerprints sorted INSIDE the shard before hashing),
    * so any partitioning/replication layout produces the identical
    * manifest — the property that makes it a cross-datacenter integrity
    * check. One narrow scan + one 16-group aggregation; the digest
    * concatenation is shard-bounded (32 bytes per doc), the d18/s27
    * discipline of auditing hashes, never payloads; at 100 TB the shard
    * count scales with the corpus (%16 → %1M keeps each digest buffer
    * in single-task memory — the manifest just gets more rows, the
    * order-free property is per-shard and unaffected). Shard count 16
    * mirrored in the oracle.
    */
  def releaseManifest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(($"doc_id" % 16).as("shard"), md5($"text").as("fp"),
        length($"text").cast("long").as("chars"))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"chars").as("n_chars"),
        md5(concat_ws("", sort_array(collect_list($"fp")))).as("digest"))
      .orderBy($"shard")
  }

  val releaseManifestSql: String =
    """SELECT doc_id % 16 AS shard,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars,
      |  md5(string_agg(md5(text), '' ORDER BY md5(text))) AS digest
      |FROM documents
      |GROUP BY 1
      |ORDER BY shard""".stripMargin

  /** d23: perceptual-hash NEAR-DUP join over the MEDIA corpus — the
    * image analogue of d5's embedding BitSketch: re-encoded/recompressed
    * copies of an image keep a near-identical 64-bit brightness-pattern
    * phash (m8's), so near-dup detection is a hamming join over phashes.
    * Candidates via LSH banding on the hash itself — 8 bands of 8 bits
    * (lo bytes 0-3, hi bytes 0-3); a pair is a candidate iff some band
    * matches exactly (equi-join on (band_idx, band_value) — bucketed,
    * never all-pairs; sf0.1: 79k candidates of 1.39M possible pairs,
    * max bucket 59) — then verified EXACTLY: popcount(xor) over both
    * halves <= [[PhashHammingMax]]. Banded recall is honest-partial
    * (a qualifying pair with no matching band is missed — measured 6/7
    * at sf0.01, ~certain at lower distances), the d5/s28 discipline.
    * Band geometry (8×8 bits) and the hamming cap are mirrored
    * LITERALLY in the oracle, which also replays the m8 synthesis —
    * any change to `mediaTable`'s container format must update this
    * oracle alongside m1/m2/m3/m8's.
    */
  val PhashHammingMax = 16

  def phashNearDup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val h = graft.multimodal.Multimodal.phashes(s, d)
      .select($"media_id", $"hash_hi", $"hash_lo")
    val bands = h.select($"media_id", $"hash_hi", $"hash_lo",
        explode(expr("sequence(0, 7)")).as("i"))
      .withColumn("band", expr(
        """CASE WHEN i < 4 THEN shiftright(hash_lo, 8 * i) & 255
          |ELSE shiftright(hash_hi, 8 * (i - 4)) & 255 END""".stripMargin))
    bands.as("a").join(bands.as("b"),
        col("a.i") === col("b.i") && col("a.band") === col("b.band") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("doc_a"), col("b.media_id").as("doc_b"),
        (bit_count(col("a.hash_hi").bitwiseXOR(col("b.hash_hi"))) +
          bit_count(col("a.hash_lo").bitwiseXOR(col("b.hash_lo"))))
          .cast("int").as("hd"))
      .distinct()
      .filter($"hd" <= PhashHammingMax)
      .orderBy($"doc_a", $"doc_b")
  }

  val phashNearDupSql: String =
    s"""WITH imgs AS (
       |  SELECT doc_id AS media_id, text, length(text) AS L
       |  FROM documents WHERE doc_id % 3 = 0),
       |ch AS (
       |  SELECT media_id, L,
       |    ord(substr(text, CAST(p AS INTEGER) + 1, 1)) AS b,
       |    CAST(p * 64 // L AS INTEGER) AS cell
       |  FROM imgs, (SELECT unnest(range(1024)) AS p) px
       |  WHERE p < L),
       |cells AS (
       |  SELECT media_id, L, cell, SUM(b) AS cs, COUNT(*) AS cc
       |  FROM ch GROUP BY 1, 2, 3),
       |tot AS (SELECT media_id, SUM(b) AS s FROM ch GROUP BY 1),
       |bits AS (
       |  SELECT c.media_id, c.cell,
       |    CASE WHEN c.cs * c.L > t.s * c.cc THEN 1 ELSE 0 END AS bit
       |  FROM cells c JOIN tot t USING (media_id)),
       |hash AS (
       |  SELECT media_id,
       |    CAST(SUM(CASE WHEN cell >= 32
       |      THEN bit * (CAST(1 AS BIGINT) << (cell - 32)) ELSE 0 END)
       |      AS BIGINT) AS hash_hi,
       |    CAST(SUM(CASE WHEN cell < 32
       |      THEN bit * (CAST(1 AS BIGINT) << cell) ELSE 0 END) AS BIGINT)
       |      AS hash_lo
       |  FROM bits GROUP BY 1),
       |bands AS (
       |  SELECT media_id, hash_hi, hash_lo, i,
       |    CASE WHEN i < 4 THEN (hash_lo >> (8 * CAST(i AS INTEGER))) & 255
       |         ELSE (hash_hi >> (8 * (CAST(i AS INTEGER) - 4))) & 255
       |    END AS band
       |  FROM hash, (SELECT unnest(range(8)) AS i) t),
       |cand AS (
       |  SELECT DISTINCT a.media_id AS doc_a, b.media_id AS doc_b,
       |    CAST(bit_count(CAST(xor(a.hash_hi, b.hash_hi) AS BIGINT)) +
       |      bit_count(CAST(xor(a.hash_lo, b.hash_lo) AS BIGINT))
       |      AS INTEGER) AS hd
       |  FROM bands a JOIN bands b
       |    ON a.i = b.i AND a.band = b.band AND a.media_id < b.media_id)
       |SELECT doc_a, doc_b, hd
       |FROM cand
       |WHERE hd <= $PhashHammingMax
       |ORDER BY doc_a, doc_b""".stripMargin

  /** d24: LINE-level dedup with REWRITE — the C4/CCNet boilerplate pass
    * (Raffel et al. 2020 drop any three-sentence span seen before; CCNet
    * dedups at the paragraph hash level), and the first dedup operator
    * here that REWRITES documents instead of flagging them. The fixture
    * corpus has no newlines, so a "line" is a non-overlapping
    * [[LineTok]]-token chunk (the d10 span domain made disjoint; the
    * trailing short chunk is a line too). A line is BOILERPLATE iff it
    * occurs in more than [[LineDfMax]] DISTINCT docs (the ~50-way
    * templated corpus makes this real signal: sf0.01 has 127 chunk-types
    * shared by >=2 docs); every boilerplate line is dropped from every
    * doc and the survivors are reassembled in position order. Output =
    * per-doc line counts + the cleaned text (empty when everything was
    * template). Shapes: one explode, one line-keyed partial-agg df pass,
    * one line-keyed fetch join, one doc-keyed sort_array re-assembly
    * (d20's order-free collect — no Window anywhere). At 100 TB the line
    * join key is a 64-bit hash (d10's xxhash64 domain) rather than the
    * string itself — exact strings kept here so the oracle is equality,
    * not modulo-collision. [[LineTok]]/[[LineDfMax]] mirrored LITERALLY
    * in the oracle.
    */
  val LineTok = 10
  val LineDfMax = 1

  def lineDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = words(s, d)
      .withColumn("n_lines",
        expr(s"CAST((size(w) + ${LineTok - 1}) DIV $LineTok AS BIGINT)"))
    val lines = base.select($"doc_id",
      posexplode(expr(
        s"""transform(sequence(0, CAST(n_lines AS INT) - 1),
           |  i -> array_join(slice(w, i * $LineTok + 1, $LineTok), ' '))"""
          .stripMargin)).as(Seq("pos", "line")))
    val df = lines.groupBy($"line")
      .agg(countDistinct($"doc_id").as("df"))
    val kept = lines.join(df, "line").filter($"df" <= LineDfMax)
    val agg = kept.groupBy($"doc_id")
      .agg(count(lit(1)).as("kept_lines"),
        expr("array_join(transform(sort_array(collect_list(struct(pos, line))), x -> x.line), ' ')")
          .as("clean_text"))
    base.select($"doc_id", $"n_lines")
      .join(agg, Seq("doc_id"), "left")
      .select($"doc_id", $"n_lines",
        coalesce($"kept_lines", lit(0L)).as("kept_lines"),
        coalesce($"clean_text", lit("")).as("clean_text"))
      .orderBy($"doc_id")
  }

  val lineDedupSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
       |base AS (
       |  SELECT doc_id,
       |    CAST((len(w) + ${LineTok - 1}) // $LineTok AS BIGINT) AS n_lines, w
       |  FROM w),
       |lines AS (
       |  SELECT doc_id, CAST(i AS INTEGER) AS pos,
       |    array_to_string(list_slice(w,
       |      CAST(i AS INTEGER) * $LineTok + 1,
       |      CAST(i AS INTEGER) * $LineTok + $LineTok), ' ') AS line
       |  FROM base, UNNEST(range(n_lines)) AS t(i)),
       |df AS (SELECT line, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY 1),
       |kept AS (
       |  SELECT l.doc_id, l.pos, l.line
       |  FROM lines l JOIN df USING (line) WHERE df.df <= $LineDfMax),
       |agg AS (
       |  SELECT doc_id, COUNT(*) AS kept_lines,
       |    string_agg(line, ' ' ORDER BY pos) AS clean_text
       |  FROM kept GROUP BY doc_id)
       |SELECT b.doc_id, b.n_lines,
       |  COALESCE(a.kept_lines, 0) AS kept_lines,
       |  COALESCE(a.clean_text, '') AS clean_text
       |FROM base b LEFT JOIN agg a USING (doc_id)
       |ORDER BY b.doc_id""".stripMargin

  /** d25: cross-document EXACT-SUBSTRING duplication (r15) — the
    * ExactSubstr half of Lee et al. 2022 ("Deduplicating Training Data
    * Makes Language Models Better"), seed-and-extend instead of suffix
    * arrays (which don't distribute): every SLIDING [[SpanW]]-token
    * window is a seed (vs d24's non-overlapping chunks — sliding finds
    * the unaligned overlaps chunking misses), a seed shared by ≥2
    * DISTINCT docs marks its token positions duplicated, and per doc the
    * covered positions merge into maximal spans via gaps-and-islands
    * (the span-merge step, doc-partitioned window — bounded by one doc's
    * length). Emitted per doc: total/duplicated token counts + maximal
    * span count (real signal: 47/500 docs carry cross-doc spans at
    * sf0.01, 477/5000 at sf0.1). Shapes: one narrow window explode →
    * one count shuffle keyed on xxhash64(wkey) — the 8-byte d3 domain,
    * never the 8-token string (r16) — → seed fetch join on the same
    * hash → position explode + distinct → per-doc islands. W and the
    * 200-position bound mirrored literally (fixture max doc = 100
    * tokens; the Spark side raises loudly past 199 — ADVICE r15).
    */
  private val SpanW = 8

  /** Per-doc (doc_id, total_tokens, dup_tokens, n_spans) — d25's frame,
    * shared with p26's drop policy.
    *
    * r16 exchange discipline (the r15-verdict #3 item): the shared-window
    * shuffle and the seed-fetch join key on `xxhash64(wkey)` — the 8-byte
    * d3 domain — never on the ~50-byte 8-token window string itself, so
    * the hottest dedup kernel's exchange carries ~6× fewer bytes per row
    * at 100 TB. Equality is modulo 64-bit collisions (d3's documented,
    * accepted trade; the oracle keeps exact-string joins — a collision
    * would surface as a hash mismatch, which is the detection we want).
    * PlanAuditSpec pins the exchange schema: LongType key, no window
    * string crossing a shuffle.
    *
    * Fixture bound (ADVICE r15): the oracle enumerates window positions
    * via range(1, 200), so docs must stay under 200 tokens — the Spark
    * side raises NAMED at runtime if a fixture regen ever ships longer
    * docs, instead of silently hash-diverging (the r10 events.ts class).
    */
  /** The shared d25/d26/p26 frames: per-doc token arrays (with the
    * 200-token oracle-bound guard on `total_tokens` consumers) and the
    * distinct duplicated POSITIONS (doc_id, p) from the hashed
    * shared-window join. */
  private[operators] def exactSubstrCov(
      s: SparkSession, d: String): (DataFrame, DataFrame) = {
    import s.implicits._
    // r19 opt: spread the tokenization by doc_id (the sliding-window
    // xxhash explode below is map-side work over the single-file scan's
    // 1-task parallelism), and pin ONE wk-keyed exchange that both the
    // shared-count aggregate and the seed-fetch join reuse — `wins` used
    // to recompute once per consumer.
    val toks = Tables.spread(
        Tables.documents(s, d)
          .select($"doc_id", split(lower($"text"), " ").as("t")),
        $"doc_id")
      .withColumn("n", size($"t"))
    val wins = Tables.spread(
      toks.filter($"n" >= SpanW)
        .select($"doc_id", explode(expr(
          s"transform(sequence(1, n - ${SpanW - 1}), i -> " +
            s"struct(i AS i, xxhash64(array_join(slice(t, i, $SpanW), " +
            "chr(1))) AS wk))")).as("w"))
        .select($"doc_id", $"w.i".as("i"), $"w.wk".as("wk")),
      $"wk")
    val shared = wins.groupBy($"wk")
      .agg(countDistinct($"doc_id").as("nd"))
      .filter($"nd" >= 2).select($"wk")
    val cov = wins.join(shared, Seq("wk"))
      .select($"doc_id",
        explode(expr(s"sequence(i, i + ${SpanW - 1})")).as("p"))
      .distinct()
    (toks, cov)
  }

  private[operators] def exactSubstrPerDoc(
      s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (toks, cov) = exactSubstrCov(s, d)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"p")
    val agg = cov.withColumn("g", $"p" - row_number().over(w))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("dup_tokens"),
        countDistinct($"g").as("n_spans"))
    toks.select($"doc_id", guardedTotalTokens(s).as("total_tokens"))
      .join(agg, Seq("doc_id"), "left")
      .select($"doc_id", $"total_tokens",
        coalesce($"dup_tokens", lit(0L)).as("dup_tokens"),
        coalesce($"n_spans", lit(0L)).as("n_spans"))
  }

  /** ADVICE-r15 fixture-bound guard shared by d25/d26/p26: the oracles
    * enumerate positions via range(1, 200), so a fixture regen shipping
    * >=200-token docs must raise NAMED instead of hash-diverging.
    * Executor-side, zero cost in the good case. */
  private def guardedTotalTokens(
      s: SparkSession): org.apache.spark.sql.Column = {
    import s.implicits._
    when($"n" < 200, $"n".cast("long")).otherwise(raise_error(concat(
      lit("d25/d26/p26: document "), $"doc_id",
      lit(s" has "), $"n",
      lit(" tokens — the oracle's range(1, 200) window bound no " +
        "longer covers the fixture; re-derive FIXTURES.md and widen " +
        "both sides together")))
      .cast("long"))
  }

  def exactSubstr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    exactSubstrPerDoc(s, d).orderBy($"doc_id")
  }

  /** d26: exact-substring SPAN SURGERY (r16) — d25 measured the
    * cross-document duplicated spans; this produces what Lee et al.
    * 2022's ExactSubstr dedup actually SHIPS: the corpus with those
    * spans CUT OUT (span removal, not doc dropping — the paper's
    * chosen action, p26 is the dropping alternative). Every duplicated
    * position (the shared d25 cov frame — hashed-window equi-joins, no
    * cartesian) is anti-joined away from the per-doc position explode,
    * survivors reassemble in position order (d24's rebuild shape:
    * doc-partitioned sort_array over collect_list — bounded by one
    * doc's length, never a global sort). Emitted per doc: total/kept
    * token counts + the cleaned text, so downstream stages consume the
    * SURGERY, not a flag. Docs whose every token is duplicated come out
    * empty but present (the d24 contract).
    */
  def exactSubstrScrub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (toks, cov) = exactSubstrCov(s, d)
    val pos = toks.select($"doc_id", $"n",
      explode(expr(
        "transform(sequence(1, n), i -> struct(i AS p, t[i - 1] AS tok))"))
        .as("x"))
      .select($"doc_id", $"x.p".as("p"), $"x.tok".as("tok"))
    val kept = pos.join(cov, Seq("doc_id", "p"), "left_anti")
    val agg = kept.groupBy($"doc_id")
      .agg(count(lit(1)).as("kept_tokens"),
        expr("array_join(transform(sort_array(collect_list(" +
          "struct(p, tok))), x -> x.tok), ' ')").as("clean_text"))
    toks.select($"doc_id", guardedTotalTokens(s).as("total_tokens"))
      .join(agg, Seq("doc_id"), "left")
      .select($"doc_id", $"total_tokens",
        coalesce($"kept_tokens", lit(0L)).as("kept_tokens"),
        coalesce($"clean_text", lit("")).as("clean_text"))
      .orderBy($"doc_id")
  }


  /** d25's oracle CTE chain up to the per-doc frame (shared with p26). */
  private[operators] val exactSubstrPerDocCtes: String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, string_split(lower(text), ' ') AS t,
       |    len(string_split(lower(text), ' ')) AS n
       |  FROM documents),
       |wins AS MATERIALIZED (
       |  SELECT doc_id, i,
       |    array_to_string(
       |      t[CAST(i AS INTEGER):CAST(i + $SpanW - 1 AS INTEGER)],
       |      chr(1)) AS wkey
       |  FROM toks, (SELECT unnest(range(1, 200)) AS i) ix
       |  WHERE n >= $SpanW AND i <= n - $SpanW + 1),
       |shared AS (
       |  SELECT wkey FROM wins
       |  GROUP BY wkey HAVING COUNT(DISTINCT doc_id) >= 2),
       |cov AS (
       |  SELECT DISTINCT w.doc_id, w.i + o.o AS p
       |  FROM wins w JOIN shared s ON s.wkey = w.wkey,
       |    (SELECT unnest(range(0, $SpanW)) AS o) o),
       |isl AS (
       |  SELECT doc_id, p,
       |    p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS g
       |  FROM cov),
       |agg AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup_tokens,
       |    CAST(COUNT(DISTINCT g) AS BIGINT) AS n_spans
       |  FROM isl GROUP BY doc_id),
       |perdoc AS (
       |  SELECT t.doc_id, CAST(t.n AS BIGINT) AS total_tokens,
       |    COALESCE(a.dup_tokens, 0) AS dup_tokens,
       |    COALESCE(a.n_spans, 0) AS n_spans
       |  FROM toks t LEFT JOIN agg a ON a.doc_id = t.doc_id)""".stripMargin

  val exactSubstrSql: String =
    exactSubstrPerDocCtes + "\n" +
      """SELECT doc_id, total_tokens, dup_tokens, n_spans
        |FROM perdoc
        |ORDER BY doc_id""".stripMargin

  val exactSubstrScrubSql: String =
    exactSubstrPerDocCtes + ",\n" +
      """pos26 AS (
        |  SELECT t.doc_id, CAST(i AS INTEGER) AS p,
        |    t.t[CAST(i AS INTEGER)] AS tok
        |  FROM toks t, (SELECT unnest(range(1, 200)) AS i) ix
        |  WHERE i <= t.n),
        |kept26 AS (
        |  SELECT p.doc_id, p.p, p.tok FROM pos26 p
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM cov c WHERE c.doc_id = p.doc_id AND c.p = p.p)),
        |agg26 AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_tokens,
        |    string_agg(tok, ' ' ORDER BY p) AS clean_text
        |  FROM kept26 GROUP BY doc_id)
        |SELECT t.doc_id, CAST(t.n AS BIGINT) AS total_tokens,
        |  COALESCE(a.kept_tokens, 0) AS kept_tokens,
        |  COALESCE(a.clean_text, '') AS clean_text
        |FROM toks t LEFT JOIN agg26 a ON a.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin

  /** d27 constants — mirrored LITERALLY in [[winnowingSql]] (change both
    * or neither). K-gram size, winnowing window, df cap (d3's
    * [[ShingleDfCap]] discipline at fingerprint granularity), and the
    * min shared-fingerprint bar for a reported pair. Winnowing guarantee:
    * any shared token run of length >= K + W - 1 (= 7) yields at least
    * one shared fingerprint.
    */
  val WinnowK = 4
  val WinnowW = 4
  val WinnowDfCap = 10
  val WinnowMinShared = 2

  /** d27: WINNOWING fingerprints (Schleimer, Wilkerson, Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD'03 — the MOSS
    * scheme): hash every K-token gram, slide a W-gram window, keep each
    * window's MINIMUM hash (ties to the RIGHTMOST position — robust
    * winnowing), dedupe selections; the surviving ~2/(W+1) of gram hashes
    * are the document's fingerprints, with the guarantee that any match
    * of >= K+W-1 tokens shares a fingerprint. This is the third local
    * fingerprint family next to d3's MinHash (global similarity) and
    * d25's seed-and-extend (exact spans): winnowing is what you PERSIST
    * when you need bounded-size per-doc signatures that still catch
    * partial overlap. Engine-portable hashing: h = the first 12 md5 hex
    * digits folded to a 48-bit BIGINT (p7's fold — xxhash64 has no
    * DuckDB twin, and unlike d3 the SELECTION depends on hash VALUES,
    * so the oracle must reproduce them bit-for-bit, not join strings).
    * The window argmin is pure integer arithmetic: min over
    * h·512 + (511 − p) picks (min hash, rightmost position) in one
    * aggregate — no struct compare, no window function; positions stay
    * under 512 by the corpus's spec-pinned 200-token bound. Pair join
    * keyed by the 8-byte fingerprint hash, [[WinnowDfCap]] bounding the
    * fan-out exactly as d3's cap does. 100 TB: fingerprints are a narrow
    * (doc, h, p) relation ~2/(W+1) the gram count; one equi-join
    * exchange; no pair generator is ever quadratic past the cap.
    */
  def winnowing(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // r19 opt: the per-gram md5 pipeline below is map-side work over
    // whatever parallelism the SCAN has — one task per fixture file.
    // Spread by doc_id first so the hashing runs at session parallelism
    // (the shuffled bytes are just (doc_id, text); the gram explosion
    // happens after).
    val grams = Tables.spread(
        Tables.documents(s, d).select($"doc_id", $"text"), $"doc_id")
      .select($"doc_id", split($"text", " ").as("w"))
      .select($"doc_id", expr(
        s"""transform(sequence(1, size(w) - ${WinnowK - 1}),
           |  p -> CAST(conv(substring(md5(array_join(slice(w, p, $WinnowK), ' ')),
           |    1, 12), 16, 10) AS BIGINT))""".stripMargin).as("hs"))
      .filter(size($"hs") >= WinnowW)
    // Window argmins computed MAP-SIDE per document (the sliding scan is
    // in-row array math — no exchange exists before the fingerprint
    // join; the first cut shuffled a (doc, window) explode through a
    // hash aggregate and paid 4× the rows for the same integers).
    val sel = grams
      // the d25-family fixture-bound guard, d27's domain: the combined
      // argmin encoding h*512 + (511 - p) only covers positions < 512,
      // so a fixture regen shipping longer docs must raise NAMED instead
      // of silently colliding positions (executor-side, free when good;
      // folded into the USED column so pruning can't drop it)
      .withColumn("cs", expr(
        s"""CASE WHEN size(hs) < 512
           |  THEN transform(hs, (h, i) -> h * 512 + 511 - (i + 1))
           |  ELSE CAST(raise_error(concat('d27: document ',
           |    CAST(doc_id AS STRING), ' has ',
           |    CAST(size(hs) + ${WinnowK - 1} AS STRING),
           |    ' tokens — the 511-position fingerprint encoding no ',
           |    'longer covers the fixture; re-derive FIXTURES.md and ',
           |    'widen both sides together')) AS ARRAY<BIGINT>)
           |END""".stripMargin))
      .select($"doc_id", explode(expr(
        s"""array_distinct(transform(sequence(1, size(cs) - ${WinnowW - 1}),
           |  w -> array_min(slice(cs, w, $WinnowW))))""".stripMargin))
        .as("selv"))
      .select($"doc_id", expr("selv div 512").as("h"),
        expr("511 - (selv % 512)").as("p"))
    // r19 opt: pin ONE h-keyed exchange that the df-cap count, the
    // semi-join probe, and both pair-join sides all reuse (ReuseExchange)
    // — `sel`'s fingerprint subtree used to recompute once per consumer.
    // The pair dedup + count also fold into one distinct-aggregate
    // (count(DISTINCT h) per pair) instead of a distinct exchange
    // followed by a count exchange.
    val selS = Tables.spread(sel, $"h")
    val ok = selS.groupBy($"h")
      .agg(countDistinct($"doc_id").as("df"))
      .filter($"df" <= WinnowDfCap)
      .select($"h")
    val fp = selS.join(ok, "h")
    val pairs = fp.select($"h", $"doc_id".as("doc_a"))
      .join(fp.select($"h", $"doc_id".as("doc_b")), "h")
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(countDistinct($"h").as("shared_fps"))
      .filter($"shared_fps" >= WinnowMinShared)
      .orderBy($"doc_a", $"doc_b")
    pairs
  }

  val winnowingSql: String =
    s"""WITH grams AS MATERIALIZED (
       |  SELECT doc_id, p,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, 13),
       |        i -> CAST(strpos('0123456789abcdef',
       |               substr(md5(array_to_string(w[p:p + ${WinnowK - 1}], ' ')),
       |                 i, 1)) - 1 AS BIGINT))),
       |      (acc, v) -> acc * 16 + v) AS h,
       |    np
       |  FROM (
       |    SELECT doc_id, string_split(text, ' ') AS w,
       |      CAST(len(string_split(text, ' ')) AS INTEGER) - ${WinnowK - 1} AS np
       |    FROM documents) d,
       |    UNNEST(range(1, np + 1)) AS t(p)
       |  WHERE np >= $WinnowW),
       |sel AS MATERIALIZED (
       |  SELECT DISTINCT doc_id,
       |    MIN(h * 512 + (511 - p)) // 512 AS h,
       |    511 - (MIN(h * 512 + (511 - p)) % 512) AS p
       |  FROM grams,
       |    UNNEST(range(greatest(1, p - ${WinnowW - 1}),
       |                 least(p, np - ${WinnowW - 1}) + 1)) AS u(win)
       |  GROUP BY doc_id, win),
       |ok AS (SELECT h FROM sel GROUP BY h
       |       HAVING COUNT(DISTINCT doc_id) <= $WinnowDfCap),
       |fp AS (SELECT s.doc_id, s.h FROM sel s JOIN ok USING (h))
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(COUNT(DISTINCT a.h) AS BIGINT) AS shared_fps
       |FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
       |GROUP BY a.doc_id, b.doc_id
       |HAVING COUNT(DISTINCT a.h) >= $WinnowMinShared
       |ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d27_winnowing" -> (winnowing _),
    "d26_substr_scrub" -> (exactSubstrScrub _),
    "d25_exact_substr" -> (exactSubstr _),
    "d24_line_dedup" -> (lineDedup _),
    "d23_phash_near_dup" -> (phashNearDup _),
    "d22_release_manifest" -> (releaseManifest _),
    "d21_banding_sweep" -> (bandingSweep _),
    "d20_prefix_filter_join" -> (prefixFilterJoin _),
    "d19_incremental_dedup" -> (incrementalDedup _),
    "d18_version_diff"   -> (versionDiff _),
    "d17_tfidf_verify"   -> (tfidfVerify _),
    "d16_canonical_pick" -> (canonicalPick _),
    "d13_edit_verify"    -> (editVerify _),
    "d14_containment"    -> (containment _),
    "d15_sorted_neighborhood" -> (sortedNeighborhood _),
    "d11_minhash_error"  -> (minhashError _),
    "d12_split_leakage"  -> (splitLeakage _),
    "d10_repeated_spans"   -> (repeatedSpans _),
    "d1_exact_fingerprint" -> (exactFingerprint _),
    "d2_minhash_lsh"       -> (minhashLsh _),
    "d3_ngram_jaccard"     -> (ngramJaccard _),
    "d4_simhash"           -> (simhash _),
    "d5_embed_neardup"     -> (embedNearDup _),
    "d6_neardup_clusters"  -> (neardupClusters _),
    "d7_embed_banded"      -> (bandedEmbedNearDup _),
    "d8_embed_clusters"    -> (embedClusters _),
    "d9_semantic_dedup"    -> (semanticDedup _))

  val oracle: Map[String, String] = Map(
    "d27_winnowing" -> winnowingSql,
    "d26_substr_scrub" -> exactSubstrScrubSql,
    "d25_exact_substr" -> exactSubstrSql,
    "d24_line_dedup" -> lineDedupSql,
    "d23_phash_near_dup" -> phashNearDupSql,
    "d22_release_manifest" -> releaseManifestSql,
    "d21_banding_sweep" -> bandingSweepSql,
    "d20_prefix_filter_join" -> prefixFilterJoinSql,
    "d19_incremental_dedup" -> incrementalDedupSql,
    "d18_version_diff"   -> versionDiffSql,
    "d17_tfidf_verify"     -> tfidfVerifySql,
    "d16_canonical_pick"   -> canonicalPickSql,
    "d10_repeated_spans"   -> repeatedSpansSql,
    "d1_exact_fingerprint" -> exactFingerprintSql,
    "d2_minhash_lsh"       -> minhashLshSql,
    "d3_ngram_jaccard"     -> ngramJaccardSql,
    "d4_simhash"           -> simhashSql,
    "d5_embed_neardup"     -> embedNearDupSql,
    "d6_neardup_clusters"  -> neardupClustersSql,
    "d7_embed_banded"      -> bandedEmbedNearDupSql,
    "d8_embed_clusters"    -> embedClustersSql,
    "d9_semantic_dedup"    -> semanticDedupSql,
    "d11_minhash_error"    -> minhashErrorSql,
    "d12_split_leakage"    -> splitLeakageSql,
    "d13_edit_verify"      -> editVerifySql,
    "d14_containment"      -> containmentSql,
    "d15_sorted_neighborhood" -> sortedNeighborhoodSql)

  /** d15: SORTED-NEIGHBORHOOD dedup (Hernandez & Stolfo's merge/purge) —
    * the third blocking family next to hash blocking (d2 LSH bands) and
    * sketch blocking (d5 bit-sketch): sort the corpus by a normalized
    * key and compare each record only to its w nearest neighbors in sort
    * order. Candidates verified with exact edit distance (the d13
    * discipline).
    *
    * Scale shapes: the sort IS the blocking — one exchange keyed by the
    * 4-char block prefix, ONE Window operator computing all w leads
    * (pairs = explode of an in-row neighbor array, no self-join at all),
    * then levenshtein only on the <= w*N candidates. The block boundary
    * truncates neighborhoods (a pair straddling two prefix blocks is
    * missed) — the standard remedy is a second pass with a shifted key,
    * which is this same query with a different SnmBlkLen slice; single
    * pass kept here so the oracle mirrors one plan.
    */
  def sortedNeighborhood(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"blk").orderBy($"skey", $"doc_id")
    val docs = Tables.documents(s, d)
      .select($"doc_id", $"text",
        regexp_replace(lower($"text"), "[^a-z0-9]", "").as("skey"))
      .withColumn("blk", substring($"skey", 1, SnmBlkLen))
    val led = docs.select($"doc_id".as("doc_a"), $"text".as("ta"),
      array((1 to SnmWindow).map(k => struct(
        lead($"doc_id", k).over(w).as("doc_b"),
        lead($"text", k).over(w).as("tb"))): _*).as("nb"))
    // r19 opt: spread the candidate pairs BEFORE the levenshtein DP (AQE
    // coalesced the byte-tiny window stage to ~1 task, serializing the
    // edit-distance verify), and hash-exchange AFTER it so the final range
    // sort's sampling pass reads materialized rows instead of re-running
    // the DP (6.2 s -> ~1.3 s at sf0.1; see Tables.spread).
    val verified = Tables.spread(
        led.select($"doc_a", $"ta", explode($"nb").as("p"))
          .filter($"p.doc_b".isNotNull),
        $"doc_a", $"p.doc_b")
      .select($"doc_a", $"p.doc_b".as("doc_b"),
        levenshtein($"ta", $"p.tb").cast("long").as("lev"),
        length($"ta").cast("long").as("len_a"),
        length($"p.tb").cast("long").as("len_b"))
      .withColumn("near_dup",
        $"lev" * 100L <= lit(SnmEditPct) * greatest($"len_a", $"len_b"))
    Tables.spread(verified, $"doc_a").orderBy($"doc_a", $"doc_b")
  }

  lazy val sortedNeighborhoodSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, text,
       |    regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS skey
       |  FROM documents),
       |b AS (SELECT doc_id, text, skey, substr(skey, 1, $SnmBlkLen) AS blk
       |      FROM docs),
       |led AS (
       |  SELECT doc_id AS doc_a, text AS ta,
       |    LEAD(doc_id, 1) OVER win AS b1, LEAD(text, 1) OVER win AS t1,
       |    LEAD(doc_id, 2) OVER win AS b2, LEAD(text, 2) OVER win AS t2,
       |    LEAD(doc_id, 3) OVER win AS b3, LEAD(text, 3) OVER win AS t3
       |  FROM b WINDOW win AS (PARTITION BY blk ORDER BY skey, doc_id)),
       |pairs AS (
       |  SELECT doc_a, ta, b1 AS doc_b, t1 AS tb FROM led WHERE b1 IS NOT NULL
       |  UNION ALL SELECT doc_a, ta, b2, t2 FROM led WHERE b2 IS NOT NULL
       |  UNION ALL SELECT doc_a, ta, b3, t3 FROM led WHERE b3 IS NOT NULL)
       |SELECT doc_a, doc_b, CAST(levenshtein(ta, tb) AS BIGINT) AS lev,
       |  CAST(length(ta) AS BIGINT) AS len_a,
       |  CAST(length(tb) AS BIGINT) AS len_b,
       |  CAST(levenshtein(ta, tb) AS BIGINT) * 100
       |    <= $SnmEditPct * greatest(length(ta), length(tb)) AS near_dup
       |FROM pairs
       |ORDER BY doc_a, doc_b""".stripMargin
}
