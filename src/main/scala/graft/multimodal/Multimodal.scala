package graft.multimodal

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (BASELINE.json north_star): image/audio/video
  * as opaque `binary` columns + typed metadata, with decode/feature-extract
  * as batched per-partition functions.
  *
  * The container has no media codec libraries, so the fixtures carry a
  * synthesized "graft container" format instead of PNG/WAV/MP4 — but the
  * DECODE is real: [[decode]] parses the raw bytes only (magic → mime,
  * ASCII header fields → dimensions, md5 over the payload slice), exactly
  * like a production demuxer reads a RIFF/ISOBMFF header, and knows nothing
  * about how the bytes were synthesized. Everything around it — schema,
  * Dataset[T] encoders, mapPartitions batch shape with per-partition codec
  * init, partitioning — is the real 100 TB plumbing: a libpng/ffmpeg-backed
  * decoder drops into [[decodeBatch]] unchanged. The equivalent PySpark
  * shape is `mapInPandas` with an Arrow batch per partition; in Scala the
  * idiomatic form is a typed mapPartitions, which keeps the bytes in one
  * pass and never collects to the driver.
  *
  * Container layout (all-ASCII header, arbitrary payload bytes):
  * {{{
  *   <magic:4>|w=<int>|h=<int>|c=<int>|f=<int>|<payload bytes...>
  * }}}
  * magic ∈ {GIMG, GAUD, GVID}. The DuckDB oracle verifies the decode by
  * asserting the parsed features equal the known synthesis parameters —
  * the exact-inverse property a codec round-trip test checks.
  */
object Multimodal {

  /** One media object: opaque bytes + mime. */
  final case class MediaRecord(
      media_id: Long, media: Array[Byte], mime: String, source: String)

  /** Typed decode output — every field except `media_id` (the row key)
    * derives from the container BYTES alone.
    */
  final case class MediaFeatures(
      media_id: Long, mime: String, width: Int, height: Int, channels: Int,
      n_frames: Int, n_payload: Int, checksum_md5: String)

  /** Synthesize the binary corpus from `documents` (fixtures carry no real
    * media): payload is the UTF-8 text, container header carries dimensions
    * derived from doc_id, mime assigned round-robin. At 100 TB this select
    * is replaced by a scan of real media parquet; nothing downstream cares.
    */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    val kind = ($"doc_id" % 3).cast("int")
    val magic = element_at(typedLit(Seq("GIMG", "GAUD", "GVID")), kind + 1)
    val width = (lit(16) + $"doc_id" % 640).cast("string")
    val height = (lit(16) + ($"doc_id" * 7) % 480).cast("string")
    val channels = when(kind === 1, lit(1)).otherwise(lit(3)).cast("string")
    val frames = when(kind === 2, $"doc_id" % 30 + 1).otherwise(lit(1)).cast("string")
    Tables.documents(s, d)
      .select(
        $"doc_id".as("media_id"),
        concat(magic, lit("|w="), width, lit("|h="), height,
          lit("|c="), channels, lit("|f="), frames, lit("|"), $"text")
          .cast("binary").as("media"),
        element_at(
          typedLit(Seq("image/png", "audio/wav", "video/mp4")),
          kind + 1).as("mime"),
        $"source")
      .as[MediaRecord]
  }

  /** REAL byte-level container decode: magic → mime, ASCII `|x=<int>`
    * header fields scanned in place, md5 over the payload slice (no copy).
    * Throws on an unknown magic or malformed header — a decode must fail
    * loudly, not fabricate features. `md` is the per-partition codec
    * context threaded in by [[decodeBatch]].
    */
  /** Parsed container header: everything [[decode]] needs plus the payload
    * span, so byte-level consumers (frame slicing) share one parse.
    */
  private[graft] final case class Header(
      mime: String, width: Int, height: Int, channels: Int, nFrames: Int,
      payloadPos: Int, payloadLen: Int)

  private[graft] def parseHeader(r: MediaRecord): Header = {
    val b = r.media
    require(b.length >= 4, s"media ${r.media_id}: truncated container (${b.length} bytes)")
    val mime = new String(b, 0, 4, StandardCharsets.US_ASCII) match {
      case "GIMG" => "image/png"
      case "GAUD" => "audio/wav"
      case "GVID" => "video/mp4"
      case other  => throw new IllegalArgumentException(
        s"media ${r.media_id}: unknown container magic '$other'")
    }
    var pos = 4
    def intField(tag: Char): Int = {
      require(pos + 3 <= b.length && b(pos) == '|' && b(pos + 1) == tag &&
        b(pos + 2) == '=', s"media ${r.media_id}: expected |$tag= at byte $pos")
      pos += 3
      var v = 0
      var any = false
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); pos += 1; any = true
      }
      require(any, s"media ${r.media_id}: empty |$tag= field")
      v
    }
    val w = intField('w'); val h = intField('h')
    val c = intField('c'); val f = intField('f')
    require(pos < b.length && b(pos) == '|',
      s"media ${r.media_id}: missing payload separator at byte $pos")
    pos += 1
    Header(mime, w, h, c, f, pos, b.length - pos)
  }

  private[graft] def decode(r: MediaRecord, md: MessageDigest): MediaFeatures = {
    val hd = parseHeader(r)
    md.reset()
    md.update(r.media, hd.payloadPos, hd.payloadLen)
    val checksum = md.digest().map("%02x".format(_)).mkString
    MediaFeatures(r.media_id, hd.mime, hd.width, hd.height, hd.channels,
      hd.nFrames, hd.payloadLen, checksum)
  }

  /** Batched decode: one iterator per partition — the codec context (here a
    * MessageDigest; in production a decoder/model handle) is initialized
    * ONCE per partition and reused across the stream.
    */
  def decodeBatch(it: Iterator[MediaRecord]): Iterator[MediaFeatures] = {
    val md = MessageDigest.getInstance("MD5")
    it.map(decode(_, md))
  }

  /** Distributed feature extraction over the media table. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(decodeBatch)
  }

  /** Oracle-checkable metadata projection over the raw container bytes
    * (no decode: byte length, md5 of the whole object, mime class).
    */
  def mediaMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).toDF()
      .select(
        $"media_id", $"mime",
        length($"media").cast("int").as("n_bytes"),
        md5($"media").as("checksum_md5"),
        when($"mime".startsWith("image"), "still")
          .when($"mime".startsWith("audio"), "waveform")
          .otherwise("frames").as("kind"))
      .orderBy($"media_id")
  }

  /** DuckDB rebuilds the container string with the same synthesis and
    * checks raw-bytes metadata over it.
    */
  val mediaMetaSql: String =
    """WITH enc AS (
      |  SELECT doc_id AS media_id,
      |    ['image/png','audio/wav','video/mp4'][CAST(doc_id % 3 AS INTEGER) + 1] AS mime,
      |    ['GIMG','GAUD','GVID'][CAST(doc_id % 3 AS INTEGER) + 1]
      |      || '|w=' || CAST(16 + doc_id % 640 AS VARCHAR)
      |      || '|h=' || CAST(16 + (doc_id * 7) % 480 AS VARCHAR)
      |      || '|c=' || CAST(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 3 END AS VARCHAR)
      |      || '|f=' || CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 30 ELSE 1 END AS VARCHAR)
      |      || '|' || text AS media
      |  FROM documents)
      |SELECT media_id, mime,
      |  CAST(OCTET_LENGTH(CAST(media AS BLOB)) AS INTEGER) AS n_bytes,
      |  md5(media) AS checksum_md5,
      |  CASE WHEN media_id % 3 = 0 THEN 'still'
      |       WHEN media_id % 3 = 1 THEN 'waveform'
      |       ELSE 'frames' END AS kind
      |FROM enc
      |ORDER BY media_id""".stripMargin

  /** m2: the full mapPartitions decode pipeline. Every output value is
    * parsed from the container bytes by [[decode]].
    */
  def mediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    extractFeatures(mediaTable(s, d)).toDF().orderBy($"media_id")
  }

  /** The oracle asserts the decoded features equal the synthesis
    * parameters (decode is the exact inverse of encode), and the payload
    * checksum/length match md5/length of the original text — DuckDB's md5
    * hashes the same UTF-8 bytes the JVM digest sees.
    */
  val mediaFeaturesSql: String =
    """SELECT doc_id AS media_id,
      |  ['image/png','audio/wav','video/mp4'][CAST(doc_id % 3 AS INTEGER) + 1] AS mime,
      |  CAST(16 + doc_id % 640 AS INTEGER) AS width,
      |  CAST(16 + (doc_id * 7) % 480 AS INTEGER) AS height,
      |  CAST(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 3 END AS INTEGER) AS channels,
      |  CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 30 ELSE 1 END AS INTEGER) AS n_frames,
      |  CAST(OCTET_LENGTH(CAST(text AS BLOB)) AS INTEGER) AS n_payload,
      |  md5(text) AS checksum_md5
      |FROM documents
      |ORDER BY media_id""".stripMargin

  /** Frames sampled per video: every `FrameStride`-th frame — the standard
    * preprocessing step before per-frame decode/captioning/embedding.
    */
  val FrameStride = 5

  /** m3: frame sampling driven by the DECODED container (n_frames is
    * parsed from the bytes by [[decode]], not read from a column): video
    * rows explode into their sampled frame indices. The explode is narrow
    * (no shuffle) and the per-frame work downstream reuses the same
    * mapPartitions batch shape as [[decodeBatch]] — at 100 TB the frame
    * table is what feeds the per-frame feature extractors.
    */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    extractFeatures(mediaTable(s, d)).toDF()
      .filter($"mime" === "video/mp4")
      .select($"media_id", $"n_frames",
        explode(expr(s"sequence(0, n_frames - 1, $FrameStride)")).as("frame_idx"))
      .orderBy($"media_id", $"frame_idx")
  }

  /** Oracle: videos are the doc_id % 3 = 2 rows, n_frames their synthesis
    * parameter (asserting the decode again), sampled indices mirrored by
    * range() with the same stride.
    */
  val frameSampleSql: String =
    s"""SELECT doc_id AS media_id,
       |  CAST(1 + doc_id % 30 AS INTEGER) AS n_frames,
       |  CAST(unnest(range(0, 1 + doc_id % 30, $FrameStride)) AS INTEGER) AS frame_idx
       |FROM documents
       |WHERE doc_id % 3 = 2
       |ORDER BY media_id, frame_idx""".stripMargin

  /** Target box for [[resizePlan]] (the usual vision-model input side). */
  val ResizeBox = 224

  /** m4: resize planning over the DECODED dimensions — aspect-preserving
    * fit into a [[ResizeBox]]² box in exact integer math (out_w = w*224
    * div max(w,h)), so the plan is engine-identical. The pixel resample
    * itself would run where the codec runs (a [[decodeBatch]]-shaped
    * per-partition pass over the bytes — the plumbing m2 already proves);
    * the PLAN — which image gets which output geometry, and whether it
    * upscales — is the relational part a 100 TB pipeline computes first
    * to bucket work by output size.
    */
  def resizePlan(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    extractFeatures(mediaTable(s, d)).toDF()
      .filter($"mime" === "image/png")
      .select($"media_id", $"width", $"height",
        expr(s"CAST(width * $ResizeBox div greatest(width, height) AS INT)")
          .as("out_w"),
        expr(s"CAST(height * $ResizeBox div greatest(width, height) AS INT)")
          .as("out_h"),
        (greatest($"width", $"height") < ResizeBox).as("upscaled"))
      .orderBy($"media_id")
  }

  /** Oracle re-derives dimensions from the synthesis parameters (checking
    * the decode again) and mirrors the integer division.
    */
  val resizePlanSql: String =
    s"""WITH dims AS (
       |  SELECT doc_id AS media_id,
       |    CAST(16 + doc_id % 640 AS INTEGER) AS width,
       |    CAST(16 + (doc_id * 7) % 480 AS INTEGER) AS height
       |  FROM documents
       |  WHERE doc_id % 3 = 0)
       |SELECT media_id, width, height,
       |  CAST(width * $ResizeBox // greatest(width, height) AS INTEGER) AS out_w,
       |  CAST(height * $ResizeBox // greatest(width, height) AS INTEGER) AS out_h,
       |  greatest(width, height) < $ResizeBox AS upscaled
       |FROM dims
       |ORDER BY media_id""".stripMargin

  /** m7: multimodal TOKEN BUDGET — the sequence-length accounting a VLM
    * training pipeline runs before packing (p3's budget, multimodal
    * edition): each doc's context cost = text tokens + media tokens,
    * where images/videos charge a ViT patch grid over the m4 resize
    * geometry (ceil(out_w/14) x ceil(out_h/14) per frame, x n_frames)
    * and audio charges one token per [[AudioBytesPerTok]] payload bytes
    * (a fixed-rate codec frame proxy). `fits` gates on a 4096 context.
    * All integer (ceil = (a+13) div 14), so the oracle re-derives every
    * number from the synthesis parameters + text. Scale shape: one
    * decode pass (the m2 mapPartitions plumbing) + a narrow doc_id join
    * — both linear, no shuffle beyond the join.
    */
  val PatchPx = 14
  val AudioBytesPerTok = 320L
  val CtxBudget = 4096L

  def tokenBudget(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d).select($"doc_id".as("media_id"),
      size(split($"text", " ")).cast("long").as("text_tokens"))
    val geom = extractFeatures(mediaTable(s, d)).toDF()
      .withColumn("out_w", expr(
        s"CAST(width * $ResizeBox div greatest(width, height) AS BIGINT)"))
      .withColumn("out_h", expr(
        s"CAST(height * $ResizeBox div greatest(width, height) AS BIGINT)"))
    geom.join(docs, Seq("media_id"))
      .select($"media_id", $"mime", $"text_tokens",
        when($"mime" === "audio/wav",
          expr(s"CAST(n_payload AS BIGINT) div $AudioBytesPerTok"))
          .otherwise(expr(
            s"((out_w + ${PatchPx - 1}) div $PatchPx) * " +
              s"((out_h + ${PatchPx - 1}) div $PatchPx) * CAST(n_frames AS BIGINT)"))
          .as("media_tokens"))
      .withColumn("total_tokens", $"text_tokens" + $"media_tokens")
      .withColumn("fits", $"total_tokens" <= CtxBudget)
      .orderBy($"media_id")
  }

  /** Oracle: synthesis-parameter re-derivation (m4's dims pattern) +
    * the same integer patch/byte arithmetic. n_payload == length(text)
    * because documents.text is pure ASCII (the m6 contract).
    */
  val tokenBudgetSql: String =
    s"""WITH dims AS (
       |  SELECT doc_id AS media_id,
       |    CASE CAST(doc_id % 3 AS INTEGER)
       |      WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
       |      ELSE 'video/mp4' END AS mime,
       |    CAST(16 + doc_id % 640 AS BIGINT) AS width,
       |    CAST(16 + (doc_id * 7) % 480 AS BIGINT) AS height,
       |    CAST(CASE WHEN doc_id % 3 = 2 THEN doc_id % 30 + 1 ELSE 1 END
       |      AS BIGINT) AS n_frames,
       |    CAST(length(text) AS BIGINT) AS n_payload,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS text_tokens
       |  FROM documents),
       |geo AS (
       |  SELECT *,
       |    width * $ResizeBox // greatest(width, height) AS out_w,
       |    height * $ResizeBox // greatest(width, height) AS out_h
       |  FROM dims),
       |budget AS (
       |  SELECT media_id, mime, text_tokens,
       |    CAST(CASE WHEN mime = 'audio/wav' THEN n_payload // $AudioBytesPerTok
       |      ELSE ((out_w + ${PatchPx - 1}) // $PatchPx) *
       |           ((out_h + ${PatchPx - 1}) // $PatchPx) * n_frames END
       |      AS BIGINT) AS media_tokens
       |  FROM geo)
       |SELECT media_id, mime, text_tokens, media_tokens,
       |  text_tokens + media_tokens AS total_tokens,
       |  text_tokens + media_tokens <= $CtxBudget AS fits
       |FROM budget
       |ORDER BY media_id""".stripMargin

  /** One content fingerprint per decoded video frame. */
  final case class FrameHash(media_id: Long, frame_idx: Int, frame_md5: String)

  /** Per-frame content fingerprints: each video's payload is sliced into
    * its `n_frames` byte ranges (frame i = payload[i·len/f, (i+1)·len/f))
    * and md5-hashed IN PLACE — one narrow byte pass per partition, digest
    * context reused, no copies, no shuffle. This is the per-frame half of
    * perceptual-hash dedup: swap the md5 for a pHash over decoded pixels
    * and nothing around it changes.
    */
  def frameHashes(media: Dataset[MediaRecord]): Dataset[FrameHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val hd = parseHeader(r)
        if (hd.mime != "video/mp4") Iterator.empty
        else (0 until hd.nFrames).iterator.map { i =>
          val from = hd.payloadPos + i * hd.payloadLen / hd.nFrames
          val until = hd.payloadPos + (i + 1) * hd.payloadLen / hd.nFrames
          md.reset()
          md.update(r.media, from, until - from)
          FrameHash(r.media_id, i, md.digest().map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** m5: cross-video duplicate-frame detection — fingerprints shared by
    * more than one video (the frame-level dedup a video corpus runs before
    * captioning/training; repeated intros, black frames, logo cards). The
    * only shuffle is the groupBy on the fingerprint — exactly as wide as
    * exact dedup, no matter how many frames a video has.
    */
  def frameDupes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    frameHashes(mediaTable(s, d)).toDF()
      .groupBy($"frame_md5")
      .agg(
        count(lit(1)).as("n_frames"),
        countDistinct($"media_id").as("n_videos"),
        min($"media_id").as("first_media"))
      .filter($"n_videos" > 1)
      .orderBy($"frame_md5")
  }

  /** Oracle: rebuilds the frame slicing arithmetic over the synthesized
    * payload (text is ASCII, so DuckDB's character substr sees the same
    * bytes the JVM slices) and replays the dedup aggregation.
    */
  val frameDupesSql: String =
    """WITH vids AS (
      |  SELECT doc_id AS media_id, text,
      |    CAST(1 + doc_id % 30 AS INTEGER) AS f,
      |    length(text) AS len
      |  FROM documents WHERE doc_id % 3 = 2
      |), frames AS (
      |  SELECT media_id,
      |    md5(substr(text, CAST(i * len // f AS INTEGER) + 1,
      |      CAST((i + 1) * len // f AS INTEGER) - CAST(i * len // f AS INTEGER)))
      |      AS frame_md5
      |  FROM vids, (SELECT unnest(range(30)) AS i) ix
      |  WHERE i < f
      |)
      |SELECT frame_md5,
      |  CAST(COUNT(*) AS BIGINT) AS n_frames,
      |  CAST(COUNT(DISTINCT media_id) AS BIGINT) AS n_videos,
      |  MIN(media_id) AS first_media
      |FROM frames
      |GROUP BY frame_md5
      |HAVING COUNT(DISTINCT media_id) > 1
      |ORDER BY frame_md5""".stripMargin

  /** Samples per analysis window for [[audioEnergy]]. */
  val AudioWinSize = 256

  /** One analysis window of a decoded audio stream. */
  final case class AudioWindow(
      media_id: Long, win_idx: Int, n_samples: Int, energy: Long, peak: Int)

  /** m6: windowed audio energy — the silence/level analysis an audio corpus
    * runs before segmentation (VAD, loudness filtering, clipping checks).
    * The payload is treated as 8-bit PCM: per [[AudioWinSize]]-sample
    * window, energy = Σ(s−96)² and peak = max|s−96| (96 ≈ the ASCII
    * fixture's center; a real WAV decoder centers at 0 and drops into the
    * same slot). One narrow byte pass per partition — digest-free sibling
    * of [[frameHashes]], same per-partition batch shape, no copies, no
    * shuffle; windows of one object never cross partitions because the
    * slicing happens inside the row's own iteration. All-integer output.
    */
  def audioWindows(media: Dataset[MediaRecord]): Dataset[AudioWindow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val hd = parseHeader(r)
        if (hd.mime != "audio/wav") Iterator.empty
        else {
          val nWins = (hd.payloadLen + AudioWinSize - 1) / AudioWinSize
          (0 until nWins).iterator.map { i =>
            val from = hd.payloadPos + i * AudioWinSize
            val until = math.min(hd.payloadPos + (i + 1) * AudioWinSize,
              hd.payloadPos + hd.payloadLen)
            var j = from
            var energy = 0L
            var peak = 0
            while (j < until) {
              val centered = (r.media(j) & 0xff) - 96
              energy += centered.toLong * centered
              val a = math.abs(centered)
              if (a > peak) peak = a
              j += 1
            }
            AudioWindow(r.media_id, i, until - from, energy, peak)
          }
        }
      }
    }
  }

  def audioEnergy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    audioWindows(mediaTable(s, d)).toDF()
      .orderBy($"media_id", $"win_idx")
  }

  /** Whole-stream level stats for one audio object (m18's unit). */
  final case class AudioLevel(
      media_id: Long, n_samples: Int, sum_abs: Long, peak: Int)

  /** One byte pass per audio object: total samples, Σ|s−96| (mean-abs
    * loudness numerator — integer, unlike RMS whose sqrt would break
    * cross-engine exactness), and peak |s−96|. Same per-partition batch
    * shape as [[audioWindows]], no copies, no shuffle. */
  def audioLevels(media: Dataset[MediaRecord]): Dataset[AudioLevel] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val hd = parseHeader(r)
        if (hd.mime != "audio/wav") Iterator.empty
        else {
          var j = hd.payloadPos
          var sa = 0L
          var pk = 0
          while (j < hd.payloadPos + hd.payloadLen) {
            val a = math.abs((r.media(j) & 0xff) - 96)
            sa += a
            if (a > pk) pk = a
            j += 1
          }
          Iterator.single(AudioLevel(r.media_id, hd.payloadLen, sa, pk))
        }
      }
    }
  }

  /** m19 per-object downsample stats (one byte pass, both rates). */
  final case class DownsampleStat(
      media_id: Long, n_samples: Int, n_ds: Int,
      energy: Long, energy_ds: Long, peak: Int, peak_ds: Int)

  /** m19: DOWNSAMPLE AUDIT (r18) — the resample decision every speech
    * corpus makes before training (16 kHz is the ASR default; storage
    * says lower): stride-2 DECIMATION simulated per audio object in the
    * same single byte pass as m6/m18, emitting original vs decimated
    * sample counts, energies and peaks plus the retained-energy ppm
    * (`energy_ds·2·1e6 DIV energy` — the aliasing-loss proxy, exact
    * integer cross-multiply, m8's no-division-by-parts discipline; a
    * zero-energy stream pins retention at 1e6 rather than dividing by
    * zero). Decimation keeps EVEN payload indices — mirrored in the
    * oracle as the global sample index's parity over the shared m6
    * window replay. Columns are what a resample policy is chosen by:
    * peak_ds == peak says the peaks survive, retained ppm prices the
    * energy the decimator drops. One mapPartitions pass, no shuffle
    * before the final sort.
    */
  def downsampleAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).mapPartitions { it =>
      it.flatMap { r =>
        val hd = parseHeader(r)
        if (hd.mime != "audio/wav") Iterator.empty
        else {
          var j = 0
          var en = 0L; var enDs = 0L
          var pk = 0; var pkDs = 0
          var nDs = 0
          while (j < hd.payloadLen) {
            val c = (r.media(hd.payloadPos + j) & 0xff) - 96
            val e = c.toLong * c
            val a = math.abs(c)
            en += e
            if (a > pk) pk = a
            if (j % 2 == 0) {
              enDs += e; nDs += 1
              if (a > pkDs) pkDs = a
            }
            j += 1
          }
          Iterator.single(DownsampleStat(
            r.media_id, hd.payloadLen, nDs, en, enDs, pk, pkDs))
        }
      }
    }.toDF()
      .select($"media_id", $"n_samples".cast("long").as("n_samples"),
        $"n_ds".cast("long").as("n_ds"), $"energy", $"energy_ds",
        $"peak".cast("long").as("peak"), $"peak_ds".cast("long").as("peak_ds"))
      .withColumn("retained_ppm", expr(
        """CAST(CASE WHEN energy = 0 THEN 1000000
          |  ELSE energy_ds * 2 * 1000000 DIV energy END AS BIGINT)"""
          .stripMargin))
      .orderBy($"media_id")
  }

  /** LAZY: audioWinCtes is declared below this point — a strict val
    * would interpolate null at object init (the kv12/d15 trap; the maps
    * at the bottom force this after every plain val initialized). */
  lazy val downsampleAuditSql: String =
    s"""WITH $audioWinCtes,
       |gsamp AS (
       |  SELECT media_id,
       |    CAST(win_idx AS BIGINT) * $AudioWinSize + j AS gidx, s
       |  FROM (
       |    SELECT media_id, win_idx,
       |      ord(substr(chunk, CAST(j AS INTEGER) + 1, 1)) - 96 AS s, j
       |    FROM wins, (SELECT unnest(range($AudioWinSize)) AS j) jx
       |    WHERE j < length(chunk))),
       |st AS (
       |  SELECT media_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_samples,
       |    CAST(SUM(CASE WHEN gidx % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_ds,
       |    CAST(SUM(CAST(s AS BIGINT) * s) AS BIGINT) AS energy,
       |    CAST(SUM(CASE WHEN gidx % 2 = 0 THEN CAST(s AS BIGINT) * s
       |      ELSE 0 END) AS BIGINT) AS energy_ds,
       |    CAST(MAX(abs(s)) AS BIGINT) AS peak,
       |    CAST(MAX(CASE WHEN gidx % 2 = 0 THEN abs(s) END) AS BIGINT)
       |      AS peak_ds
       |  FROM gsamp GROUP BY media_id)
       |SELECT media_id, n_samples, n_ds, energy, energy_ds, peak, peak_ds,
       |  CAST(CASE WHEN energy = 0 THEN 1000000
       |    ELSE energy_ds * 2 * 1000000 // energy END AS BIGINT)
       |    AS retained_ppm
       |FROM st
       |ORDER BY media_id""".stripMargin

  /** m18: LOUDNESS NORMALIZATION gain table (r17) — the step a speech /
    * audio corpus runs between m6's level analysis and training: bring
    * every stream to a target level so batch loudness is uniform. Per
    * audio object: the gain (×1000, exact integer cross-multiply —
    * `target·1000·n div sum_abs` against a mean-abs target of 16,
    * clamped to [0.1×, 8×], the limiter every normalizer has), the
    * predicted post-gain peak, and a would-clip flag — the rows a
    * resample/limiter stage consumes, and the audit columns (how much
    * of the corpus clips at this target?) a level policy is chosen by.
    * Mean-abs, not RMS: the integer loudness proxy that stays
    * bit-exact on both engines (m8's no-division discipline; the
    * silent-stream edge pins gain at the 8× ceiling rather than
    * dividing by zero). One mapPartitions byte pass, zero shuffles
    * before the final sort.
    */
  def gainNormalize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    audioLevels(mediaTable(s, d)).toDF()
      .select($"media_id", $"n_samples".cast("long").as("n_samples"),
        $"sum_abs", $"peak".cast("long").as("peak"))
      .withColumn("gain_x1000", expr(
        """CAST(CASE WHEN sum_abs = 0 THEN 8000
          |  ELSE greatest(100, least(8000, 16000 * n_samples DIV sum_abs))
          |  END AS BIGINT)""".stripMargin))
      .withColumn("peak_after", expr("peak * gain_x1000 DIV 1000"))
      .withColumn("would_clip", expr(
        "CAST(CASE WHEN peak * gain_x1000 DIV 1000 > 127 THEN 1 ELSE 0 " +
          "END AS BIGINT)"))
      .orderBy($"media_id")
  }

  val gainNormalizeSql: String =
    """WITH auds AS (
      |  SELECT doc_id AS media_id, text,
      |    CAST(length(text) AS BIGINT) AS n_samples
      |  FROM documents WHERE doc_id % 3 = 1),
      |lev AS (
      |  SELECT media_id, n_samples,
      |    CAST(SUM(abs(ord(substr(text, CAST(j AS INTEGER) + 1, 1)) - 96))
      |      AS BIGINT) AS sum_abs,
      |    CAST(MAX(abs(ord(substr(text, CAST(j AS INTEGER) + 1, 1)) - 96))
      |      AS BIGINT) AS peak
      |  FROM auds, (SELECT unnest(range(1024)) AS j) jx
      |  WHERE j < length(text)
      |  GROUP BY media_id, n_samples),
      |g AS (
      |  SELECT media_id, n_samples, sum_abs, peak,
      |    CAST(CASE WHEN sum_abs = 0 THEN 8000
      |      ELSE greatest(100, least(8000, 16000 * n_samples // sum_abs))
      |      END AS BIGINT) AS gain_x1000
      |  FROM lev)
      |SELECT media_id, n_samples, sum_abs, peak, gain_x1000,
      |  CAST(peak * gain_x1000 // 1000 AS BIGINT) AS peak_after,
      |  CAST(CASE WHEN peak * gain_x1000 // 1000 > 127 THEN 1 ELSE 0 END
      |    AS BIGINT) AS would_clip
      |FROM g
      |ORDER BY media_id""".stripMargin

  /** Oracle CTE chain replaying [[audioWindows]] from the documents text
    * (audio objects are the doc_id % 3 = 1 rows with the raw text as
    * payload; the text is ASCII so ord(char) == the byte the JVM reads, and
    * the window arithmetic mirrors exactly). Ends in
    * `winstats(media_id, win_idx, n_samples, energy, peak)` — shared by the
    * m6 and m10 oracles so the replay can never diverge between them.
    */
  private val audioWinCtes: String =
    s"""auds AS (
       |  SELECT doc_id AS media_id, text, length(text) AS len
       |  FROM documents WHERE doc_id % 3 = 1),
       |wins AS (
       |  SELECT media_id, CAST(i AS INTEGER) AS win_idx,
       |    substr(text, CAST(i * $AudioWinSize AS INTEGER) + 1, $AudioWinSize)
       |      AS chunk
       |  FROM auds, (SELECT unnest(range(64)) AS i) ix
       |  WHERE i * $AudioWinSize < len),
       |samples AS (
       |  SELECT media_id, win_idx,
       |    ord(substr(chunk, CAST(j AS INTEGER) + 1, 1)) - 96 AS s
       |  FROM wins, (SELECT unnest(range($AudioWinSize)) AS j) jx
       |  WHERE j < length(chunk)),
       |winstats AS (
       |  SELECT media_id, win_idx,
       |    CAST(COUNT(*) AS INTEGER) AS n_samples,
       |    CAST(SUM(CAST(s AS BIGINT) * s) AS BIGINT) AS energy,
       |    CAST(MAX(abs(s)) AS INTEGER) AS peak
       |  FROM samples
       |  GROUP BY media_id, win_idx)""".stripMargin

  val audioEnergySql: String =
    s"""WITH $audioWinCtes
       |SELECT media_id, win_idx, n_samples, energy, peak
       |FROM winstats
       |ORDER BY media_id, win_idx""".stripMargin

  /** m10: voice-activity segmentation — the step after m6's level analysis:
    * a window is ACTIVE iff its per-sample mean energy exceeds the whole
    * stream's per-sample mean, tested cross-multiplied
    * (energy·total_samples > total_energy·n_samples — no division, exact in
    * both engines, m8's discipline), and consecutive active windows merge
    * into segments via the islands trick (win_idx − row_number is constant
    * within a run). Emits one row per segment with its bounds, window
    * count, and energy mass — the unit a speech pipeline would hand to an
    * ASR/diarization stage.
    *
    * Scale: the byte pass is [[audioWindows]]'s one mapPartitions scan, made
    * ONCE — the per-media totals are unordered window sums over the same
    * media_id partitioning the islands window needs, so the whole operator
    * rides a single media_id exchange (PlanAuditSpec-pinned); a media's
    * windows are bounded by the payload cap so no key skews.
    */
  def vadSegments(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val wins = audioWindows(mediaTable(s, d)).toDF()
    val w0 = Window.partitionBy($"media_id")
    val act = wins
      .withColumn("te", sum($"energy").over(w0))
      .withColumn("tn", sum($"n_samples").over(w0))
      .filter($"energy" * $"tn" > $"te" * $"n_samples")
    val w = Window.partitionBy($"media_id").orderBy($"win_idx")
    act.withColumn("grp", $"win_idx" - row_number().over(w))
      .groupBy($"media_id", $"grp")
      .agg(min($"win_idx").as("seg_start"), max($"win_idx").as("seg_end"),
        count(lit(1)).as("n_wins"), sum($"energy").as("seg_energy"))
      .select($"media_id", $"seg_start", $"seg_end", $"n_wins", $"seg_energy")
      .orderBy($"media_id", $"seg_start")
  }

  val vadSegmentsSql: String =
    s"""WITH $audioWinCtes,
       |tot AS (
       |  SELECT media_id, CAST(SUM(energy) AS BIGINT) AS te,
       |    CAST(SUM(n_samples) AS BIGINT) AS tn
       |  FROM winstats GROUP BY media_id),
       |act AS (
       |  SELECT w.media_id, w.win_idx, w.energy
       |  FROM winstats w JOIN tot t USING (media_id)
       |  WHERE w.energy * t.tn > t.te * w.n_samples),
       |isl AS (
       |  SELECT media_id, win_idx, energy,
       |    win_idx - ROW_NUMBER() OVER (PARTITION BY media_id
       |      ORDER BY win_idx) AS grp
       |  FROM act)
       |SELECT media_id,
       |  CAST(MIN(win_idx) AS INTEGER) AS seg_start,
       |  CAST(MAX(win_idx) AS INTEGER) AS seg_end,
       |  CAST(COUNT(*) AS BIGINT) AS n_wins,
       |  CAST(SUM(energy) AS BIGINT) AS seg_energy
       |FROM isl
       |GROUP BY media_id, grp
       |ORDER BY media_id, seg_start""".stripMargin

  final case class PHash(
      media_id: Long, width: Int, height: Int, hash_hi: Long, hash_lo: Long)

  /** m8: perceptual image hash (aHash family) — a 64-bit mean-threshold
    * signature over the decoded pixel stream: payload bytes are bucketed
    * into 64 cells (cell = pos * 64 div len — the integer "downsample to
    * 8x8"), bit c = 1 iff cell c's mean exceeds the global mean, tested
    * CROSS-MULTIPLIED (cell_sum * len > total_sum * cell_count — no
    * division, engine-exact). Unlike m5's exact frame md5, equal aHashes
    * survive re-encodes that preserve brightness structure — the
    * image-dedup analogue of SimHash. Emitted as two 32-bit halves in
    * BIGINTs (the q43 discipline: no sign-bit ambiguity), plus the
    * perceptual-duplicate group size per hash.
    *
    * Scale: decode+hash is one mapPartitions pass (the m-family byte
    * codec — the one legitimate mapPartitions site), the dup-group count
    * is one window over the 64-bit hash — at corpus scale that exchange
    * is keyed by the hash exactly like d1's exact-dedup groupBy.
    */
  /** Raw (media_id, width, height, hash_hi, hash_lo) per image — the
    * 64-bit perceptual hash without m8's same-hash window, shared with
    * d23's banded near-dup join. */
  private[graft] def phashes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).mapPartitions { it =>
      it.filter(r => new String(r.media, 0, 4,
          java.nio.charset.StandardCharsets.US_ASCII) == "GIMG")
        .map { r =>
          val hd = parseHeader(r)
          val L = hd.payloadLen
          val sums = new Array[Long](64)
          val cnts = new Array[Long](64)
          var total = 0L
          var p = 0
          while (p < L) {
            val b = r.media(hd.payloadPos + p) & 0xff
            val c = p * 64 / L
            sums(c) += b; cnts(c) += 1; total += b
            p += 1
          }
          var hi = 0L; var lo = 0L
          var c = 0
          while (c < 64) {
            val bit = if (sums(c) * L > total * cnts(c)) 1L else 0L
            if (c >= 32) hi |= bit << (c - 32) else lo |= bit << c
            c += 1
          }
          PHash(r.media_id, hd.width, hd.height, hi, lo)
        }
    }.toDF()
  }

  def perceptualHash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    phashes(s, d)
      .withColumn("n_same_hash",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy($"hash_hi", $"hash_lo")))
      .orderBy($"media_id")
  }

  val perceptualHashSql: String =
    """WITH imgs AS (
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
      |      THEN bit * (CAST(1 AS BIGINT) << (cell - 32)) ELSE 0 END) AS BIGINT)
      |      AS hash_hi,
      |    CAST(SUM(CASE WHEN cell < 32
      |      THEN bit * (CAST(1 AS BIGINT) << cell) ELSE 0 END) AS BIGINT)
      |      AS hash_lo
      |  FROM bits GROUP BY 1)
      |SELECT h.media_id,
      |  CAST(16 + h.media_id % 640 AS INTEGER) AS width,
      |  CAST(16 + (h.media_id * 7) % 480 AS INTEGER) AS height,
      |  h.hash_hi, h.hash_lo,
      |  COUNT(*) OVER (PARTITION BY h.hash_hi, h.hash_lo) AS n_same_hash
      |FROM hash h
      |ORDER BY h.media_id""".stripMargin

  /** Mean-brightness delta (whole units) above which consecutive frames
    * start a new scene — cross-multiplied in the comparison, so change it
    * here and in [[sceneDetectSql]] or neither. Empirical: the fixture's
    * frame-to-frame deltas have median ~3.4, so 3 splits roughly half of
    * adjacent pairs. */
  val SceneThresh = 3L

  /** One brightness stat per decoded video frame (m9 input). */
  final case class FrameStat(
      media_id: Long, frame_idx: Int, flen: Int, bsum: Long)

  /** m9: scene-change detection — the video analogue of text
    * sessionization. Each frame reduces to one integer (byte sum = total
    * brightness, the cheapest pixel statistic a real decoder also has);
    * a scene boundary fires where adjacent frames' MEAN brightness
    * differs by more than [[SceneThresh]] units, compared
    * cross-multiplied (`|bsum_i*len_prev - bsum_prev*len_i| >
    * T*len_i*len_prev`) so no division ever happens; scene ids are the
    * running count of boundaries (the lag-gap sessionization pattern from
    * q34 applied to frames). Output is one row per scene with its frame
    * span and byte size — what a sampling stage feeds on (sample one
    * frame per scene, not per frame-count stride like m3).
    *
    * Scale: stats are the one-pass per-partition byte codec; the window
    * is keyed by media_id (a video's frames are tens-to-thousands —
    * bounded), and the groupBy reuses the same key, so the whole operator
    * is one narrow pass + one keyed exchange.
    */
  def sceneDetect(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    scenesFrame(s, d).orderBy($"media_id", $"scene_id")
  }

  /** m9's per-(media, scene) frame, unsorted — shared with m16's
    * frame-budget planner. */
  private def scenesFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val stats = mediaTable(s, d).mapPartitions { it =>
      it.flatMap { r =>
        val hd = parseHeader(r)
        if (hd.mime != "video/mp4") Iterator.empty
        else (0 until hd.nFrames).iterator.map { i =>
          val from = hd.payloadPos + i * hd.payloadLen / hd.nFrames
          val until = hd.payloadPos + (i + 1) * hd.payloadLen / hd.nFrames
          var j = from
          var bsum = 0L
          while (j < until) { bsum += (r.media(j) & 0xff); j += 1 }
          FrameStat(r.media_id, i, until - from, bsum)
        }
      }
    }.toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"media_id").orderBy($"frame_idx")
    stats
      // Zero-length frames (video shorter than its frame count) carry no
      // pixels: drop them BEFORE the lag, mirroring the oracle where the
      // per-char join naturally produces no row for an empty chunk.
      .filter($"flen" > 0)
      .withColumn("lp", lag($"flen", 1).over(w))
      .withColumn("bp", lag($"bsum", 1).over(w))
      .withColumn("boundary",
        when($"lp".isNull, lit(0))
          .when(abs($"bsum" * $"lp" - $"bp" * $"flen") >
            lit(SceneThresh) * $"flen" * $"lp", lit(1))
          .otherwise(lit(0)))
      .withColumn("scene_id", sum($"boundary").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy($"media_id", $"scene_id")
      .agg(min($"frame_idx").as("start_frame"),
        max($"frame_idx").as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum($"flen".cast("long")).as("scene_bytes"))
  }

  /** m9's oracle CTE chain up to the per-frame `scenes` relation —
    * shared with m16. */
  private val sceneCtes: String =
    s"""WITH vids AS (
       |  SELECT doc_id AS media_id, text,
       |    CAST(1 + doc_id % 30 AS INTEGER) AS f,
       |    length(text) AS len
       |  FROM documents WHERE doc_id % 3 = 2),
       |frames AS (
       |  SELECT media_id, CAST(i AS INTEGER) AS frame_idx,
       |    substr(text, CAST(i * len // f AS INTEGER) + 1,
       |      CAST((i+1) * len // f AS INTEGER) - CAST(i * len // f AS INTEGER))
       |      AS chunk
       |  FROM vids, (SELECT unnest(range(30)) AS i) ix
       |  WHERE i < f),
       |stats AS (
       |  SELECT media_id, frame_idx,
       |    CAST(length(chunk) AS INTEGER) AS flen,
       |    CAST(SUM(ord(substr(chunk, CAST(j AS INTEGER) + 1, 1))) AS BIGINT)
       |      AS bsum
       |  FROM frames, (SELECT unnest(range(1024)) AS j) jx
       |  WHERE j < length(chunk)
       |  GROUP BY 1, 2, 3),
       |flagged AS (
       |  SELECT media_id, frame_idx, flen, bsum,
       |    CASE WHEN lag(flen) OVER w IS NULL THEN 0
       |         WHEN abs(bsum * lag(flen) OVER w - lag(bsum) OVER w * flen)
       |              > $SceneThresh * flen * (lag(flen) OVER w) THEN 1
       |         ELSE 0 END AS boundary
       |  FROM stats WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx)),
       |scenes AS (
       |  SELECT media_id, frame_idx, flen,
       |    CAST(SUM(boundary) OVER (PARTITION BY media_id ORDER BY frame_idx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS scene_id
       |  FROM flagged)""".stripMargin

  val sceneDetectSql: String = sceneCtes + "\n" +
    """SELECT media_id, scene_id,
      |  MIN(frame_idx) AS start_frame, MAX(frame_idx) AS end_frame,
      |  COUNT(*) AS n_frames, CAST(SUM(flen) AS BIGINT) AS scene_bytes
      |FROM scenes
      |GROUP BY media_id, scene_id
      |ORDER BY media_id, scene_id""".stripMargin

  /** m16: scene-aware FRAME-SAMPLE budget planner (r16) — the sampling
    * policy a video training pipeline actually runs (scene-proportional
    * sampling, not uniform stride — every VideoCLIP-style loader's
    * preprocessing decision): each video gets a [[FrameBudget]]-frame
    * budget allocated ACROSS its m9 scenes by the largest-remainder
    * method (base = `K·n div tot`, remainders ranked `(rem DESC,
    * scene_id ASC)` hand out the leftover — deterministic, sums to
    * exactly K), and a video with fewer total frames than the budget
    * samples everything (alloc = n_frames; with tot > K the
    * largest-remainder alloc provably never exceeds a scene's frames).
    * Emitted per scene: frames, bytes, alloc — the loader's sampling
    * manifest. One m9 scene pass + a media-keyed totals join + one
    * media-partitioned rank window (bounded by ≤30 scenes per video);
    * [[FrameBudget]] mirrored literally.
    */
  val FrameBudget = 8L

  def frameBudget(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val sc = scenesFrame(s, d)
      .select($"media_id", $"scene_id", $"n_frames", $"scene_bytes")
    val tot = sc.groupBy($"media_id").agg(sum($"n_frames").as("tf"))
    val w = Window.partitionBy($"media_id")
    val wr = Window.partitionBy($"media_id")
      .orderBy($"rem".desc, $"scene_id".asc)
    sc.join(tot, Seq("media_id"))
      .withColumn("base", expr(s"$FrameBudget * n_frames div tf"))
      .withColumn("rem", expr(s"$FrameBudget * n_frames % tf"))
      .withColumn("rk", row_number().over(wr))
      .withColumn("sb", sum($"base").over(w))
      .select($"media_id", $"scene_id", $"n_frames", $"scene_bytes",
        when($"tf" <= FrameBudget, $"n_frames")
          .otherwise($"base" +
            when($"rk" <= lit(FrameBudget) - $"sb", 1L).otherwise(0L))
          .as("alloc"))
      .orderBy($"media_id", $"scene_id")
  }

  val frameBudgetSql: String = sceneCtes + ",\n" +
    s"""sc16 AS (
       |  SELECT media_id, scene_id, COUNT(*) AS n_frames,
       |    CAST(SUM(flen) AS BIGINT) AS scene_bytes
       |  FROM scenes GROUP BY media_id, scene_id),
       |tot16 AS (
       |  SELECT media_id, CAST(SUM(n_frames) AS BIGINT) AS tf
       |  FROM sc16 GROUP BY media_id),
       |a16 AS (
       |  SELECT s.media_id, s.scene_id, s.n_frames, s.scene_bytes, t.tf,
       |    $FrameBudget * s.n_frames // t.tf AS base,
       |    $FrameBudget * s.n_frames % t.tf AS rem
       |  FROM sc16 s JOIN tot16 t USING (media_id)),
       |r16 AS (
       |  SELECT *,
       |    ROW_NUMBER() OVER (PARTITION BY media_id
       |      ORDER BY rem DESC, scene_id ASC) AS rk,
       |    SUM(base) OVER (PARTITION BY media_id) AS sb
       |  FROM a16)
       |SELECT media_id, scene_id, CAST(n_frames AS BIGINT) AS n_frames,
       |  scene_bytes,
       |  CAST(CASE WHEN tf <= $FrameBudget THEN n_frames
       |    ELSE base + CASE WHEN rk <= $FrameBudget - sb THEN 1 ELSE 0 END
       |    END AS BIGINT) AS alloc
       |FROM r16
       |ORDER BY media_id, scene_id""".stripMargin

  /** m11: modality card — p18's datasheet for the binary corpus: per mime,
    * object count, payload byte volume, and total pixel volume
    * (width × height × frames from the DECODED headers — the number a GPU
    * budget planner multiplies by bytes-per-pixel; audio rows contribute
    * their header's nominal w×h grid, not meaningful pixels). One
    * decode pass (the m-family mapPartitions) + one mime-keyed partial
    * agg; the oracle re-derives every number from the synthesis formulas.
    */
  def modalityCard(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    extractFeatures(mediaTable(s, d)).toDF()
      .groupBy($"mime")
      .agg(count(lit(1)).as("n_objects"),
        sum($"n_payload".cast("long")).as("payload_bytes"),
        sum($"width".cast("long") * $"height" * $"n_frames").as("px_total"))
      .orderBy($"mime")
  }

  val modalityCardSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    ['image/png','audio/wav','video/mp4'][CAST(doc_id % 3 AS INTEGER) + 1]
      |      AS mime,
      |    OCTET_LENGTH(CAST(text AS BLOB)) AS n_payload,
      |    CAST(16 + doc_id % 640 AS BIGINT)
      |      * (16 + (doc_id * 7) % 480)
      |      * (CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 30 ELSE 1 END) AS px
      |  FROM documents)
      |SELECT mime, COUNT(*) AS n_objects,
      |  CAST(SUM(n_payload) AS BIGINT) AS payload_bytes,
      |  CAST(SUM(px) AS BIGINT) AS px_total
      |FROM m
      |GROUP BY mime
      |ORDER BY mime""".stripMargin

  /** m12: interleaved multimodal SEQUENCE PACKING — the step that turns
    * m7's per-sample token accounting into the context windows a VLM
    * training run consumes (MMC4-style interleaved image/audio/video +
    * text records): samples that fit the context budget pack greedily in
    * media_id order within (mime, source) LANES — per-modality,
    * per-domain batches, which is both the semantics a trainer wants
    * (image-text and video-text batches differ) and the partitioning that
    * keeps every packing window parallel (p3's lane discipline; no
    * corpus-wide sort). Bin id = tokens-before div budget, p3's streaming
    * contract. Per bin: sample count and the text/media/total token
    * volumes — the bin's padding waste is CtxBudget - total_tok.
    *
    * Scale: m7's one decode pass + a lane-keyed window + one partial agg;
    * lanes are (mime × source), so parallelism grows with the catalog,
    * not the corpus.
    */
  def interleavedPack(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val src = graft.Tables.documents(s, d)
      .select($"doc_id".as("media_id"), $"source")
    val w = Window.partitionBy($"mime", $"source").orderBy($"media_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokenBudget(s, d).filter($"fits")
      .join(src, Seq("media_id"))
      .withColumn("cum", sum($"total_tokens").over(w))
      .withColumn("bin", expr(s"(cum - total_tokens) div $CtxBudget"))
      .groupBy($"mime", $"source", $"bin")
      .agg(count(lit(1)).as("n_samples"),
        sum($"text_tokens").as("text_tok"),
        sum($"media_tokens").as("media_tok"),
        sum($"total_tokens").as("total_tok"))
      .orderBy($"mime", $"source", $"bin")
  }

  val interleavedPackSql: String =
    s"""WITH m7 AS (SELECT * FROM (__M7__) t WHERE fits),
       |j AS (
       |  SELECT m.media_id, m.mime, m.text_tokens, m.media_tokens,
       |    m.total_tokens, d.source
       |  FROM m7 m JOIN documents d ON d.doc_id = m.media_id),
       |c AS (
       |  SELECT mime, source, media_id, text_tokens, media_tokens,
       |    total_tokens,
       |    SUM(total_tokens) OVER (PARTITION BY mime, source
       |      ORDER BY media_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM j)
       |SELECT mime, source,
       |  CAST((cum - total_tokens) // $CtxBudget AS BIGINT) AS bin,
       |  COUNT(*) AS n_samples,
       |  CAST(SUM(text_tokens) AS BIGINT) AS text_tok,
       |  CAST(SUM(media_tokens) AS BIGINT) AS media_tok,
       |  CAST(SUM(total_tokens) AS BIGINT) AS total_tok
       |FROM c
       |GROUP BY 1, 2, 3
       |ORDER BY mime, source, bin""".stripMargin
      .replace("__M7__", tokenBudgetSql)

  /** m13: container DQ AUDIT — the gate every multimodal ingest runs
    * between decode (m1) and inventory (m11): per mime, how many decoded
    * containers trip each acceptance rule — extreme aspect ratio
    * (w > 4h or h > 4w: banner/strip crops that resize badly), tiny
    * frames (w*h < 4096: thumbnails masquerading as images), frame-heavy
    * videos (f > 24: over the per-sample frame budget) — plus the clean
    * count the sampler may draw from. Flags come from the REAL byte-level
    * header decode (the m1 codec), not trusted metadata; the oracle
    * re-derives them from the synthesis formulas (the m-family contract:
    * any `mediaTable` change updates these SQLs). Pure map-side decode +
    * one mime-keyed partial aggregation. Thresholds (4x, 4096, 24)
    * mirrored literally.
    */
  def containerAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    extractFeatures(mediaTable(s, d)).toDF()
      .withColumn("aspect_extreme",
        $"width" > $"height" * 4 || $"height" > $"width" * 4)
      .withColumn("tiny", $"width".cast("long") * $"height" < 4096L)
      .withColumn("frame_heavy", $"n_frames" > 24)
      .groupBy($"mime")
      .agg(count(lit(1)).as("n_objects"),
        sum(when($"aspect_extreme", 1L).otherwise(0L)).as("n_aspect_extreme"),
        sum(when($"tiny", 1L).otherwise(0L)).as("n_tiny"),
        sum(when($"frame_heavy", 1L).otherwise(0L)).as("n_frame_heavy"),
        sum(when(!$"aspect_extreme" && !$"tiny" && !$"frame_heavy", 1L)
          .otherwise(0L)).as("n_clean"))
      .orderBy($"mime")
  }

  val containerAuditSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    ['image/png','audio/wav','video/mp4'][CAST(doc_id % 3 AS INTEGER) + 1]
      |      AS mime,
      |    16 + doc_id % 640 AS w, 16 + (doc_id * 7) % 480 AS h,
      |    CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 30 ELSE 1 END AS f
      |  FROM documents)
      |SELECT mime, CAST(COUNT(*) AS BIGINT) AS n_objects,
      |  CAST(SUM(CASE WHEN w > h * 4 OR h > w * 4 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_aspect_extreme,
      |  CAST(SUM(CASE WHEN w * h < 4096 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_tiny,
      |  CAST(SUM(CASE WHEN f > 24 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_frame_heavy,
      |  CAST(SUM(CASE WHEN NOT (w > h * 4 OR h > w * 4)
      |    AND NOT (w * h < 4096) AND NOT (f > 24) THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_clean
      |FROM m
      |GROUP BY mime
      |ORDER BY mime""".stripMargin

  /** m14: image–caption PAIR admission — the LAION-style gate a
    * multimodal training set runs per PAIR, not per side: (image, its
    * source text) pairs (m7's pairing convention) are dropped when (a)
    * the IMAGE is a perceptual near-dup of an earlier image — the d19
    * greedy admission rule applied to d23's banded phash edge list
    * (`dup_of` = lowest-id qualifying neighbor; transitive canonical
    * pick is d6's job) — or (b) the CAPTION is under [[MinCapTok]]
    * tokens (the alt-text-too-short filter; 52 of 167 sf0.01 pairs).
    * Output keeps every pair with its verdict so the drop is auditable.
    * Shapes: d23's candidate generation is the banded equi-join (never
    * all-pairs), the dup-anchor reduce is one doc_b-keyed min, and the
    * verdict join is media_id-keyed — all keyed exchanges.
    * [[MinCapTok]] mirrored literally in the oracle.
    */
  val MinCapTok = 40

  def pairAdmission(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dupOf = graft.operators.Dedup.phashNearDup(s, d)
      .groupBy($"doc_b".as("media_id"))
      .agg(min($"doc_a").as("dup_of"))
    val pairs = Tables.documents(s, d)
      .filter($"doc_id" % 3 === 0)
      .select($"doc_id".as("media_id"),
        size(split($"text", " ")).cast("long").as("cap_tokens"))
    pairs.join(dupOf, Seq("media_id"), "left")
      .select($"media_id", $"cap_tokens", $"dup_of",
        ($"dup_of".isNull && $"cap_tokens" >= MinCapTok).as("kept"))
      .orderBy($"media_id")
  }

  val pairAdmissionSql: String =
    s"""WITH dups AS (__D23__),
       |dupof AS (
       |  SELECT doc_b AS media_id, MIN(doc_a) AS dup_of
       |  FROM dups GROUP BY 1),
       |pairs AS (
       |  SELECT doc_id AS media_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS cap_tokens
       |  FROM documents WHERE doc_id % 3 = 0)
       |SELECT p.media_id, p.cap_tokens, d.dup_of,
       |  (d.dup_of IS NULL AND p.cap_tokens >= $MinCapTok) AS kept
       |FROM pairs p LEFT JOIN dupof d USING (media_id)
       |ORDER BY p.media_id""".stripMargin
      .replace("__D23__", graft.operators.Dedup.phashNearDupSql)

  /** m15: image–caption ALIGNMENT score — the CLIP-filter step of the
    * LAION recipe (Schuhmann et al. 2021 keep pairs with CLIP similarity
    * over a threshold), the gate m14's dup/length rules don't cover:
    * WHAT the image shows vs what the caption says. No image encoder
    * ships in this container, so the image-side embedding is the
    * DETERMINISTIC stand-in this codebase already trades in: m8's
    * 64-bit perceptual hash read as a ±1 sign vector (brightness
    * structure as direction — the m-family synthesis discipline, oracle
    * replays it bit-for-bit); the caption side is the real embeddings
    * row. Score = the FloatDot left-to-right dot (the s1 float
    * discipline, list_reduce-mirrored), `aligned` = score > 0. Pairs =
    * media docs whose caption has an embedding row (inner vec_id join —
    * keyed). Shapes: one mapPartitions decode pass (the m-family
    * codec), one in-row sign transform, one keyed join; no window.
    */
  def pairAlignment(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val signs = phashes(s, d).select($"media_id",
      expr(
        """transform(sequence(0, 63), i -> CAST(
          |  (CASE WHEN i < 32 THEN (hash_lo >> i) & 1
          |        ELSE (hash_hi >> (i - 32)) & 1 END) * 2 - 1 AS FLOAT))"""
          .stripMargin).as("sv"))
    val e = graft.Tables.embeddings(s, d)
      .select($"vec_id".as("media_id"), $"embedding")
    signs.join(e, Seq("media_id"))
      .select($"media_id",
        graft.functions.VectorFunctions.dot($"sv", $"embedding").as("score"))
      .withColumn("aligned", $"score" > 0.0)
      .orderBy($"media_id")
  }

  val pairAlignmentSql: String =
    """WITH imgs AS (
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
      |sv AS (
      |  -- full 64-cell grid: a payload shorter than 64 bytes leaves
      |  -- cells empty, and an empty cell's bit is 0 (0 > 0 is false on
      |  -- the Spark side too) — the sign vector must still be 64-long
      |  SELECT g.media_id,
      |    list(CAST(COALESCE(b.bit, 0) * 2 - 1 AS FLOAT) ORDER BY g.cell)
      |      AS signs
      |  FROM (SELECT media_id, CAST(c AS INTEGER) AS cell
      |        FROM imgs, (SELECT unnest(range(64)) AS c) cc) g
      |  LEFT JOIN bits b ON b.media_id = g.media_id AND b.cell = g.cell
      |  GROUP BY g.media_id),
      |scored AS (
      |  SELECT v.media_id,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(range(1, 65),
      |        i -> CAST(v.signs[i] AS DOUBLE) *
      |             CAST(e.embedding[i] AS DOUBLE))),
      |      (acc, x) -> acc + x) AS score
      |  FROM sv v JOIN embeddings e ON e.vec_id = v.media_id)
      |SELECT media_id, score, (score > 0.0) AS aligned
      |FROM scored
      |ORDER BY media_id""".stripMargin

  /** m17: ASPECT-RATIO BUCKETED BATCHING — the vision-training collate
    * step (SDXL-style aspect bucketing; p16's length batching for
    * images): padding every image in a batch to the batch max dims
    * wastes FLOPs proportional to dimension spread, so images group by
    * aspect CLASS first (w·100 div h: <80 portrait, ≤125 square, else
    * landscape — constants mirrored in the oracle) and batch in fixed
    * counts of 8 within (class, shard). The emitted per-batch PAD WASTE
    * (Σ max_w·max_h − w·h, exact ints) is the price the bucketing
    * minimizes — visible in the result, so a regression in bucketing
    * quality is a hash change, not a vibe. Shard = media_id mod 4 keeps
    * every rank window partition-local (the production packer shape:
    * per-shard batching, zero cross-shard coordination; the window is
    * per (class, shard), never corpus-wide). Images only (kind 0 of the
    * synthesized container corpus).
    */
  def aspectBatching(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val imgs = Tables.documents(s, d)
      .filter($"doc_id" % 3 === 0)
      .select($"doc_id".as("media_id"),
        (lit(16) + $"doc_id" % 640).cast("int").as("w"),
        (lit(16) + ($"doc_id" * 7) % 480).cast("int").as("h"))
      .withColumn("r", expr("w * 100 DIV h"))
      .withColumn("cls", when($"r" < 80, "portrait")
        .when($"r" <= 125, "square").otherwise("landscape"))
      .withColumn("shard", ($"media_id" % 4).cast("int"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"cls", $"shard").orderBy($"media_id")
    imgs
      .withColumn("rn", row_number().over(w))
      .withColumn("batch", expr("CAST((rn - 1) DIV 8 AS INT)"))
      .groupBy($"cls", $"shard", $"batch")
      .agg(count(lit(1)).as("n_imgs"),
        (max($"w") * max($"h") * count(lit(1))
          - sum($"w" * $"h")).as("pad_waste"),
        sum($"w" * $"h").as("px"))
      .orderBy($"cls", $"shard", $"batch")
  }

  val aspectBatchingSql: String =
    """WITH imgs AS (
      |  SELECT doc_id AS media_id,
      |    CAST(16 + doc_id % 640 AS INTEGER) AS w,
      |    CAST(16 + (doc_id * 7) % 480 AS INTEGER) AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |cls AS (
      |  SELECT media_id, w, h,
      |    CASE WHEN w * 100 // h < 80 THEN 'portrait'
      |         WHEN w * 100 // h <= 125 THEN 'square'
      |         ELSE 'landscape' END AS cls,
      |    CAST(media_id % 4 AS INTEGER) AS shard
      |  FROM imgs),
      |rk AS (
      |  SELECT *, CAST((ROW_NUMBER() OVER (PARTITION BY cls, shard
      |      ORDER BY media_id) - 1) // 8 AS INTEGER) AS batch
      |  FROM cls)
      |SELECT cls, shard, batch,
      |  CAST(COUNT(*) AS BIGINT) AS n_imgs,
      |  CAST(MAX(w) * MAX(h) * COUNT(*) - SUM(w * h) AS BIGINT)
      |    AS pad_waste,
      |  CAST(SUM(w * h) AS BIGINT) AS px
      |FROM rk
      |GROUP BY cls, shard, batch
      |ORDER BY cls, shard, batch""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m17_aspect_batching" -> (aspectBatching _),
    "m16_frame_budget" -> (frameBudget _),
    "m15_pair_alignment" -> (pairAlignment _),
    "m14_pair_admission" -> (pairAdmission _),
    "m13_container_audit" -> (containerAudit _),
    "m12_interleaved_pack" -> (interleavedPack _),
    "m11_modality_card" -> (modalityCard _),
    "m10_vad_segments" -> (vadSegments _),
    "m9_scene_detect" -> (sceneDetect _),
    "m8_perceptual_hash" -> (perceptualHash _),
    "m7_token_budget"   -> (tokenBudget _),
    "m18_gain_normalize" -> (gainNormalize _),
    "m19_downsample_audit" -> (downsampleAudit _),
    "m6_audio_energy"   -> (audioEnergy _),
    "m1_media_meta"     -> (mediaMeta _),
    "m2_media_features" -> (mediaFeatures _),
    "m3_frame_sample"   -> (frameSample _),
    "m4_resize_plan"    -> (resizePlan _),
    "m5_frame_dedup"    -> (frameDupes _))

  val oracle: Map[String, String] = Map(
    "m17_aspect_batching" -> aspectBatchingSql,
    "m16_frame_budget" -> frameBudgetSql,
    "m15_pair_alignment" -> pairAlignmentSql,
    "m14_pair_admission" -> pairAdmissionSql,
    "m13_container_audit" -> containerAuditSql,
    "m12_interleaved_pack" -> interleavedPackSql,
    "m11_modality_card" -> modalityCardSql,
    "m10_vad_segments" -> vadSegmentsSql,
    "m9_scene_detect" -> sceneDetectSql,
    "m8_perceptual_hash" -> perceptualHashSql,
    "m7_token_budget"   -> tokenBudgetSql,
    "m1_media_meta"     -> mediaMetaSql,
    "m2_media_features" -> mediaFeaturesSql,
    "m3_frame_sample"   -> frameSampleSql,
    "m4_resize_plan"    -> resizePlanSql,
    "m5_frame_dedup"    -> frameDupesSql,
    "m6_audio_energy"   -> audioEnergySql,
    "m18_gain_normalize" -> gainNormalizeSql,
    "m19_downsample_audit" -> downsampleAuditSql)
}
