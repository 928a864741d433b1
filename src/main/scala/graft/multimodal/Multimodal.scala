package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (BASELINE.json north_star): image/audio/video
  * as opaque `binary` columns + typed metadata, with decode/feature-extract
  * as batched per-partition functions.
  *
  * The container has no media codecs, so `decodeStub` is a clearly-marked
  * deterministic FAKE decode; everything around it — schema, Dataset[T]
  * encoders, mapPartitions batch shape, partitioning — is the real 100 TB
  * plumbing: a production decoder drops into [[decodeBatch]] unchanged. The
  * equivalent PySpark shape is `mapInPandas` with an Arrow batch per
  * partition; in Scala the idiomatic form is a typed mapPartitions, which
  * keeps the bytes in one pass and never collects to the driver.
  */
object Multimodal {

  /** One media object: opaque bytes + mime. */
  final case class MediaRecord(
      media_id: Long, media: Array[Byte], mime: String, source: String)

  /** Typed decode output. */
  final case class MediaFeatures(
      media_id: Long, mime: String, n_bytes: Int, checksum: String,
      width: Int, height: Int, n_frames: Int)

  /** Synthesize a binary corpus from `documents` (fixtures carry no real
    * media; bytes are the UTF-8 text, mime assigned round-robin).
    */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(
        $"doc_id".as("media_id"),
        $"text".cast("binary").as("media"),
        element_at(
          typedLit(Seq("image/png", "audio/wav", "video/mp4")),
          ($"doc_id" % 3).cast("int") + 1).as("mime"),
        $"source")
      .as[MediaRecord]
  }

  /** FAKE decode: deterministic pseudo-features from the raw bytes. A real
    * implementation would decode pixels/samples/frames here; the signature
    * and batching are what a production decoder plugs into.
    */
  private[multimodal] def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.media.length
    // byte-sum checksum stands in for a perceptual hash
    var sum = 0L
    var i = 0
    while (i < n) { sum += (r.media(i) & 0xff); i += 1 }
    MediaFeatures(
      media_id = r.media_id,
      mime = r.mime,
      n_bytes = n,
      checksum = java.lang.Long.toHexString(sum * 2654435761L),
      width = (n % 640) + 16,
      height = ((n * 7) % 480) + 16,
      n_frames = if (r.mime.startsWith("video")) (n % 30) + 1 else 1)
  }

  /** Batched decode: one iterator per partition — a real codec would init
    * per-partition (load model / codec context) once here, then stream.
    */
  def decodeBatch(it: Iterator[MediaRecord]): Iterator[MediaFeatures] =
    it.map(decodeStub)

  /** Distributed feature extraction over the media table. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(decodeBatch)
  }

  /** Oracle-checkable metadata projection (pure SQL-expressible part: byte
    * length, md5, mime classification).
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

  val mediaMetaSql: String =
    """SELECT doc_id AS media_id,
      | ['image/png','audio/wav','video/mp4'][CAST(doc_id % 3 AS INTEGER) + 1] AS mime,
      | CAST(OCTET_LENGTH(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
      | md5(text) AS checksum_md5,
      | CASE WHEN doc_id % 3 = 0 THEN 'still'
      |      WHEN doc_id % 3 = 1 THEN 'waveform'
      |      ELSE 'frames' END AS kind
      |FROM documents
      |ORDER BY media_id""".stripMargin

  /** Rows-only entry: the full mapPartitions decode pipeline (stubbed codec,
    * real distributed shape).
    */
  def mediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    extractFeatures(mediaTable(s, d)).toDF().orderBy($"media_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_media_meta"     -> (mediaMeta _),
    "m2_media_features" -> (mediaFeatures _))

  val oracle: Map[String, String] = Map(
    "m1_media_meta" -> mediaMetaSql)
}
