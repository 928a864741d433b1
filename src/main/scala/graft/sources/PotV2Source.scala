package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's native pot storage — one
  * `data.json` object per pot path holding a single JSON map
  * `{"<key>": {<document>}, ...}` (server.go:212-214, 318-331).
  *
  * [[PotJson]] is the dataflow form (wholetext + from_json); this is the
  * CONNECTOR form a Spark-native engine exposes so pot buckets are tables:
  *
  *   spark.read.format("graft.sources.PotV2Source")
  *     .option("path", "s3://bucket/pots/&lt;glob&gt;/data.json").load()
  *
  * Architecture (the real V2 contract, not a wrapper):
  *   - TableProvider/Table with BATCH_READ;
  *   - planning globs the path DRIVER-side and emits ONE InputPartition
  *     per pot object — a pot bucket with 10k paths scans with 10k
  *     embarrassingly-parallel tasks, no shuffle, no driver JSON work;
  *   - each PartitionReader streams its file through Jackson (the JSON
  *     parser already on Spark's classpath) and emits (pot_file, key,
  *     doc_json) InternalRows;
  *   - SupportsPushDownRequiredColumns: column pruning reaches the
  *     reader, so `SELECT key` never materializes document bodies —
  *     the V2 analogue of the parquet ReadSchema discipline the rest of
  *     the suite pins in plans.
  *
  * Schema is the fixed raw triple (documents vary per key — typing is the
  * client's job, exactly like the reference's `Client[T]`); compose with
  * `from_json` for typed reads. Keys are emitted in the file's own order
  * (Jackson preserves it); callers needing determinism sort — same
  * contract as the reference's Go map iteration being unordered.
  */
class PotV2Source extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PotV2Source.Schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PotV2Table(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = true
}

object PotV2Source {
  val Schema: StructType = StructType(Seq(
    StructField("pot_file", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("doc_json", StringType, nullable = false)))
}

private[sources] class PotV2Table(path: String) extends Table with SupportsRead {
  require(path != null && path.nonEmpty,
    "PotV2Source: .option(\"path\", <glob of data.json objects>) is required")
  override def name(): String = s"pot-json:$path"
  override def schema(): StructType = PotV2Source.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PotV2ScanBuilder(path)
}

private[sources] class PotV2ScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PotV2Source.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new PotV2Scan(path, required)
}

private[sources] class PotV2Scan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    matched.filter(_.isFile)
      .map(st => PotFilePartition(st.getPath.toString): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PotV2ReaderFactory(required.fieldNames)
}

private[sources] case class PotFilePartition(file: String) extends InputPartition

private[sources] class PotV2ReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[PotFilePartition].file
    new PartitionReader[InternalRow] {
      private val entries: Iterator[(String, String)] = {
        val p = new Path(file)
        val fs = p.getFileSystem(new Configuration())
        val in = fs.open(p)
        val root = try new ObjectMapper().readTree(in) finally in.close()
        require(root != null && root.isObject,
          s"pot object $file: top level must be a JSON map")
        root.fields().asScala.map(e => (e.getKey, e.getValue.toString))
      }
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (!entries.hasNext) return false
        val (k, doc) = entries.next()
        row = InternalRow.fromSeq(columns.toSeq.map {
          case "pot_file" => UTF8String.fromString(file)
          case "key"      => UTF8String.fromString(k)
          case "doc_json" => UTF8String.fromString(doc)
          case other => throw new IllegalArgumentException(
            s"PotV2Source: unknown column $other")
        })
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
