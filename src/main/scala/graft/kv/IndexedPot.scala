package graft.kv

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Secondary index over a pot field, maintained TRANSACTIONALLY with the
  * primary — the query-by-value capability the reference's pure KV surface
  * lacks (a pot can only be addressed by key; finding "every customer in
  * segment X" is a full scan there).
  *
  * Layout: two pots under one root —
  *   - `<name>-data`: the primary map, key → document (normal LWW pot);
  *   - `<name>-idx`: one POSTING row per distinct value of the indexed
  *     field `fval`: key = the field value, `keys` = sorted array of
  *     primary keys currently holding it. Value-keyed postings make a
  *     lookup a point read (and on a bucketed index pot, a kv10-style
  *     single-bucket read).
  *
  * Maintenance ([[upsert]]): the affected value set = old values of the
  * batch's keys (one semi-join against the primary) ∪ the batch's new
  * values — bounded by 2×|batch|, so collecting it to the driver is the
  * same bounded-driver discipline as the touched-bucket lists. Postings
  * for exactly those values are recomputed from the post-merge state and
  * written WITH the data batch through [[PotTxn.commitAll]] — one WAL
  * commit point, so a crash can never leave the index missing a committed
  * data write (roll-forward replays both). A value whose last key moved
  * away gets an EMPTY posting (LWW tombstone-by-overwrite; PotTxn applies
  * upserts only).
  *
  * Scale: the posting recompute is a value-filtered scan + groupBy of the
  * primary — correct but O(table-scan) per batch; the 100 TB evolution
  * keeps the same commit protocol and swaps the recompute for delta
  * posting maintenance (point-read the affected postings, subtract moved
  * keys, add arrived keys) over a bucketed index pot. Posting rows are
  * value-cardinality bounded — a field with pathological skew (half the
  * table one value) belongs in a bucketed-scan, not an index, exactly as
  * in any database.
  *
  * Lookups ([[lookup]]) re-check `fval` on the fetched documents, so a
  * reader racing the (atomic-durability, not snapshot-isolated) apply
  * window can see a lag but never a wrong row.
  */
final class IndexedPot(spark: SparkSession, root: String, name: String) {
  import spark.implicits._

  private val dataName = s"$name-data"
  private val idxName = s"$name-idx"

  def dataPot: PotTable = PotTable(spark, root, dataName)
  def idxPot: PotTable = PotTable(spark, root, idxName)

  /** Upsert `docs` (columns: `key`, `fval`, payload…) into the primary and
    * refresh every affected posting in one atomic cross-pot txn.
    */
  def upsert(docs: DataFrame): Long = {
    val dataCols = docs.columns.map(col).toSeq
    val cur =
      if (dataPot.generation == 0L) None
      else Some(dataPot.get().select(dataCols: _*))
    val affected: Seq[String] = {
      val newVals = docs.select($"fval")
      val oldVals = cur match {
        case None => newVals.limit(0)
        case Some(c) => c.join(docs.select($"key"), Seq("key"), "left_semi")
          .select($"fval")
      }
      newVals.unionByName(oldVals).distinct()
        .collect().map(_.getString(0)).toSeq
    }
    val after = cur match {
      case None => docs
      case Some(c) =>
        c.join(docs.select($"key"), Seq("key"), "left_anti")
          .unionByName(docs)
    }
    val postings = after
      .filter($"fval".isin(affected: _*))
      .groupBy($"fval")
      .agg(sort_array(collect_set($"key")).as("keys"))
    val emptied = affected.toDF("fval")
      .join(postings.select($"fval"), Seq("fval"), "left_anti")
      .withColumn("keys", array().cast("array<string>"))
    val idxBatch = postings.unionByName(emptied)
      .withColumnRenamed("fval", "key")
    new PotTxn(spark, root)
      .commitAll(Seq(dataName -> docs, idxName -> idxBatch))
  }

  /** Query by field value: posting point read → key fetch → re-check. */
  def lookup(v: String): DataFrame = {
    val keys = idxPot.get().filter($"key" === v)
      .select(explode($"keys").as("key"))
    dataPot.get()
      .join(broadcast(keys), Seq("key"), "left_semi")
      .filter($"fval" === v)
  }
}
