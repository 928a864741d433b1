package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Observability parity with the reference's OTel counters
  * (pot_writes/pot_reads/pot_lists/pot_removes + lock-wait histogram,
  * reference server.go:64-87, otel.go:19-98; SURVEY.md §2-A A12).
  *
  * Spark-native form: a QueryExecutionListener classifies each completed
  * query by its plan shape (write command vs read) and counts it; execution
  * wall time accumulates as the latency analogue of pot's lock-wait
  * histogram. Counters are process-local LongAdders — in cluster mode the
  * same listener runs on the driver, where all query completions land, so
  * the design is scale-independent.
  */
final class Metrics extends QueryExecutionListener {
  val reads = new LongAdder
  val writes = new LongAdder
  val failures = new LongAdder
  val totalNanos = new LongAdder

  private def record(qe: QueryExecution, durationNs: Long): Unit = {
    // Command covers both V1 (InsertInto..., CreateTable...) and V2 write
    // plans (AppendData, OverwriteByExpression extend V2WriteCommand)
    val isWrite = qe.analyzed
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Command]
    if (isWrite) writes.increment() else reads.increment()
    totalNanos.add(durationNs)
  }

  override def onSuccess(
      funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    record(qe, durationNs)

  override def onFailure(
      funcName: String, qe: QueryExecution, exception: Exception): Unit =
    failures.increment()

  def snapshot: Map[String, Long] = Map(
    "pot_reads"    -> reads.sum(),
    "pot_writes"   -> writes.sum(),
    "pot_failures" -> failures.sum(),
    "total_ms"     -> totalNanos.sum() / 1000000L)
}

object Metrics {
  /** Install a fresh metrics listener on the session and return it. */
  def install(spark: SparkSession): Metrics = {
    val m = new Metrics
    spark.listenerManager.register(m)
    m
  }
}
