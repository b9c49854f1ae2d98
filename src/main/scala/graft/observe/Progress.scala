package graft.observe

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Batch-query progress/profile event bus (SURVEY.md §2.1 A17; reference:
  * `Progress{read_rows, read_bytes, total_rows}` broadcast per query,
  * `clickhouse-arrow/src/native/progress.rs:6-14`, subscriber channel
  * `src/client.rs:80-93`).
  *
  * Spark-native: a `QueryExecutionListener` extracts the scan/output
  * metrics from each completed query's executed plan and broadcasts a
  * [[Progress]] to subscribers. Streaming queries get the same surface
  * from `Streams.ProgressCapture` (B-STR6).
  */
object Progress {

  final case class QueryProgress(
      funcName: String,
      durationNs: Long,
      readRows: Long,
      outputRows: Long,
      failed: Boolean)

  /** Register on a session; `subscribe` mirrors the reference's
    * `subscribe_events` broadcast channel. */
  final class Bus extends QueryExecutionListener {
    private val subscribers =
      new java.util.concurrent.CopyOnWriteArrayList[QueryProgress => Unit]()
    private val log = new java.util.concurrent.ConcurrentLinkedQueue[QueryProgress]()

    def subscribe(f: QueryProgress => Unit): Unit = subscribers.add(f)
    def events: Seq[QueryProgress] = log.iterator().asScala.toSeq

    private def emit(p: QueryProgress): Unit = {
      log.add(p)
      subscribers.forEach(s => s(p))
    }

    private def metrics(qe: QueryExecution): (Long, Long) = {
      val plan = qe.executedPlan
      val read = plan.collectLeaves()
        .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
      val out = plan.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
      (read, out)
    }

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      val (read, out) = metrics(qe)
      emit(QueryProgress(funcName, durationNs, read, out, failed = false))
    }

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      emit(QueryProgress(funcName, -1L, -1L, -1L, failed = true))
  }

  /** Install a bus on the session (idempotent per bus instance). */
  def install(spark: SparkSession): Bus = {
    val bus = new Bus
    spark.listenerManager.register(bus)
    bus
  }

  /** The captured event log as a queryable DataFrame — the
    * `system.query_log` surface (reference users read the same telemetry
    * from ClickHouse's query_log table). Driver-local rows: the log is
    * bounded by query count, not data size, so `createDataFrame` over it
    * is metadata-scale by construction.
    */
  def queryLog(spark: SparkSession, bus: Bus): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    bus.events
      .map(p => (p.funcName, p.durationNs, p.readRows, p.outputRows, p.failed))
      .toDF("func_name", "duration_ns", "read_rows", "output_rows", "failed")
  }
}
