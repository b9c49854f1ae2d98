package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Structured-Streaming surface (SURVEY.md §2.2 B-STR1/4/6; the reference
  * streams result blocks with Progress events —
  * `clickhouse-arrow/src/client/response.rs:45`,
  * `src/native/progress.rs:6-14`).
  *
  * The event-time transforms are defined ONCE here and shared by both
  * execution modes: [[StreamingBatch]] declares them as oracle-checked
  * batch queries (`withWatermark` is a no-op in batch), and StreamingSpec
  * drives the exact same transforms through a file-source `readStream`
  * with live watermarks and a progress listener.
  */
object Streams {

  /** B-STR1: incremental consumption of the events table as a file-source
    * stream. Schema comes from a batch probe of the same path (a stream
    * source cannot infer), with the same ns → µs timestamp normalization
    * as `Tables.t`.
    */
  def eventsStream(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.parquet(path).schema
    spark.readStream
      .schema(raw)
      .parquet(path)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** B-STR2 + B-STR4: tumbling 1-hour event-time window with a 1-hour
    * watermark. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
      .select(
        unix_timestamp(col("window.start")).as("wstart"),
        col("event_type"), col("n"), col("sv"))

  /** B-STR2: sliding 1-hour window, 30-minute slide. */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
      .select(unix_timestamp(col("window.start")).as("wstart"), col("n"), col("sv"))

  /** B-STR3: 5-minute-gap session windows per user. */
  def session(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
      .select(
        col("user_id"),
        unix_timestamp(col("session_window.start")).as("sess_start"),
        col("n"), col("sv"))

  /** B-STR5: stateful dedup on (user_id, event_type). In streaming mode
    * use [[dedupWithinWatermark]] so state is bounded. */
  def dedup(events: DataFrame): DataFrame =
    events.select("user_id", "event_type").dropDuplicates("user_id", "event_type")

  /** B-STR5 streaming form: state expires once the watermark passes. */
  def dedupWithinWatermark(events: DataFrame, delay: String): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select("user_id", "event_type")

  /** Streaming insert through the connector (the reference's streaming
    * insert loop, `src/client.rs:542` `insert_many`, as a Structured
    * Streaming sink): every micro-batch ships as one Arrow-IPC insert per
    * partition via `foreachBatch` — the micro-batching IS the deferred
    * flush. Returns the started query; caller stops it.
    */
  def writeToConnector(
      stream: DataFrame, url: String, table: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.format("graft-ch")
          .option("url", url).option("table", table)
          .mode("append").save()
      }
      .start()

  /** B-STR6 / A17: progress capture, the Spark mirror of the reference's
    * `Progress{read_rows, read_bytes, total_rows}` broadcast channel
    * (`src/native/progress.rs:6-14`, event bus `src/client.rs:80-93`).
    * Register with `spark.streams.addListener`.
    */
  final class ProgressCapture extends StreamingQueryListener {
    import scala.jdk.CollectionConverters._
    final case class Progress(batchId: Long, inputRows: Long, sink: String)
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[Progress]()

    def progresses: Seq[Progress] = buf.iterator().asScala.toSeq
    def totalInputRows: Long = progresses.map(_.inputRows).sum

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      buf.add(Progress(e.progress.batchId, e.progress.numInputRows, e.progress.sink.description))
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }
}
