package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQueryListener}

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
    * source cannot infer), with the same schema-aware ts normalization
    * as `Tables.t` (the fixture has shipped ts as both TIMESTAMP(NANOS)
    * and TIMESTAMP(MICROS) across rounds).
    */
  def eventsStream(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.parquet(path).schema
    graft.Tables.normalizeEventTs(
      spark.readStream
        .schema(raw)
        .parquet(path))
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

  /** Stream-static enrichment join: each micro-batch broadcast-joins the
    * static dimension. No stream-side state and no watermark requirement —
    * the static side is planned per batch (so a dim refresh lands on the
    * next trigger), and the broadcast keeps the stream partitioning
    * untouched: the same zero-fact-shuffle contract as batch dictGet.
    */
  def streamStaticEnrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), key)

  private val wmReplaySeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** B-STR4 under the HARD gate: drives the LIVE streaming engine —
    * `withWatermark` + tumbling window + APPEND mode over a MemoryStream
    * fed a deterministic two-batch schedule — and returns the memory
    * sink's final table for the DuckDB oracle to reproduce.
    *
    * Schedule: rows with `event_id % 3 != 0` arrive in batch 1; the rest
    * arrive in batch 2, i.e. LATE. The engine's observable semantics are
    * then fully deterministic:
    *   wm1 = max(ts in batch 1) - 30 min        (watermark after batch 1)
    *   a batch-2 row is DROPPED iff its window end <= wm1 (closed window)
    *   wm2 = max(all ts) - 30 min               (final watermark)
    *   a window is EMITTED iff its end <= wm2   (append-mode close)
    * which is exactly the replay the oracle runs. Within a batch no row
    * is ever late (the watermark only advances BETWEEN batches), so the
    * result is independent of intra-batch ordering.
    *
    * The collect is the certification harness feeding the stream, not
    * the operator: the transform itself (watermark + windowed agg) holds
    * per-window state only and runs unbounded in production; at 100 TB
    * the feed is Kafka/files, never a driver collect.
    */
  def watermarkReplay(spark: SparkSession, events: DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = {
      import spark.implicits._
      events
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        .as[(Long, java.sql.Timestamp, String, Double)]
        .collect()
    }
    val (late, onTime) = rows.partition(_._1 % 3 == 0)
    // The stateful agg keys on (1h window, event_type) — a handful of
    // state rows — so the session's 32 shuffle partitions would spin up
    // 32 state-store instances per micro-batch for near-empty state.
    // Run the replay in a cloned session (shared SparkContext, private
    // conf/catalog) pinned to 4 partitions: the windowed-agg result is
    // partition-count independent, and the per-store fixed cost is the
    // whole replay's latency at bench scale. (Production streams size
    // this to the real key cardinality instead.)
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    import ss.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val stream = input.toDF().toDF("event_id", "ts", "event_type", "value")
    val agg = stream
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
      .select(
        unix_timestamp(col("window.start")).as("wstart"),
        col("event_type"), col("n"), col("sv"))
    val name = s"wm_replay_${wmReplaySeq.incrementAndGet()}"
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(onTime.toSeq)
      q.processAllAvailable()
      input.addData(late.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // materialize off the transient memory-sink view: the sink's rows
    // are already driver-local and window-count-bounded, so snapshot
    // them directly — a cache() here would leak one cached DataFrame
    // per invocation in library use (nothing ever unpersists it).
    // The snapshot is rebased onto the CALLER's session: the clone (and
    // its catalog entry) is garbage once this returns.
    val snap = ss.table(name)
    val sinkRows = java.util.Arrays.asList(snap.collect(): _*)
    val out = spark.createDataFrame(sinkRows, snap.schema)
    ss.catalog.dropTempView(name)
    out
  }

  /** B-STR1 + B-STR6 under the HARD gate: drives the LIVE file-source
    * streaming engine and returns its PROGRESS TELEMETRY for the oracle
    * to reproduce — the `b_str9` pattern applied to incremental
    * consumption + the progress listener.
    *
    * Schedule: the events rows split on `event_id % 2`; the even half is
    * staged as parquet before the query starts (batch 0), the odd half
    * is staged after the first `processAllAvailable` (batch 1) — so the
    * file source must DISCOVER the new files incrementally (B-STR1) and
    * the [[ProgressCapture]] listener's per-batch `numInputRows`
    * (B-STR6) must equal the exact half-counts DuckDB recomputes from
    * the table. Listener delivery is async, so the harness polls until
    * the captured total reaches the expected row count.
    *
    * The staging writes + collect-free pass-through are the
    * certification harness, not the operator: production points the
    * same `readStream` at an arriving directory/Kafka and reads the
    * same listener. Batch-count-bounded rows cross the driver (one per
    * micro-batch), never data.
    */
  def progressReplay(spark: SparkSession, events: DataFrame): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_str10_")
    val srcDir = tmp.resolve("in").toString
    val half = events.select(col("event_id"), col("value"))
    val even = half.where(pmod(col("event_id"), lit(2)) === 0)
    val odd = half.where(pmod(col("event_id"), lit(2)) =!= 0)
    // the poll target is what was actually STAGED: a NULL event_id lands
    // in neither half (pmod(NULL, 2) is NULL), so polling to
    // events.count() would spin the full deadline on such fixtures
    val evenCount = even.count()
    val oddCount = odd.count()
    // the gate certifies two-stage incremental discovery — a one-parity
    // fixture cannot drive batch 1 and would silently emit one row
    // against the oracle's unconditional two; fail loudly instead
    require(evenCount > 0 && oddCount > 0,
      s"progressReplay needs both event_id parities to stage two batches " +
        s"(even=$evenCount, odd=$oddCount)")
    val expected = evenCount + oddCount
    even.write.mode("append").parquet(srcDir)
    // pass-through plan, no shuffle: the gate is consumption+telemetry
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val capture = new ProgressCapture
    ss.streams.addListener(capture)
    val name = s"progress_replay_${wmReplaySeq.incrementAndGet()}"
    val q = ss.readStream.schema(even.schema).parquet(srcDir)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      odd.write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      val deadline = System.nanoTime() + 30L * 1000L * 1000L * 1000L
      while (capture.totalInputRows < expected && System.nanoTime() < deadline)
        Thread.sleep(25)
    } finally {
      q.stop()
      ss.streams.removeListener(capture)
      // cleanup INSIDE the finally: a failing rep must not leak a full
      // parquet copy of the events table (multi-GB at sf10) per rep
      try ss.catalog.dropTempView(name) catch { case _: Throwable => () }
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }
    val rows = capture.progresses.filter(_.inputRows > 0)
      .map(p => org.apache.spark.sql.Row(p.batchId, p.inputRows))
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("batch_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("input_rows",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Stream-stream interval join: click → purchase attribution within
    * `maxGap` per user. In streaming mode BOTH sides carry watermarks and
    * the join condition is time-bounded, so Spark can expire join state
    * (a stream-stream join without the bound would buffer forever —
    * the 100-TB-stream correctness requirement). Inputs need columns
    * (cuser, click_id, cts) / (puser, purchase_id, pts).
    */
  def intervalJoin(clicks: DataFrame, purchases: DataFrame, maxGap: String,
      wmDelay: String): DataFrame =
    clicks.withWatermark("cts", wmDelay)
      .join(
        purchases.withWatermark("pts", wmDelay),
        expr(s"cuser = puser AND pts > cts AND pts <= cts + interval $maxGap"))
      .select(col("cuser").as("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("pts")) - unix_micros(col("cts"))).as("gap_us"))

  // ---- custom stateful sessionization (flatMapGroupsWithState) ----

  /** One closed session: event times in epoch microseconds. */
  final case class Session(user_id: Long, sess_start: Long, sess_end: Long, n_events: Long)

  /** Open-session state carried between micro-batches. */
  final case class SessState(start: Long, last: Long, n: Long)

  /** Gap-based sessionization with CUSTOM state — the semantics
    * `session_window` can't express incrementally when you need the
    * closed session emitted exactly once with its own schema:
    * `flatMapGroupsWithState` keyed on `user_id` holds one open session
    * per user (constant state per key), closes it when a later event
    * arrives past `gapMicros`, and emits the final open session when the
    * EVENT-TIME timeout fires (watermark passes last + gap). State is
    * bounded: one `SessState` per active user, reclaimed on timeout —
    * the 100-TB-stream path. Batch-mode equivalence (same gap rule) is
    * declared as the oracle-checked `b_str7_sessionize` lag/island query;
    * StreamingSpec asserts both modes produce identical sessions.
    */
  def statefulSessions(events: DataFrame, gapMicros: Long, wmDelay: String): Dataset[Session] = {
    // the watermarked ts column must stay in the projection — the
    // analyzer rejects EventTimeTimeout if it can't see it downstream
    val typed = events
      .withWatermark("ts", wmDelay)
      .select(col("user_id").cast("long"), unix_micros(col("ts")), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)](
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.TIMESTAMP))
    typed.groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[(Long, Long, java.sql.Timestamp)], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(uid, s.start, s.last, s.n))
          } else {
            val times = it.map(_._2).toArray
            java.util.Arrays.sort(times)
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption.orNull
            var i = 0
            while (i < times.length) {
              val t = times(i)
              cur match {
                case null => cur = SessState(t, t, 1)
                case SessState(st, last, n) =>
                  if (t - last > gapMicros) {
                    closed += Session(uid, st, last, n)
                    cur = SessState(t, t, 1)
                  } else cur = SessState(st, math.max(last, t), n + 1)
              }
              i += 1
            }
            if (cur != null) {
              state.update(cur)
              // fire once the watermark passes the session's gap horizon
              state.setTimeoutTimestamp(cur.last / 1000L + gapMicros / 1000L + 1L)
            }
            closed.result().iterator
          }
      }(Encoders.product[SessState], Encoders.product[Session])
  }

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
