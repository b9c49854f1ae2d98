package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** B-STR1/4/6: the SAME transforms declared (and oracle-checked) in batch
  * by [[StreamingBatch]] driven through real StreamingQueries — a
  * file-source `readStream` (B-STR1), live watermark late-data eviction
  * (B-STR4), and a progress listener (B-STR6/A17).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("B-STR1/6: file readStream through the shared tumbling transform matches batch, with progress events") {
    // the file source consumes a directory; stage the single-file fixture
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-events")
    dir.toFile.deleteOnExit()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("part-0.parquet"))
    val path = dir.toString
    val listener = new Streams.ProgressCapture
    spark.streams.addListener(listener)
    try {
      val q = Streams.tumbling(Streams.eventsStream(spark, path))
        .writeStream
        .format("memory")
        .queryName("tumbling_stream")
        .outputMode("complete")
        .start()
      q.processAllAvailable()
      q.stop()

      val streamed = spark.table("tumbling_stream")
        .orderBy("wstart", "event_type")
        .collect().map(_.toSeq).toSeq
      val batch = Streams.tumbling(Tables.t(spark, sf0001, "events"))
        .orderBy("wstart", "event_type")
        .collect().map(_.toSeq).toSeq
      assert(streamed.nonEmpty)
      assert(streamed === batch)
      assert(listener.totalInputRows > 0, "B-STR6: listener saw no input rows")
      assert(listener.progresses.nonEmpty)
    } finally spark.streams.removeListener(listener)
  }

  test("B-STR4: watermark evicts closed windows and drops late rows") {
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = Streams.tumbling(events)
      .writeStream
      .format("memory")
      .queryName("watermark_stream")
      .outputMode("update")
      .start()
    try {
      // window [10:00, 11:00) gets two rows
      input.addData((ts("2024-01-01 10:00:00"), "click", 1.0), (ts("2024-01-01 10:30:00"), "click", 2.0))
      q.processAllAvailable()
      // advance event time to 12:30 → watermark 11:30 > window end 11:00,
      // so the 10:00 window's state is evicted
      input.addData((ts("2024-01-01 12:30:00"), "click", 4.0))
      q.processAllAvailable()
      // a late row inside the evicted window must be DROPPED
      input.addData((ts("2024-01-01 10:15:00"), "click", 100.0))
      q.processAllAvailable()
      q.stop()

      val w10 = spark.table("watermark_stream")
        .filter(col("wstart") === ts("2024-01-01 10:00:00").getTime / 1000)
        .collect()
      assert(w10.nonEmpty)
      // no emission for the 10:00 window ever includes the late row
      assert(w10.map(_.getLong(2)).max === 2L, "late row leaked past the watermark")
      assert(w10.map(_.getDouble(3)).max === 3.0)
    } finally if (q.isActive) q.stop()
  }

  test("streaming insert: micro-batches flow through the connector write path") {
    val srv = new graft.connector.StubCHServer
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    try {
      val input = MemoryStream[(Long, String)]
      val q = Streams.writeToConnector(
        input.toDF().toDF("id", "v"), srv.url, "stream_sink", ckpt)
      try {
        input.addData((1L, "a"), (2L, "b"))
        q.processAllAvailable()
        input.addData((3L, "c"))
        q.processAllAvailable()
      } finally q.stop()
      assert(srv.rowCount("stream_sink") === 3)
      val back = spark.read.format("graft-ch")
        .option("url", srv.url).option("table", "stream_sink").load()
        .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(back === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally srv.stop()
  }

  test("stateful sessionization: closes on gap, emits on event-time timeout, matches the batch query") {
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")
    val gapUs = 300000000L // 5 minutes, same as b_str7_sessionize
    val q = Streams.statefulSessions(events, gapUs, "1 minute")
      .writeStream
      .format("memory")
      .queryName("session_state_stream")
      .outputMode("append")
      .start()
    try {
      // session 1 for user 1: two events 1 min apart
      input.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:01:00"), 1L))
      q.processAllAvailable()
      // 20 min later: past the gap → closes session 1, opens session 2
      input.addData((ts("2024-01-01 10:21:00"), 1L))
      q.processAllAvailable()
      // far-future event for another user pushes the watermark past
      // session 2's horizon → its EventTimeTimeout fires
      input.addData((ts("2024-01-01 12:00:00"), 2L))
      q.processAllAvailable()
      q.stop()

      val got = spark.table("session_state_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .filter(_._1 == 1L).sortBy(_._2)
      def us(s: String) = ts(s).getTime * 1000L
      assert(got === Seq(
        (1L, us("2024-01-01 10:00:00"), us("2024-01-01 10:01:00"), 2L),
        (1L, us("2024-01-01 10:21:00"), us("2024-01-01 10:21:00"), 1L)))

      // batch anchor: the same events through the b_str7 gaps-and-islands
      // rewrite produce identical sessions for user 1
      val batchDf = Seq(
        (ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:01:00"), 1L),
        (ts("2024-01-01 10:21:00"), 1L), (ts("2024-01-01 12:00:00"), 2L))
        .toDF("ts", "user_id")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("us")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val batch = batchDf
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        .withColumn("new_sess",
          when(lag(col("us"), 1).over(w).isNull
            || col("us") - lag(col("us"), 1).over(w) > gapUs, 1).otherwise(0))
        .withColumn("sid", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("us")).as("s"), max(col("us")).as("e"), count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
        .filter(_._1 == 1L).sortBy(_._2)
      assert(batch === got)
    } finally if (q.isActive) q.stop()
  }

  test("rate source streams a gapless number sequence (system.numbers analog)") {
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").load()
      .select(col("value"))
      .writeStream.format("memory").queryName("rate_numbers")
      .outputMode("append").start()
    try {
      var tries = 0
      while (spark.table("rate_numbers").count() < 50 && tries < 100) {
        Thread.sleep(200); tries += 1
      }
      q.stop()
      val vals = spark.table("rate_numbers").collect().map(_.getLong(0)).sorted
      assert(vals.length >= 50, s"only ${vals.length} rows arrived")
      assert(vals.head === 0L)
      assert(vals.toSeq === (vals.head to vals.last).toSeq, "gaps in the sequence")
    } finally if (q.isActive) q.stop()
  }

  test("maxFilesPerTrigger paces a backfill into bounded micro-batches") {
    // three staged files; one file per trigger -> at least 3 batches,
    // each bounded — the knob that keeps a 100-TB backfill from loading
    // the whole directory into batch 0
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-paced")
    dir.toFile.deleteOnExit()
    val ev = Tables.t(spark, sf0001, "events").limit(300)
    ev.where(col("event_id") % 3 === 0).write.parquet(dir.resolve("f0").toString)
    ev.where(col("event_id") % 3 === 1).write.parquet(dir.resolve("f1").toString)
    ev.where(col("event_id") % 3 === 2).write.parquet(dir.resolve("f2").toString)
    val schema = spark.read.parquet(dir.resolve("f0").toString).schema
    val listener = new Streams.ProgressCapture
    spark.streams.addListener(listener)
    try {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(dir.toString)
        .groupBy(col("event_type")).count()
        .writeStream.format("memory").queryName("paced_stream")
        .outputMode("complete")
        .start()
      q.processAllAvailable()
      q.stop()
      val withRows = listener.progresses.count(_.inputRows > 0)
      assert(withRows >= 3, s"expected >=3 paced batches, saw $withRows")
      val total = spark.table("paced_stream")
        .agg(sum(col("count"))).head.getLong(0)
      assert(total === ev.count())
    } finally spark.streams.removeListener(listener)
  }

  test("stream-static join enriches micro-batches from the broadcast dim") {
    val ev = MemoryStream[(Long, Long)]
    val dim = Tables.t(spark, sf001, "nation").select(
      col("n_nationkey").as("nk"), col("n_name"))
    val q = Streams.streamStaticEnrich(ev.toDF().toDF("nk", "event_id"), dim, "nk")
      .writeStream.format("memory").queryName("ss_enrich").outputMode("append")
      .start()
    try {
      ev.addData((0L, 1L), (3L, 2L))
      q.processAllAvailable()
      ev.addData((0L, 3L)) // second batch re-plans the same static dim
      q.processAllAvailable()
      val rows = spark.table("ss_enrich")
        .collect().map(r => (r.getLong(1), r.getString(2))).toSet
      assert(rows.size === 3)
      assert(rows.map(_._2).forall(_.nonEmpty))
      assert(rows.groupBy(_._1).forall(_._2.size == 1), "dup enrichment")
    } finally if (q.isActive) q.stop()
  }

  test("stream-stream interval join attributes purchases to clicks within the gap") {
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val q = Streams.intervalJoin(
      clicks.toDF().toDF("cuser", "click_id", "cts"),
      purchases.toDF().toDF("puser", "purchase_id", "pts"),
      maxGap = "10 minutes", wmDelay = "5 minutes")
      .writeStream.format("memory").queryName("ij_stream").outputMode("append")
      .start()
    try {
      clicks.addData((1L, 100L, ts("2024-01-01 10:00:00")), (2L, 101L, ts("2024-01-01 10:00:00")))
      purchases.addData(
        (1L, 200L, ts("2024-01-01 10:05:00")), // within gap → joins
        (2L, 201L, ts("2024-01-01 10:20:00")), // past the 10-min gap → no join
        (1L, 202L, ts("2024-01-01 09:59:00"))) // before the click → no join
      q.processAllAvailable()
      // push both watermarks forward so joined results flush in append mode
      clicks.addData((9L, 900L, ts("2024-01-01 12:00:00")))
      purchases.addData((9L, 901L, ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("ij_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(rows.filter(_._1 != 9L) === Set((1L, 100L, 200L, 300000000L)))
    } finally if (q.isActive) q.stop()
  }

  test("B-STR5: dropDuplicatesWithinWatermark dedups within the watermark delay") {
    val input = MemoryStream[(Timestamp, Long, String)]
    val events = input.toDF().toDF("ts", "user_id", "event_type")
    val q = Streams.dedupWithinWatermark(events, "10 minutes")
      .writeStream
      .format("memory")
      .queryName("dedup_stream")
      .outputMode("append")
      .start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, "click"),
        (ts("2024-01-01 10:00:30"), 1L, "click"), // dup within watermark
        (ts("2024-01-01 10:01:00"), 2L, "view"))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("dedup_stream")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows === Set((1L, "click"), (2L, "view")))
    } finally if (q.isActive) q.stop()
  }
}
