package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Drives the materialized view through real micro-batches: partials
  * appended per batch, then merge-on-read must equal the direct
  * aggregate over everything ingested — the SummingMergeTree contract. */
class MatViewSpec extends SparkSpec {

  test("incremental MV maintenance across micro-batches equals direct aggregation") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = java.nio.file.Files.createTempDirectory("mv_spec").toString
    val mem = MemoryStream[(Long, String, Double)]
    val src = mem.toDF().toDF("user_id", "event_type", "value")

    val q = MatView.maintain(
      src,
      (partials, _) => partials.write.mode("append").parquet(s"$dir/partials"),
      s"$dir/ckpt")

    mem.addData((1L, "click", 1.5), (1L, "click", 2.5), (2L, "view", 1.0))
    q.processAllAvailable()
    mem.addData((1L, "click", 4.0), (2L, "view", -1.0), (3L, "click", 0.25))
    q.processAllAvailable()
    mem.addData((1L, "view", 7.0))
    q.processAllAvailable()
    q.stop()

    // more than one batch actually contributed partials for a key
    val partials = spark.read.parquet(s"$dir/partials")
    assert(partials.where($"user_id" === 1 && $"event_type" === "click").count() >= 2)

    val merged = MatView.mergeOnRead(partials)
      .orderBy("user_id", "event_type")
      .as[(Long, String, Double, Long)].collect().toSeq
    val all = Seq(
      (1L, "click", 1.5), (1L, "click", 2.5), (2L, "view", 1.0),
      (1L, "click", 4.0), (2L, "view", -1.0), (3L, "click", 0.25),
      (1L, "view", 7.0)).toDF("user_id", "event_type", "value")
    val direct = MatView.mergeOnRead(MatView.partials(all))
      .orderBy("user_id", "event_type")
      .as[(Long, String, Double, Long)].collect().toSeq
    assert(merged == direct)
    assert(merged.exists { case (u, t, s, n) => u == 1 && t == "click" && s == 8.0 && n == 3 })
  }
}
