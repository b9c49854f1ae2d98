package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("leftAsOf picks the latest right row at or before the left timestamp") {
    val left = Seq(
      (1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e0"),
      (2L, 15L, "e3")).toDF("k", "ts", "name")
    val right = Seq(
      (1L, 10L, "p10"), (1L, 18L, "p18"),
      (2L, 16L, "p16")).toDF("k", "ts", "pname")

    val out = AsOfJoin
      .leftAsOf(left, right.withColumnRenamed("ts", "rts"), Seq("k"), "ts", "rts", Seq("pname"))
      .select("name", "pname")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap

    assert(out("e0") === None) // before any right row
    assert(out("e1") === Some("p10")) // equal timestamp matches
    assert(out("e2") === Some("p18")) // latest at-or-before
    assert(out("e3") === None) // right row is strictly later
  }

  test("all four asof directions pick the right neighbor") {
    val left = Seq((1L, 10L, "L")).toDF("k", "ts", "name")
    val right = Seq(
      (1L, 5L, "r5"), (1L, 10L, "r10"), (1L, 15L, "r15")).toDF("k", "rts", "p")
    def run(dir: String): Option[String] =
      Option(AsOfJoin.leftAsOf(left, right, Seq("k"), "ts", "rts", Seq("p"), dir)
        .select("p").head.getString(0))
    assert(run(">=") === Some("r10")) // latest at-or-before
    assert(run(">") === Some("r5")) // latest strictly before
    assert(run("<=") === Some("r10")) // earliest at-or-after
    assert(run("<") === Some("r15")) // earliest strictly after
  }

  test("forward asof finds nothing when all right rows are earlier") {
    val left = Seq((1L, 100L, "L")).toDF("k", "ts", "name")
    val right = Seq((1L, 5L, "r5")).toDF("k", "rts", "p")
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "ts", "rts", Seq("p"), "<")
      .select("p").head
    assert(out.isNullAt(0))
  }

  test("asof query plan shuffles once per side (no range-join explosion)") {
    val df = graft.SparkEntry.queries("b_jn7_asof")(spark, sf0001)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"))
    assert(!physical.contains("BroadcastNestedLoopJoin"))
  }

  test("bucketed asof matches the window form on the events fixture") {
    val e = graft.Tables.t(spark, sf0001, "events").select("event_id", "user_id", "ts")
    val p = graft.Tables.t(spark, sf0001, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("prior"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "prior").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .sortBy(_._1).toSeq
    val reference = canon(AsOfJoin.leftAsOf(
      e, p, Seq("user_id"), "ts", "ts", Seq("prior")))
    // narrow buckets (many empty ones, carries span gaps) and wide
    // buckets (everything lands in one) must both agree exactly
    for (width <- Seq(3600000000L, 86400000000L * 365)) {
      val bucketed = canon(AsOfJoin.leftAsOfBucketed(
        e, p, Seq("user_id"), "ts", "ts", Seq("prior"), width))
      assert(bucketed === reference, s"width=$width")
    }
    // strict direction agrees too (equal-ts rows resolve in-bucket)
    val strictRef = canon(AsOfJoin.leftAsOf(
      e, p, Seq("user_id"), "ts", "ts", Seq("prior"), ">"))
    val strictBkt = canon(AsOfJoin.leftAsOfBucketed(
      e, p, Seq("user_id"), "ts", "ts", Seq("prior"), 3600000000L, ">"))
    assert(strictBkt === strictRef)
  }

  test("bucketed asof keeps exact buckets above 2^53 and below zero") {
    // long event times whose magnitude exceeds double's 53-bit mantissa:
    // a double-routed floor/divide would misplace boundary rows
    val base = 1L << 60
    val left = Seq((1L, base + 1000L), (1L, base + 999L), (1L, base + 993L), (2L, -15L))
      .toDF("k", "ts")
    val right = Seq(
      (1L, base + 1000L, "x"), (1L, base + 999L, "y"), (2L, -17L, "n"))
      .toDF("k", "rts", "p")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("ts", "p").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
        .sortBy(_._1).toSeq
    val reference = canon(AsOfJoin.leftAsOf(
      left, right, Seq("k"), "ts", "rts", Seq("p")))
    // width 7 does not divide base, so bucket boundaries land mid-range
    val bucketed = canon(AsOfJoin.leftAsOfBucketed(
      left, right, Seq("k"), "ts", "rts", Seq("p"), 7L))
    assert(bucketed === reference)
    // base+993 must NOT match the base+999 right row: under a double
    // round-trip all three timestamps collapse to the same value and a
    // spurious "y" appears
    assert(reference === Seq(
      -15L -> "n", (base + 993L) -> null, (base + 999L) -> "y", (base + 1000L) -> "x"))
  }

  test("bucketed asof carries across empty buckets and keeps null payload fields") {
    val left = Seq((1L, 100L, "a"), (1L, 5000L, "b"), (2L, 50L, "c"))
      .toDF("k", "ts", "name")
    val right = Seq(
      (1L, 90L, Some("p90")), (1L, 99L, None: Option[String]))
      .toDF("k", "rts", "p")
    // width 10: left "b" at 5000 is ~490 empty buckets after the last
    // right row — the grid forward-fill must still deliver p=None row
    // (ts 99 wins over 90) with its LEGITIMATELY null payload
    val out = AsOfJoin.leftAsOfBucketed(
      left, right, Seq("k"), "ts", "rts", Seq("p"), 10L)
      .select("name", "p").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("a") === None) // matched right row (ts 99) carries null payload
    assert(out("b") === None) // carried across empty buckets, still the null payload
    assert(out("c") === None) // key 2 has no right rows at all
  }

  test("bucketed asof plan: no global sort, windows bounded by (key, bucket)") {
    val e = graft.Tables.t(spark, sf0001, "events").select("event_id", "user_id", "ts")
    val p = graft.Tables.t(spark, sf0001, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("prior"))
    val df = AsOfJoin.leftAsOfBucketed(
      e, p, Seq("user_id"), "ts", "ts", Seq("prior"), 3600000000L)
    val physical = df.queryExecution.executedPlan.toString
    // a global sort would surface as a range-partitioning exchange
    assert(!physical.contains("rangepartitioning"), physical)
    assert(!physical.contains("CartesianProduct"))
    // the in-bucket window partitions on (user_id, bucket) — the sort
    // that bounded a hot key's straggler task in the plain window form
    assert(physical.contains("__asof_bkt"), physical)
  }
}
