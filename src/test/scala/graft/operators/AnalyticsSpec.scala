package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def level(steps: Array[Array[Long]], w: Long): Int =
    Analytics.FunnelKernel.level(steps, w)

  test("funnel kernel: exact level semantics") {
    // no step-1 event -> 0 even when later steps exist
    assert(level(Array(Array[Long](), Array(5L)), 100L) === 0)
    // only step 1
    assert(level(Array(Array(1L), Array[Long]()), 100L) === 1)
    // full chain inside window
    assert(level(Array(Array(1L), Array(2L), Array(3L)), 10L) === 3)
    // chain breaks the window anchored at the chain START
    assert(level(Array(Array(1L), Array(5L), Array(20L)), 10L) === 2)
    // a LATER chain start rescues the full chain
    assert(level(Array(Array(1L, 14L), Array(5L, 15L), Array(20L)), 10L) === 3)
    // strictly increasing: equal timestamps do not advance
    assert(level(Array(Array(7L), Array(7L)), 10L) === 1)
    // greedy earliest-next: taking the early step-2 must not block step-3
    assert(level(Array(Array(0L), Array(2L, 4L), Array(3L)), 10L) === 3)
    // unbounded window (sequenceMatch mode) never overflows
    assert(level(Array(Array(Long.MaxValue - 5), Array(Long.MaxValue - 1)), Long.MaxValue) === 2)
  }

  test("windowFunnel over a DataFrame groups per user and prunes non-step events") {
    val ev = Seq(
      (1L, 1000L, "view"), (1L, 2000L, "click"), (1L, 3000L, "purchase"),
      (2L, 1000L, "view"), (2L, 2000L, "error"), // error is not a step
      (3L, 1000L, "click") // no chain start
    ).toDF("user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros($"us"))
    val out = Analytics.windowFunnel(ev, Seq("view", "click", "purchase"), 1000000L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(1L -> 3, 2L -> 1, 3L -> 0))
  }

  test("strict_dedup kernel: a re-fired matched step interrupts the chain") {
    def lvl(evs: Seq[(Long, Int)], w: Long = 1000L): Int = {
      val sorted = evs.sortBy(e => (e._1, e._2))
      Analytics.StrictDedupKernel.level(
        sorted.map(_._1).toArray, sorted.map(_._2).toArray, 3, w)
    }
    // clean chain completes
    assert(lvl(Seq((1L, 0), (2L, 1), (3L, 2))) === 3)
    // step-0 re-fires between step 1 and step 2 -> interrupted at 2
    assert(lvl(Seq((1L, 0), (2L, 1), (3L, 0), (4L, 2))) === 2)
    // step-1 re-fires before step 2 -> interrupted at 2
    assert(lvl(Seq((1L, 0), (2L, 1), (3L, 1), (4L, 2))) === 2)
    // a LATER clean start still rescues the full chain
    assert(lvl(Seq((1L, 0), (2L, 1), (3L, 0), (4L, 1), (5L, 2))) === 3)
    // window still bounds the chain
    assert(lvl(Seq((1L, 0), (2L, 1), (5000L, 2))) === 2)
    // no step-0 -> 0
    assert(lvl(Seq((1L, 1), (2L, 2))) === 0)
  }

  test("LTTB kernel: pass-through below threshold, endpoints always kept") {
    val ts = Array.tabulate(5)(_.toDouble)
    val vs = Array(1.0, 2.0, 3.0, 4.0, 5.0)
    // n <= threshold -> identity
    assert(Analytics.LttbKernel.select(ts, vs, 20).toSeq === (0 until 5))
    // downsample keeps first and last and is strictly increasing
    val big = Array.tabulate(100)(_.toDouble)
    val bvs = big.map(t => math.sin(t / 7))
    val keep = Analytics.LttbKernel.select(big, bvs, 10)
    assert(keep.length === 10)
    assert(keep.head === 0 && keep.last === 99)
    assert(keep.toSeq === keep.toSeq.sorted && keep.distinct.length === 10)
  }

  test("LTTB kernel: a lone spike on a flat series is retained") {
    val n = 90
    val ts = Array.tabulate(n)(_.toDouble)
    val vs = Array.fill(n)(1.0)
    vs(47) = 100.0 // the only feature in its bucket
    val keep = Analytics.LttbKernel.select(ts, vs, 12)
    assert(keep.contains(47), s"spike index 47 not in ${keep.toSeq}")
  }
}
