package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SpectrumSpec extends SparkSpec {
  import spark.implicits._

  test("distributed running sum is bit-identical to the single-task global window") {
    val df = (1 to 997).map(i => (i * 3 % 997, (i % 7 + 1).toLong)).toDF("v", "c")
    val viaGlobal = df
      .withColumn("cum", sum($"c").over(
        Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("v").collect().map(r => (r.getInt(0), r.getLong(2)))
    val viaDistributed = Spectrum.withRunningSum(df, "v", "c", "cum")
      .orderBy("v").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(viaDistributed === viaGlobal)
  }

  test("running sum parallelizes: no single-partition global window in the plan") {
    val df = spark.range(1000).select($"id".as("v"), lit(1L).as("c"))
    val plan = Spectrum.withRunningSum(df, "v", "c", "cum")
      .queryExecution.executedPlan.toString
    // only the #partitions-sized offsets frame may carry a window (it
    // orders by __pid); the data-sized cumulative is a streaming
    // per-partition pass — NO window, NO exchange after the range
    val dataWindows = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(dataWindows.forall(_.contains("__pid")), plan)
    assert(plan.contains("MapPartitions"), plan)
  }

  test("null measures match the global window ACROSS partition boundaries") {
    // a window running sum is NULL until the group prefix holds a
    // non-null measure — and the prefix spans range partitions: rows in
    // LATER partitions whose local measures are all null must still
    // carry the earlier partitions' (non-null) prefix sum, while a
    // group that is all-null up to a point stays null up to that point.
    // 997 distinct v per group over 32 range partitions forces both
    // group×partition shapes.
    val df = (1 to 997).flatMap { v =>
      Seq(
        // group "lead": non-null only in the LOW half — every row in the
        // high-v partitions must still see cum = the low-half total
        ("lead", v, if (v <= 300) Some((v % 7 + 1).toLong) else None),
        // group "lag": null until deep into the spectrum — the leading
        // rows (first partitions entirely) must stay NULL
        ("lag", v, if (v > 700) Some((v % 5 + 1).toLong) else None))
    }.toDF("g", "v", "c")
    def shape(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val viaGlobal = shape(df
      .withColumn("cum", sum($"c").over(
        Window.partitionBy($"g").orderBy($"v")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("g", "v").collect())
    val viaDistributed = shape(
      Spectrum.withRunningSum(df, Seq("g"), "v", "c", "cum")
        .orderBy("g", "v").collect())
    assert(viaDistributed === viaGlobal)
    // the fixture actually exercised both arms: "lead" is non-null on
    // EVERY row (the prefix seeds it before the all-null tail
    // partitions), "lag" stays null for its whole leading stretch
    assert(viaGlobal.forall { case (g, _, c) => g != "lead" || c.isDefined })
    assert(viaGlobal.count { case (g, _, c) => g == "lag" && c.isEmpty } === 700)
  }

  test("walk survives a downstream narrow coalesce (the Verify coalesce(1) write shape)") {
    // a narrow coalesce runs the walk once per PARENT partition inside
    // one task — correct, but the stamped __pid differs from the task's
    // partition id there, so the stage-displacement guard must compare
    // stamps within an invocation, NOT against TaskContext (a
    // TaskContext-based guard false-positived on every Verify dump)
    val df = (1 to 997).map(i => (i * 3 % 997, (i % 7 + 1).toLong)).toDF("v", "c")
    val viaGlobal = df
      .withColumn("cum", sum($"c").over(
        Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("v").collect().map(r => (r.getInt(0), r.getLong(2)))
    val viaCoalesced = Spectrum.withRunningSum(df, "v", "c", "cum")
      .coalesce(1)
      .orderBy("v").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(viaCoalesced === viaGlobal)
  }

  test("grouped fused spectrum (aggregate + walk) is bit-identical to groupBy + global window") {
    // double measures, grouped: the r15 fused path (aggregate riding the
    // range exchange, streaming cumulative) vs the naive reference shape
    val raw = (1 to 2000).map { i =>
      (Seq("a", "b", "c")(i % 3), (i * 7 % 211).toDouble, (i % 5 + 1).toDouble)
    }.toDF("g", "v", "w")
    val viaGlobal = raw.groupBy($"g", $"v").agg(sum($"w").as("cw"))
      .withColumn("cum", sum($"cw").over(
        Window.partitionBy($"g").orderBy($"v")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("g", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val fused = Spectrum.aggregateWithRunningSums(
      raw, Seq("g"), "v", Seq((sum($"w"), "cw")), Seq("cw" -> "cum"))
      .orderBy("g", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(fused === viaGlobal)
  }

  test("fused spectrum keeps ONE data-sized exchange (the range shuffle)") {
    val raw = spark.range(4000)
      .select(($"id" % 3).cast("string").as("g"), ($"id" % 211).as("v"), lit(1L).as("c"))
    val plan = Spectrum.aggregateWithRunningSums(
      raw, Seq("g"), "v", Seq((sum($"c"), "cnt")), Seq("cnt" -> "cum"))
      .queryExecution.executedPlan.toString
    // the aggregate must ride the range exchange: no hash exchange may
    // carry spectrum rows, and spectrum rows are the only ones keyed by
    // the order column — so no hashpartitioning may mention v. (The
    // offsets branch keeps its bounded exchanges: groups on __pid after
    // map-side partials, and the #partitions × #groups window on g.)
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.forall(l => !l.contains("(v#") && !l.contains(" v#")),
      s"a spectrum-sized hash exchange crept back in:\n$plan")
    assert(plan.contains("rangepartitioning"), plan)
  }
}
