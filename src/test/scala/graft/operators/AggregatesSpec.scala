package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Correctness evidence for the no-oracle aggregate: b_agg3's
  * approx_count_distinct (HLL++) must land within its declared relative
  * standard deviation of the exact distinct counts.
  */
class AggregatesSpec extends SparkSpec {

  test("b_agg3: approx_count_distinct is within rsd bounds of exact counts") {
    val li = Tables.t(spark, sf001, "lineitem")
    val rsd = 0.01
    val rows = li.groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), rsd).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      // 5 sigma of the declared rsd — deterministic for a fixed input,
      // generous enough to never flake
      val tol = 5 * rsd * exact
      assert(math.abs(approx - exact) <= tol,
        s"${r.getString(0)}: approx $approx vs exact $exact exceeds ±$tol")
    }
  }

  test("approx_count_distinct is deterministic for a fixed input") {
    val li = Tables.t(spark, sf001, "lineitem")
    def run() = li.agg(approx_count_distinct(col("l_partkey"), 0.01)).head.getLong(0)
    assert(run() === run())
  }

  test("b_agg10: HLL partial states merge to the whole-pass sketch (uniqState/uniqMerge)") {
    val li = Tables.t(spark, sf001, "lineitem")
    val whole = li
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("e"))
      .head.getLong(0)
    val merged = li
      .withColumn("bucket", pmod(col("l_orderkey"), lit(16)))
      .groupBy("bucket").agg(hll_sketch_agg(col("l_partkey")).as("state"))
      .agg(hll_sketch_estimate(hll_union_agg(col("state"))).as("e"))
      .head.getLong(0)
    // DataSketches HLL promotes small sketches through coupon lists, so
    // partial-then-union is statistically (not bit-) identical to one
    // pass: both must land within the sketch's error bound of exact
    val exact = li.select(countDistinct(col("l_partkey"))).head.getLong(0).toDouble
    assert(math.abs(merged - whole) / exact < 0.05, s"merged $merged vs whole $whole")
    assert(math.abs(merged - exact) / exact < 0.05, s"merged $merged vs exact $exact")
    assert(math.abs(whole - exact) / exact < 0.05, s"whole $whole vs exact $exact")
  }
}
