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
    // the data-sized window must carry a partition spec; only the
    // #partitions-sized offsets frame may sort globally
    val dataWindows = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(dataWindows.exists(_.contains("__pid")), plan)
  }
}
