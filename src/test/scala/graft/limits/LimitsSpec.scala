package graft.limits

import graft.SparkSpec

class LimitsSpec extends SparkSpec {
  import spark.implicits._

  private def df100 = spark.range(100).toDF("id")

  test("no limits → passthrough, not truncated") {
    val (out, stats) = Limited(df100, QueryLimits())
    assert(out.count() === 100)
    assert(!stats.truncated)
  }

  test("row limit truncates and reports reason") {
    val (out, stats) = Limited(df100, QueryLimits(maxRows = Some(10)))
    assert(out.count() === 10)
    assert(stats.truncated)
    assert(stats.reason === "max_rows")
    assert(stats.returnedRows === 10)
  }

  test("row limit above input size does not report truncation") {
    val (out, stats) = Limited(df100, QueryLimits(maxRows = Some(1000)))
    assert(out.count() === 100)
    assert(!stats.truncated)
  }

  test("byte budget translates to a row cap from schema width") {
    val width = df100.schema.map(_.dataType.defaultSize).sum // 8 bytes/row
    val (out, stats) = Limited(df100, QueryLimits(maxEstimatedBytes = Some(width * 20L)))
    assert(out.count() === 20)
    assert(stats.truncated)
    assert(stats.reason === "max_bytes")
  }
}
