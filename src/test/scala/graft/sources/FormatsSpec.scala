package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class FormatsSpec extends SparkSpec {

  private def tmp(tag: String): java.io.File = {
    val f = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft-spec-$tag-${System.nanoTime()}")
    f.deleteOnExit()
    f
  }

  test("partitioned write prunes non-matching partitions at planning time") {
    val dir = tmp("partby").toString
    Tables.t(spark, sf001, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)

    val pruned = spark.read.parquet(dir).where(col("o_year") === 1995)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("(o_year#") || plan.contains("o_year = 1995") ||
      plan.replaceAll("#\\d+", "").contains("(o_year = 1995)"), plan)

    // the pruned scan must read strictly fewer files than the full scan
    // collect() (not count()) so the metrics land on THIS plan, not a
    // fresh aggregate plan
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().map(_.metrics
        .get("numFiles").map(_.value).getOrElse(0L)).sum
    }
    val full = filesRead(spark.read.parquet(dir))
    val part = filesRead(spark.read.parquet(dir).where(col("o_year") === 1995))
    assert(part > 0 && part < full, s"pruned=$part full=$full")
  }

  test("compression codec option takes effect: zstd smaller than uncompressed") {
    val base = tmp("codec")
    val none = new java.io.File(base, "none").toString
    val zstd = new java.io.File(base, "zstd").toString
    val src = Tables.t(spark, sf001, "lineitem").coalesce(1)
    src.write.mode("overwrite").option("compression", "none").parquet(none)
    src.write.mode("overwrite").option("compression", "zstd").parquet(zstd)
    def bytes(dir: String): Long =
      Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    assert(bytes(zstd) > 0 && bytes(zstd) < bytes(none),
      s"zstd=${bytes(zstd)} none=${bytes(none)}")
    assert(spark.read.parquet(zstd).count() === src.count())
  }

  test("compaction merges 64 shards into the byte-targeted file count, shuffle-free") {
    val base = tmp("compact")
    val small = new java.io.File(base, "small").toString
    val out = new java.io.File(base, "out").toString
    Tables.t(spark, sf001, "supplier").repartition(64)
      .write.mode("overwrite").parquet(small)

    def parquetFiles(dir: String): Int =
      Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(small) === 64)

    val n = Formats.compact(spark, small, out, targetBytes = 1L << 30)
    assert(n === 1) // tiny fixture fits one 1-GiB-target file
    assert(parquetFiles(out) === 1)
    // integrity: row count and a checksum column survive
    val a = spark.read.parquet(small).agg(count(lit(1)), sum("s_suppkey")).collect()(0)
    val b = spark.read.parquet(out).agg(count(lit(1)), sum("s_suppkey")).collect()(0)
    assert(a === b)
  }
}
