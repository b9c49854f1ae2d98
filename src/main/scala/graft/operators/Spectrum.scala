package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running totals over a value spectrum — the two-phase
  * prefix-sum that replaces `Window.orderBy(v)` with NO partition spec
  * (Spark executes that as ONE task holding the whole ordered input: the
  * classic quiet scale-killer behind "No Partition Defined for Window"
  * warnings; reference CH computes cumulative spectra inside its
  * sorted-aggregation core instead).
  *
  * Shape: range-partition by the order column (a global sort boundary,
  * same shuffle a global window needs anyway), cumulative-sum WITHIN each
  * range in parallel, then add each partition's starting offset — the
  * offsets come from a #partitions-sized frame (bounded, broadcast).
  * Results are bit-identical to the single-task global window; wall-clock
  * parallelism is #partitions instead of 1.
  */
object Spectrum {

  /** Add `outCol` = running (inclusive) sum of `sumCol` in `orderCol`
    * order, optionally per `partCols` group. `(partCols, orderCol)`
    * should be distinct across rows (a spectrum: one row per value) so
    * range boundaries can't split ties.
    *
    * Float note: reordering double addition is only safe when the
    * summands are integer-valued (counts cast to double — exact in IEEE
    * up to 2^53); true fractional weights could drift a ulp vs the
    * sequential window. Every call site here sums counts/quantities.
    */
  /** Multi-column form: each `(sumCol, outCol)` pair gets its running
    * sum from the SAME single range shuffle and offsets pass. */
  def withRunningSums(
      df: DataFrame,
      partCols: Seq[String],
      orderCol: String,
      sums: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val pc = partCols.map(col)
    // both the offsets pass and the final pass hang off the SAME
    // repartitionByRange subtree: Spark's ReuseExchange computes the
    // range shuffle once and both branches read identical partition ids
    // from it (RangePartitioner sampling is seed-deterministic, and an
    // explicit numPartitions keeps AQE from re-coalescing either read)
    val ranged = df.repartitionByRange(n, pc :+ col(orderCol): _*)
    val withPid = ranged.withColumn("__pid", spark_partition_id())
    // #partitions × #groups-crossing rows — the only narrow window left
    val offW =
      (if (partCols.isEmpty) Window.orderBy(col("__pid"))
       else Window.partitionBy(pc: _*).orderBy(col("__pid")))
        .rowsBetween(Window.unboundedPreceding, -1)
    val psums = sums.map { case (s, _) => sum(col(s)).as(s"__psum_$s") }
    val offsets = withPid.groupBy(col("__pid") +: pc: _*)
      .agg(psums.head, psums.tail: _*)
      .select(
        (col("__pid") +: pc) ++ sums.map { case (s, _) =>
          coalesce(sum(col(s"__psum_$s")).over(offW), lit(0)).as(s"__off_$s")
        }: _*)
    val inPart = Window.partitionBy(col("__pid") +: pc: _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    sums.foldLeft(withPid.join(broadcast(offsets), "__pid" +: partCols)) {
      case (acc, (s, out)) =>
        acc.withColumn(out, col(s"__off_$s") + sum(col(s)).over(inPart))
    }.drop("__pid" +: sums.map { case (s, _) => s"__off_$s" }: _*)
  }

  def withRunningSum(
      df: DataFrame, partCols: Seq[String], orderCol: String,
      sumCol: String, outCol: String): DataFrame =
    withRunningSums(df, partCols, orderCol, Seq(sumCol -> outCol))

  def withRunningSum(
      df: DataFrame, orderCol: String, sumCol: String, outCol: String): DataFrame =
    withRunningSums(df, Nil, orderCol, Seq(sumCol -> outCol))
}
