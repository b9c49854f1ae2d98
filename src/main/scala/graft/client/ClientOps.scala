package graft.client

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.limits.{Limited, QueryLimits, QueryStats}

/** Row-oriented client conveniences (SURVEY.md §2.1 A10/A21; reference:
  * `query_rows` `clickhouse-arrow/src/client.rs:1923`, `query_column`
  * `:2028`, `query_one` `:2149`, transposition `arrow/utils.rs:83-118`;
  * cancel/ping `client/writer.rs:193-212`, `health_check` `client.rs:345`).
  *
  * Every driver-materializing surface is capped through [[Limited]]
  * (A11) BY DEFAULT — the SURVEY §7.3 100-TB rule that `collect`-style
  * APIs must never be unbounded.
  */
object ClientOps {

  val DefaultMaxRows = 100000L

  /** `query_rows`: materialize rows on the driver, capped. */
  def queryRows(df: DataFrame, limits: QueryLimits = QueryLimits(maxRows = Some(DefaultMaxRows)))
      : (Array[Row], QueryStats) = {
    val (limited, stats) = Limited(df, limits)
    (limited.collect(), stats)
  }

  /** `query_column`: one column as a typed array, capped. */
  def queryColumn[T](df: DataFrame, column: String,
      limits: QueryLimits = QueryLimits(maxRows = Some(DefaultMaxRows))): (Seq[T], QueryStats) = {
    val (limited, stats) = Limited(df.select(column), limits)
    (limited.collect().toSeq.map(_.getAs[T](0)), stats)
  }

  /** `query_one`: exactly the first value of the first row, or None. */
  def queryOne[T](df: DataFrame): Option[T] =
    df.limit(1).collect().headOption.map(_.getAs[T](0))

  /** A21 health check: the scheduler answers a trivial distributed job
    * (reference pings the server). */
  def healthCheck(spark: SparkSession): Boolean =
    try spark.range(1).count() == 1L
    catch { case _: Exception => false }

  /** A21 cancel: abort every job in the given group (reference sends
    * packet id 3 `Cancel`). Pair with
    * `spark.sparkContext.setJobGroup(group, desc)` around query runs. */
  def cancel(spark: SparkSession, group: String): Unit =
    spark.sparkContext.cancelJobGroup(group)
}
