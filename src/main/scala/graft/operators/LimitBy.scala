package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k (SURVEY.md §2.2 B-TOPK1; ClickHouse `LIMIT n BY expr`
  * reaches the reference only as passthrough SQL, `src/client.rs:643`).
  *
  * Implemented as rank-over-window + filter. Catalyst plans this as one
  * shuffle on the group keys followed by a per-partition sort — with AQE
  * skew handling this is the scalable form of per-group top-k (no
  * driver-side collection, no cross product).
  */
object LimitBy {

  /** Keep the first `k` rows of each group under `orderCols`. The caller
    * must make `orderCols` a total order (add a unique tiebreaker) if
    * deterministic output is required.
    */
  def limitBy(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame = {
    val rn = "__limitby_rn"
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .drop(rn)
  }
}
