package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k (SURVEY.md §2.2 B-TOPK1; ClickHouse `LIMIT n BY expr`
  * reaches the reference only as passthrough SQL, `src/client.rs:643`).
  *
  * Two-phase: a per-input-partition local top-k (local sort + one JIT'd
  * pass, no shuffle) bounds what the exchange carries to at most
  * k rows per (input partition, group); the global rank-over-window then
  * runs on that reduced set. This keeps low-cardinality group keys scalable
  * — a single group never funnels more than k·numPartitions rows through
  * one window task, vs O(N/groups) for the naive single-phase form.
  */
object LimitBy {

  /** Keep the first `k` rows of each group under `orderCols`. The caller
    * must make `orderCols` a total order (add a unique tiebreaker) if
    * deterministic output is required.
    */
  def limitBy(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame = {
    val gk = "__limitby_gk"
    val withKey = df.withColumn(gk, struct(groupCols: _*))

    // Phase 1: local top-k. Sort within each input partition by (group,
    // order) — no exchange — then keep the first k rows of each group run.
    val locallySorted = withKey.sortWithinPartitions(col(gk) +: orderCols: _*)
    val gkIdx = locallySorted.schema.fieldIndex(gk)
    val local = locallySorted.mapPartitions { it =>
      var current: Any = null
      var seen = 0
      var first = true
      it.filter { row =>
        val key = row.get(gkIdx)
        if (first || key != current) { current = key; seen = 0; first = false }
        seen += 1
        seen <= k
      }
    }(Encoders.row(locallySorted.schema))

    // Phase 2: global top-k over the (<= k * numPartitions per group) rest.
    val rn = "__limitby_rn"
    val w = Window.partitionBy(col(gk)).orderBy(orderCols: _*)
    local.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .drop(rn, gk)
  }
}
