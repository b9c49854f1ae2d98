package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left AS-OF join (SURVEY.md §2.2 B-JN7; ClickHouse `ASOF JOIN` is
  * delegated by the reference through `src/client.rs:643` query passthrough).
  *
  * Spark has no built-in as-of join, and the naive formulation
  * (`left JOIN right ON key = key AND rts <= lts` + max-per-row) explodes
  * into a range join. This implementation is the scalable union-window
  * form: one shuffle on the key, one sort per partition — the same data
  * movement a sort-merge join would need, so it holds at 100 TB:
  *
  *   union(left tagged 1, right tagged 0)
  *     → window per key ordered by (ts, tag): last non-null right value
  *     → keep left rows.
  *
  * A right row at exactly the same timestamp as a left row IS matched
  * (tag 0 sorts first), mirroring ClickHouse/DuckDB `ON l.ts >= r.ts`.
  */
object AsOfJoin {

  /** @param keys      equi-join key columns (present in both inputs)
    * @param leftTs    left event-time column
    * @param rightTs   right event-time column
    * @param rightCols right payload columns to carry (renamed as-is onto
    *                  the output; must not collide with left columns)
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String]): DataFrame = {
    val ord = "__asof_ord"
    val ts = "__asof_ts"
    val leftCols = left.columns.toSeq

    // Project both sides onto the union schema: leftCols ++ rightCols ++ (ord, ts).
    val lPart = left.select(
      leftCols.map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        Seq(lit(1).as(ord), col(leftTs).as(ts)): _*)
    val rPart = right.select(
      leftCols.map { c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++
        rightCols.map(col) ++
        Seq(lit(0).as(ord), col(rightTs).as(ts)): _*)
    val unioned = lPart.unionByName(rPart)

    // Deterministic under equal timestamps: right rows first (so they are
    // visible to left rows at the same instant), then stable among
    // themselves via the first payload column.
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(Seq(col(ts).asc, col(ord).asc) ++
        rightCols.headOption.map(col(_).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Carry ONE struct of all payload columns (null for left rows, never
    // null for right rows) rather than each column independently — a
    // legitimately-NULL payload field in the matched right row must stay
    // NULL, not get back-filled from an older right row.
    val pay = "__asof_payload"
    val carried = unioned
      .withColumn(pay,
        when(col(ord) === 0, struct(rightCols.map(col): _*)).otherwise(lit(null)))
      .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
    carried.filter(col(ord) === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"$pay.$c").as(c)): _*)
  }
}
