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
    * @param direction the ClickHouse ASOF inequality, left-ts vs
    *                  right-ts: ">=" (default; latest right at-or-before),
    *                  ">" (strictly before), "<=" (earliest right
    *                  at-or-after), "<" (strictly after)
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      direction: String = ">="): DataFrame = {
    require(Set(">=", ">", "<=", "<").contains(direction),
      s"asof direction must be one of >=, >, <=, < (got $direction)")
    val backward = direction == ">=" || direction == ">" // match looks to the past
    val inclusive = direction == ">=" || direction == "<="
    val ord = "__asof_ord"
    val ts = "__asof_ts"
    val leftCols = left.columns.toSeq

    // At equal timestamps a right row must sort on the VISIBLE side of the
    // left row: inside the window frame when inclusive, outside when strict.
    val rightOrd = if (backward == inclusive) 0 else 1
    val leftOrd = 1 - rightOrd

    // Project both sides onto the union schema: leftCols ++ rightCols ++ (ord, ts).
    val lPart = left.select(
      leftCols.map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        Seq(lit(leftOrd).as(ord), col(leftTs).as(ts)): _*)
    val rPart = right.select(
      leftCols.map { c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++
        rightCols.map(col) ++
        Seq(lit(rightOrd).as(ord), col(rightTs).as(ts)): _*)
    val unioned = lPart.unionByName(rPart)

    // One shuffle on the key, one sort per partition — the same data
    // movement a sort-merge join needs. Stable among equal-ts right rows
    // via the first payload column.
    val base = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(Seq(col(ts).asc, col(ord).asc) ++
        rightCols.headOption.map(col(_).asc_nulls_first): _*)
    val w =
      if (backward) base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else base.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    // Carry ONE struct of all payload columns (null for left rows, never
    // null for right rows) rather than each column independently — a
    // legitimately-NULL payload field in the matched right row must stay
    // NULL, not get back-filled from another right row.
    val pay = "__asof_payload"
    val carry =
      if (backward) (c: org.apache.spark.sql.Column) => last(c, ignoreNulls = true).over(w)
      else (c: org.apache.spark.sql.Column) => first(c, ignoreNulls = true).over(w)
    val carried = unioned
      .withColumn(pay,
        when(col(ord) === rightOrd, struct(rightCols.map(col): _*)).otherwise(lit(null)))
      .withColumn(pay, carry(col(pay)))
    carried.filter(col(ord) === leftOrd)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"$pay.$c").as(c)): _*)
  }
}
