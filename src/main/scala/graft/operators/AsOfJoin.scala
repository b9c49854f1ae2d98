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

  /** Range-bucketed AS-OF join — the 100-TB shape for skewed keys.
    *
    * [[leftAsOf]] sorts each key's ENTIRE history inside one window
    * partition; a hot key (one user with billions of events) becomes a
    * single straggler task. This variant splits every key by a time
    * bucket so no sort exceeds (key, bucket) granularity:
    *
    *  1. in-bucket pass — the same union-window form, but partitioned by
    *     (keys, bucket): bounded partitions, a hot key spreads across
    *     its time range;
    *  2. carry pass — per (key, bucket) the LATEST right payload (one
    *     hash aggregate), forward-filled per key across the bucket GRID
    *     (distinct (key, bucket) pairs from both sides — orders of
    *     magnitude fewer rows than the raw inputs), so every bucket
    *     knows "the latest right row strictly before me";
    *  3. left rows without an in-bucket match take the carry via an
    *     equi-join on (keys, bucket).
    *
    * A right row in an EARLIER bucket is always strictly older than any
    * left timestamp in this bucket, so the carry is valid for both the
    * inclusive (>=) and strict (>) backward directions; equal-timestamp
    * resolution only ever happens inside a bucket, where the in-bucket
    * pass applies the same tag ordering as [[leftAsOf]].
    *
    * Right timestamps must be non-null (ClickHouse ASOF requires the
    * same). Bucket width is in the timestamp's microsecond scale.
    */
  def leftAsOfBucketed(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      bucketWidthMicros: Long,
      direction: String = ">="): DataFrame = {
    require(direction == ">=" || direction == ">",
      s"bucketed asof covers the backward directions >= and > (got $direction)")
    require(bucketWidthMicros > 0, "bucketWidthMicros must be positive")
    val bkt = "__asof_bkt"
    val matchedTs = "__asof_matched_ts"
    val pay = "__asof_carry"
    val prev = "__asof_prev"
    val leftCols = left.columns.toSeq
    // timestamp columns bucket on their microsecond scale; numeric event
    // times bucket on their own unit (the width is then in that unit)
    def bucketOf(df: DataFrame, ts: String) = {
      val base = df.schema(ts).dataType match {
        case org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType => s"unix_micros(`$ts`)"
        case _ => s"cast(`$ts` as bigint)"
      }
      // floored division kept in LONG arithmetic: routing through
      // double loses precision above 2^53 and can put boundary rows in
      // the wrong bucket, breaking the carry-validity invariant. `div`
      // truncates toward zero, so step down by one when the remainder
      // is negative.
      expr(s"(($base) div ${bucketWidthMicros}L) - " +
        s"(CASE WHEN ($base) % ${bucketWidthMicros}L < 0 THEN 1 ELSE 0 END)")
    }

    val left2 = left.withColumn(bkt, bucketOf(left, leftTs))
    // matchedTs doubles as the "found an in-bucket match" marker: a
    // matched right row always has a non-null timestamp, while a null
    // payload FIELD must not be confused with "no match"
    val right2 = right
      .withColumn(bkt, bucketOf(right, rightTs))
      .withColumn(matchedTs, col(rightTs))

    // 1) in-bucket: bounded window partitions (keys + bucket)
    val inBucket = leftAsOf(
      left2, right2, keys :+ bkt, leftTs, rightTs,
      rightCols :+ matchedTs, direction)

    // 2) carry grid: latest right payload per (key, bucket), forward-
    //    filled per key over the DISTINCT bucket grid of both sides
    val gridKeys = (keys :+ bkt).map(col)
    val lastPerBucket = right2.groupBy(gridKeys: _*)
      .agg(max_by(
        struct(rightCols.map(col): _*),
        struct(col(rightTs) +: rightCols.headOption.map(col).toSeq: _*)).as(pay))
    val grid = left2.select(gridKeys: _*).distinct()
      .unionByName(right2.select(gridKeys: _*).distinct()).distinct()
    val wk = Window.partitionBy(keys.map(col): _*).orderBy(col(bkt))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = grid
      .join(lastPerBucket, keys :+ bkt, "left")
      .withColumn(prev, last(col(pay), ignoreNulls = true).over(wk))
      .select(gridKeys :+ col(prev): _*)

    // 3) unmatched left rows take the carry
    inBucket.join(carries, keys :+ bkt, "left")
      .select(leftCols.map(col) ++ rightCols.map(c =>
        when(col(matchedTs).isNotNull, col(c))
          .otherwise(col(s"$prev.$c")).as(c)): _*)
  }
}
