package graft.plans

import graft.SparkSpec

/** Plan-shape pins for [[AsofLateralRule]]: the ASOF/ANY text spellings
  * must never fall into Spark's domain-nested-loop decorrelation (the
  * O(|distinct ts| x |right|) plan that took minutes at sf0.1). */
class AsofLateralRuleSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(sql: String): String = {
    val df = spark.sql(sql)
    df.queryExecution.executedPlan.toString
  }

  test("ASOF JOIN text plans as equi-join + argmax, not a nested loop") {
    graft.Tables.t(spark, sf0001, "events").createOrReplaceTempView("events_alr_v")
    val plan = planOf(
      """SELECT e.event_id, e.user_id, p.event_id AS prior_purchase
        |FROM events_alr_v e
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events_alr_v
        |                WHERE event_type = 'purchase') p
        |ON e.user_id = p.user_id AND e.ts >= p.ts""".stripMargin)
    assert(plan.contains("max_by"), plan.take(2000))
    assert(plan.contains("ch_asof_lid_"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"))
  }

  test("INNER asof (CROSS JOIN LATERAL) is rescued too") {
    Seq((1, 100L), (2, 50L)).toDF("k", "ts").createOrReplaceTempView("alri_l")
    Seq((1, 90L, "a"), (1, 150L, "b")).toDF("k", "rts", "p")
      .createOrReplaceTempView("alri_r")
    val df = spark.sql(
      """SELECT l.k, r.p FROM alri_l l
        |ASOF JOIN alri_r r ON l.k = r.k AND l.ts >= r.rts""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("max_by"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // inner semantics: the unmatched left row (k=2) is dropped
    assert(df.collect().map(r => r.getInt(0) -> r.getString(1)).toSeq === Seq(1 -> "a"))
  }

  test("forward ASOF uses min_by; ANY probe uses first") {
    Seq((1, 100L), (2, 50L)).toDF("k", "ts").createOrReplaceTempView("alr_l")
    Seq((1, 90L, "a"), (1, 150L, "b")).toDF("k", "rts", "p")
      .createOrReplaceTempView("alr_r")
    val fwd = planOf(
      """SELECT l.k, r.p FROM alr_l l
        |ASOF LEFT JOIN alr_r r ON l.k = r.k AND l.ts < r.rts""".stripMargin)
    assert(fwd.contains("min_by"), fwd.take(2000))
    assert(!fwd.contains("BroadcastNestedLoopJoin"))
    val any = planOf(
      """SELECT l.k, r.p FROM alr_l l
        |ANY LEFT JOIN alr_r r ON l.k = r.k""".stripMargin)
    assert(any.contains("first"), any.take(2000))
    assert(any.contains("ch_asof_lid_"), any.take(2000))
  }

  test("multi-key same-direction probe sorts fold into a struct ordering") {
    Seq((1, 100L), (2, 50L)).toDF("k", "ts").createOrReplaceTempView("alrm_l")
    Seq((1, 90L, "a"), (1, 90L, "b"), (1, 150L, "c")).toDF("k", "rts", "p")
      .createOrReplaceTempView("alrm_r")
    val df = spark.sql(
      """SELECT l.k, r.p FROM alrm_l l LEFT JOIN LATERAL (
        |  SELECT * FROM alrm_r r WHERE l.k = r.k AND l.ts >= r.rts
        |  ORDER BY r.rts DESC, r.p DESC LIMIT 1) r
        |ORDER BY l.k""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("max_by"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // tie on rts=90 resolves by the second key: 'b' over 'a'
    val rows = df.collect().map(r =>
      r.getInt(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(rows === Seq(1 -> "b", 2 -> null))
  }

  test("projected probe (SELECT r.v FROM …) is rewritten, not decorrelated") {
    Seq((1, 100L), (2, 50L)).toDF("k", "ts").createOrReplaceTempView("alrp_l")
    Seq((1, 90L, "a"), (1, 150L, "b")).toDF("k", "rts", "p")
      .createOrReplaceTempView("alrp_r")
    // ORDER BY on a column missing from the select list also exercises
    // the analyzer's Project(narrow, Sort(…, Project(wide, Filter))) shape
    val df = spark.sql(
      """SELECT l.k, r.p FROM alrp_l l LEFT JOIN LATERAL (
        |  SELECT r0.p FROM alrp_r r0 WHERE l.k = r0.k AND l.ts >= r0.rts
        |  ORDER BY r0.rts DESC LIMIT 1) r
        |ORDER BY l.k""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("max_by"), plan.take(2000))
    assert(plan.contains("ch_asof_lid_"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    val rows = df.collect().map(r =>
      r.getInt(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(rows === Seq(1 -> "a", 2 -> null))
  }

  test("projected probe: non-null-propagating exprs stay NULL on unmatched rows") {
    Seq((1, 100L), (2, 50L)).toDF("k", "ts").createOrReplaceTempView("alrc_l")
    Seq((1, 90L, "a")).toDF("k", "rts", "p").createOrReplaceTempView("alrc_r")
    val df = spark.sql(
      """SELECT l.k, r.c FROM alrc_l l LEFT JOIN LATERAL (
        |  SELECT coalesce(r0.p, 'none') AS c FROM alrc_r r0
        |  WHERE l.k = r0.k AND l.ts >= r0.rts
        |  ORDER BY r0.rts DESC LIMIT 1) r
        |ORDER BY l.k""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ch_asof_lid_"), plan.take(2000))
    val rows = df.collect().map(r =>
      r.getInt(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toSeq
    // k=2 has no match: the LATERAL's row is missing entirely, so the
    // projected coalesce must yield NULL, not 'none'
    assert(rows === Seq(1 -> "a", 2 -> null))
  }

  test("mixed-direction multi-key sorts fold into one min_by via order negation") {
    Seq((1, 100L), (2, 50L)).toDF("k", "ts").createOrReplaceTempView("alrx_l")
    Seq((1, 90L, 2L, "a"), (1, 90L, 1L, "b"), (1, 80L, 0L, "c"))
      .toDF("k", "rts", "seq", "p").createOrReplaceTempView("alrx_r")
    val df = spark.sql(
      """SELECT l.k, r.p FROM alrx_l l LEFT JOIN LATERAL (
        |  SELECT * FROM alrx_r r0 WHERE l.k = r0.k AND l.ts >= r0.rts
        |  ORDER BY r0.rts DESC, r0.seq ASC LIMIT 1) r
        |ORDER BY l.k""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("min_by"), plan.take(2000))
    assert(plan.contains("ch_asof_lid_"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // rts DESC picks the 90-group; seq ASC breaks the tie toward 'b'
    val rows = df.collect().map(r =>
      r.getInt(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(rows === Seq(1 -> "b", 2 -> null))
  }

  test("DESC string key under a mixed sort folds into max_by (no bail)") {
    Seq((1, 100L), (2, 50L)).toDF("k", "ts").createOrReplaceTempView("alrs_l")
    Seq((1, 90L, "zed", "a"), (1, 90L, "alp", "b"), (1, 80L, "zzz", "c"))
      .toDF("k", "rts", "name", "p").createOrReplaceTempView("alrs_r")
    // rts ASC (negatable) + name DESC (string, non-negatable): min_by
    // cannot carry it, so the rule flips to max_by with rts negated
    val df = spark.sql(
      """SELECT l.k, r.p FROM alrs_l l LEFT JOIN LATERAL (
        |  SELECT * FROM alrs_r r0 WHERE l.k = r0.k AND l.ts >= r0.rts
        |  ORDER BY r0.rts ASC, r0.name DESC LIMIT 1) r
        |ORDER BY l.k""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("max_by"), plan.take(2000))
    assert(plan.contains("ch_asof_lid_"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // rts ASC picks the 80-group ('c'); with equal rts, name DESC picks 'zed'
    val rows = df.collect().map(r =>
      r.getInt(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(rows === Seq(1 -> "c", 2 -> null))
    // equal-rts tiebreak on the string: drop the 80 row from the probe
    val tie = spark.sql(
      """SELECT l.k, r.p FROM alrs_l l LEFT JOIN LATERAL (
        |  SELECT * FROM alrs_r r0 WHERE l.k = r0.k AND r0.rts = 90
        |  ORDER BY r0.rts ASC, r0.name DESC LIMIT 1) r
        |ORDER BY l.k""".stripMargin)
    assert(tie.queryExecution.executedPlan.toString.contains("ch_asof_lid_"))
    assert(tie.collect().map(r =>
      r.getInt(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toSeq
      === Seq(1 -> "a", 2 -> null))
    // NULL placement still exact under the flipped aggregate
    Seq((1, Some("x"), "real"), (1, Option.empty[String], "nul"))
      .toDF("k", "s", "p").createOrReplaceTempView("alrs_rn")
    def pick(order: String): String = {
      val d = spark.sql(
        s"""SELECT l.k, r.p FROM alrs_l l LEFT JOIN LATERAL (
           |  SELECT * FROM alrs_rn r0 WHERE l.k = r0.k
           |  ORDER BY $order LIMIT 1) r
           |WHERE l.k = 1""".stripMargin)
      assert(d.queryExecution.executedPlan.toString.contains("ch_asof_lid_"),
        s"not rewritten for: $order")
      d.collect().head.getString(1)
    }
    // string DESC + a second ASC key forces the max_by path; DESC
    // default NULLS LAST → real row wins; NULLS FIRST → null row wins
    assert(pick("r0.s DESC, r0.k ASC") === "real")
    assert(pick("r0.s DESC NULLS FIRST, r0.k ASC") === "nul")
  }

  test("multi-inequality (range-bounded) lateral rewrites: both bounds ride as join residuals") {
    // `l.ts >= r.rts AND l.ts < r.rts2` — the range-asof shape. The CH
    // ASOF TEXT form rejects >1 inequality by design (CH itself allows
    // exactly one closest-match condition — the loud parser fail is
    // faithful); the direct LATERAL spelling is the supported route and
    // must rewrite to equi-join + argmax with BOTH inequalities as
    // residual conditions, never a domain nested loop.
    Seq((1, 100L), (2, 50L)).toDF("k", "ts").createOrReplaceTempView("mi_l")
    Seq((1, 90L, 95L, "a"), (1, 150L, 160L, "b"), (1, 80L, 200L, "c"))
      .toDF("k", "rts", "rts2", "p").createOrReplaceTempView("mi_r")
    val df = spark.sql(
      """SELECT l.k, l.ts, p.p FROM mi_l l
        |LEFT JOIN LATERAL (
        |  SELECT r.p FROM mi_r r
        |  WHERE l.k = r.k AND l.ts >= r.rts AND l.ts < r.rts2
        |  ORDER BY r.rts DESC LIMIT 1) p""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("max_by"), plan.take(2000))
    assert(plan.contains("(ts") && plan.contains(">= rts") && plan.contains("< rts2"),
      "both inequalities must ride the hash join as residuals: " + plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"))
    // row 1: only (80,200) contains ts=100; (90,95) misses the upper
    // bound. row 2: no match -> NULL (left outer preserved)
    assert(df.collect().map(r => (r.getInt(0), if (r.isNullAt(2)) null else r.getString(2))).toSet
      === Set((1, "c"), (2, null)))
  }

  test("LIMIT k probes take the window path (rank <= k, no nested loop)") {
    Seq((1, 100L), (2, 85L), (3, 10L)).toDF("k", "ts").createOrReplaceTempView("alrk_l")
    Seq((1, 90L, "a"), (1, 80L, "b"), (1, 70L, "c"), (1, 60L, "d"), (2, 50L, "e"))
      .toDF("k", "rts", "p").createOrReplaceTempView("alrk_r")
    val df = spark.sql(
      """SELECT l.k, r.p FROM alrk_l l LEFT JOIN LATERAL (
        |  SELECT * FROM alrk_r r0 WHERE l.k = r0.k AND l.ts >= r0.rts
        |  ORDER BY r0.rts DESC LIMIT 3) r
        |ORDER BY l.k, r.p""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ch_asof_rn_"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    val rows = df.collect().map(r =>
      r.getInt(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toSeq
    // k=1: top-3 of 4 matches by rts DESC; k=2: its one match; k=3: none
    assert(rows === Seq(1 -> "a", 1 -> "b", 1 -> "c", 2 -> "e", 3 -> null))
    // inner form drops unmatched left rows
    val innerForm = spark.sql(
      """SELECT l.k, r.p FROM alrk_l l, LATERAL (
        |  SELECT * FROM alrk_r r0 WHERE l.k = r0.k AND l.ts >= r0.rts
        |  ORDER BY r0.rts DESC LIMIT 2) r
        |ORDER BY l.k, r.p""".stripMargin).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toSeq
    assert(innerForm === Seq(1 -> "a", 1 -> "b", 2 -> "e"))
  }

  test("LIMIT-1 sort with non-negatable keys both directions uses the window path") {
    Seq((1, 100L)).toDF("k", "ts").createOrReplaceTempView("alrw_l")
    Seq((1, "alpha", "zed", "a"), (1, "alpha", "abc", "b"), (1, "beta", "zzz", "c"))
      .toDF("k", "s1", "s2", "p").createOrReplaceTempView("alrw_r")
    // ASC string + DESC string: no aggregate encoding exists in either
    // direction — the window path carries the sort natively
    val df = spark.sql(
      """SELECT l.k, r.p FROM alrw_l l LEFT JOIN LATERAL (
        |  SELECT * FROM alrw_r r0 WHERE l.k = r0.k
        |  ORDER BY r0.s1 ASC, r0.s2 DESC LIMIT 1) r""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ch_asof_rn_"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // s1 ASC picks 'alpha'; s2 DESC breaks the tie toward 'zed' → 'a'
    assert(df.collect().map(_.getString(1)).toSeq === Seq("a"))
  }

  test("argmax reproduces Sort's null placement exactly") {
    Seq((1, 100L), (2, 100L), (3, 100L)).toDF("k", "ts")
      .createOrReplaceTempView("alrn_l")
    Seq((1, Some(90L), "a"), (1, None, "n"), (2, None, "m"))
      .toDF("k", "rts", "p").createOrReplaceTempView("alrn_r")
    def pick(order: String): Seq[(Int, String)] = {
      val df = spark.sql(
        s"""SELECT l.k, r.p FROM alrn_l l LEFT JOIN LATERAL (
           |  SELECT * FROM alrn_r r0 WHERE l.k = r0.k
           |  ORDER BY $order LIMIT 1) r
           |ORDER BY l.k""".stripMargin)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ch_asof_lid_"), s"not rewritten for: $order")
      df.collect().map(r =>
        r.getInt(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toSeq
    }
    // ASC default = NULLS FIRST: the NULL-ordered row wins; a group
    // whose ordering values are ALL null still returns a real row
    assert(pick("r0.rts ASC") === Seq(1 -> "n", 2 -> "m", 3 -> null))
    assert(pick("r0.rts ASC NULLS LAST") === Seq(1 -> "a", 2 -> "m", 3 -> null))
    // DESC default = NULLS LAST
    assert(pick("r0.rts DESC") === Seq(1 -> "a", 2 -> "m", 3 -> null))
    assert(pick("r0.rts DESC NULLS FIRST") === Seq(1 -> "n", 2 -> "m", 3 -> null))
  }

  test("rewritten ASOF results match the window-form API on the fixture") {
    val d = sf0001
    graft.Tables.t(spark, d, "events").createOrReplaceTempView("events_alr2_v")
    val sqlRows = spark.sql(
      """SELECT e.event_id, p.event_id AS prior FROM events_alr2_v e
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events_alr2_v
        |                WHERE event_type = 'purchase') p
        |ON e.user_id = p.user_id AND e.ts >= p.ts""".stripMargin)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(_._1).toSeq
    import org.apache.spark.sql.functions.col
    val e = graft.Tables.t(spark, d, "events").select("event_id", "user_id", "ts")
    val p = graft.Tables.t(spark, d, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("prior"))
    val apiRows = graft.operators.AsOfJoin
      .leftAsOf(e, p, Seq("user_id"), "ts", "ts", Seq("prior"))
      .select("event_id", "prior")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(_._1).toSeq
    // equal-timestamp ties may resolve differently (both picks valid);
    // compare on the non-tied rows — which is all of them in the fixture
    assert(sqlRows === apiRows)
  }

  test("nearest-match probe: outer refs in ORDER BY and projection are rescued") {
    Seq((1, 100L), (2, 500L), (3, 7L)).toDF("k", "ts").createOrReplaceTempView("alro_l")
    Seq((1, 90L, "a"), (1, 108L, "b"), (1, 200L, "c"), (2, 498L, "d"))
      .toDF("k", "rts", "p").createOrReplaceTempView("alro_r")
    // ORDER BY abs(l.ts - r.rts): the closest event either side — the
    // classic nearest-asof a window form can't express directly
    val df = spark.sql(
      """SELECT l.k, r.p, r.delta FROM alro_l l LEFT JOIN LATERAL (
        |  SELECT r0.p, abs(l.ts - r0.rts) AS delta
        |  FROM alro_r r0 WHERE l.k = r0.k
        |  ORDER BY abs(l.ts - r0.rts) ASC, r0.p LIMIT 1) r
        |ORDER BY l.k""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ch_asof_lid_"), plan.take(2000))
    assert(plan.contains("min_by"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    val rows = df.collect().map(r => (r.getInt(0),
      if (r.isNullAt(1)) null else r.getString(1),
      if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    // k=1: |100-108|=8 beats |100-90|=10; k=3 unmatched stays NULL —
    // including the projected delta, which references a LEFT column
    assert(rows === Seq((1, "b", 8L), (2, "d", 2L), (3, null, -1L)))

    // window path with outer-ref sort: LIMIT k > 1 nearest matches
    val topk = spark.sql(
      """SELECT l.k, r.p FROM alro_l l LEFT JOIN LATERAL (
        |  SELECT r0.p FROM alro_r r0 WHERE l.k = r0.k
        |  ORDER BY abs(l.ts - r0.rts) ASC, r0.p LIMIT 2) r
        |ORDER BY l.k, r.p""".stripMargin)
    assert(topk.queryExecution.executedPlan.toString.contains("ch_asof_rn_"))
    assert(topk.collect().map(r =>
      r.getInt(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toSeq
      === Seq(1 -> "a", 1 -> "b", 2 -> "d", 3 -> null))

    // a probe output that is PURELY a left reference still nulls on
    // unmatched rows (the lateral produced no row there)
    val pureLeft = spark.sql(
      """SELECT l.k, r.echo FROM alro_l l LEFT JOIN LATERAL (
        |  SELECT l.ts AS echo FROM alro_r r0 WHERE l.k = r0.k
        |  ORDER BY r0.rts LIMIT 1) r
        |ORDER BY l.k""".stripMargin)
    assert(pureLeft.queryExecution.executedPlan.toString.contains("ch_asof_lid_"))
    assert(pureLeft.collect().map(r =>
      r.getInt(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
      === Seq(1 -> 100L, 2 -> 500L, 3 -> -1L))
  }
}
