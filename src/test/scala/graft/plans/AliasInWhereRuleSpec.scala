package graft.plans

import graft.SparkSpec

/** [[AliasInWhereRule]]: CH's alias-in-WHERE idiom resolves by inlining
  * the SELECT alias body into the filter — and never touches a query
  * that already resolves under Spark's own rules. */
class AliasInWhereRuleSpec extends SparkSpec {
  import spark.implicits._

  test("SELECT alias is usable in WHERE (CH expression-alias semantics)") {
    Seq((1, 10), (2, 20), (3, 30)).toDF("k", "v").createOrReplaceTempView("aw_t")
    val rows = spark.sql("SELECT k, v * 2 AS dbl FROM aw_t WHERE dbl > 25")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1)
    assert(rows.toSeq === Seq(2 -> 40, 3 -> 60))
  }

  test("type coercion re-runs over the substituted comparison") {
    Seq((1, BigDecimal("1.50")), (2, BigDecimal("3.25")))
      .toDF("k", "v").createOrReplaceTempView("aw_dec")
    // alias body is decimal, literal is int: the substituted comparison
    // needs an implicit cast, proving the rule runs inside the
    // resolution fixed point (not after coercion)
    val rows = spark.sql("SELECT k, v + 1 AS shifted FROM aw_dec WHERE shifted > 4")
      .collect().map(_.getInt(0))
    assert(rows.toSeq === Seq(2))
  }

  test("a real column always wins over a same-named alias") {
    Seq((1, 5), (10, 1)).toDF("k", "v").createOrReplaceTempView("aw_shadow")
    // CH's default would shadow column v with the alias (v = k * 100);
    // here the source column must win: rows where SOURCE v > 3
    val rows = spark.sql("SELECT k, k * 100 AS v FROM aw_shadow WHERE v > 3")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.toSeq === Seq(1 -> 100))
  }

  test("works below GROUP BY for grouping-expression aliases") {
    Seq((1, 10), (1, 20), (2, 30)).toDF("k", "v").createOrReplaceTempView("aw_grp")
    val rows = spark.sql(
      "SELECT k % 2 AS bucket, sum(v) AS s FROM aw_grp WHERE bucket = 1 GROUP BY k % 2")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.toSeq === Seq(1 -> 30L))
  }

  test("aggregate aliases never leak into WHERE") {
    Seq((1, 10)).toDF("k", "v").createOrReplaceTempView("aw_agg")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT k, sum(v) AS s FROM aw_agg WHERE s > 5 GROUP BY k").collect()
    }
    assert(e.getMessage.toLowerCase.contains("s"))
  }

  test("ambiguous alias names stay unresolved (standard error)") {
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("aw_amb")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT a + 1 AS x, b + 1 AS x FROM aw_amb WHERE x > 0").collect()
    }
  }

  test("nondeterministic alias evaluates ONCE below the filter") {
    // CH substitutes the text (two different rand() draws — the filter
    // can pass while the projected value fails it); the restructured
    // plan computes the alias once, so every surviving row's value
    // honors the predicate
    spark.range(2000).createOrReplaceTempView("aw_rand")
    val vals = spark.sql("SELECT rand(7) AS r FROM aw_rand WHERE r < 0.5")
      .collect().map(_.getDouble(0))
    assert(vals.nonEmpty)
    assert(vals.forall(_ < 0.5))
  }

  test("alias chained through PREWHERE text also resolves") {
    Seq((1, 10), (2, 20)).toDF("k", "v").createOrReplaceTempView("aw_pre")
    val rows = spark.sql("SELECT k, v * 3 AS t FROM aw_pre PREWHERE t >= 60")
      .collect().map(_.getInt(0))
    assert(rows.toSeq === Seq(2))
  }
}
