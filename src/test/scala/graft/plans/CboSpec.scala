package graft.plans

import graft.SparkSpec

/** Cost-based-optimizer evidence (SURVEY §4: at 100× the multi-join
  * orders must not ride on AQE alone): `ANALYZE TABLE` feeds row/column
  * statistics into the catalog, CBO turns them into cardinality
  * estimates, and the estimates drive join strategy BEFORE execution —
  * the static half of the plan-quality story, complementing AQE's
  * runtime half. The reference delegates all of this to the ClickHouse
  * planner server-side; on the Spark engine it's `spark.sql.cbo.*` +
  * catalog statistics.
  */
class CboSpec extends SparkSpec {

  private def withConfs[T](confs: (String, String)*)(body: => T): T = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def ensureTable(name: String, file: String): Unit =
    if (!spark.catalog.tableExists(name)) {
      spark.sql(
        s"CREATE TABLE $name USING parquet LOCATION '/root/testdata/sf0.01/$file'")
    }

  test("ANALYZE TABLE feeds row counts and column stats into plan estimates") {
    ensureTable("cbo_orders", "orders.parquet")
    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR COLUMNS o_orderpriority, o_custkey, o_totalprice")

    val expected = spark.table("cbo_orders").count()
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val stats = spark.table("cbo_orders").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.isDefined, "ANALYZE did not produce a row count")
      assert(stats.rowCount.get.toLong === expected)
      // column histograms/NDV flow through: a selective filter's estimate
      // must shrink well below the unfiltered relation
      val filtered = spark.table("cbo_orders")
        .filter("o_orderpriority = '1-URGENT'")
        .queryExecution.optimizedPlan.stats
      assert(filtered.sizeInBytes < stats.sizeInBytes,
        s"filter selectivity not estimated: $filtered vs $stats")
    }
  }

  test("CBO filter-selectivity estimate flips a join to broadcast pre-execution") {
    ensureTable("cbo_orders", "orders.parquet")
    ensureTable("cbo_lineitem", "lineitem.parquet")
    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR COLUMNS o_orderpriority, o_orderkey")
    spark.sql("ANALYZE TABLE cbo_lineitem COMPUTE STATISTICS FOR COLUMNS l_orderkey")

    // CBO estimates the filtered build side at ~1/5 of the rows; without
    // CBO the filter keeps its child's size. A threshold between the two
    // estimates discriminates exactly on selectivity-awareness.
    // measure on the column-pruned shape the join's build side will have
    def filteredEstimate(cbo: Boolean): Long =
      withConfs("spark.sql.cbo.enabled" -> cbo.toString) {
        spark.table("cbo_orders").filter("o_orderpriority = '1-URGENT'")
          .select("o_orderkey", "o_orderpriority")
          .queryExecution.optimizedPlan.stats.sizeInBytes.toLong
      }
    val withCbo = filteredEstimate(cbo = true)
    val withoutCbo = filteredEstimate(cbo = false)
    assert(withCbo < withoutCbo, s"CBO estimate $withCbo !< size-only $withoutCbo")
    val threshold = (withCbo + withoutCbo) / 2
    val sql =
      """SELECT l.l_orderkey, o.o_orderpriority
        |FROM cbo_lineitem l JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'""".stripMargin

    withConfs(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> threshold.toString) {
      val plan = spark.sql(sql).queryExecution.sparkPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan)
    }
    withConfs(
      "spark.sql.cbo.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> threshold.toString) {
      val plan = spark.sql(sql).queryExecution.sparkPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"broadcast chosen without CBO — threshold no longer discriminates:\n$plan")
    }
  }

  test("CBO join reorder: the selective dim meets the mid table before the fact") {
    ensureTable("cbo_orders", "orders.parquet")
    ensureTable("cbo_lineitem", "lineitem.parquet")
    ensureTable("cbo_customer", "customer.parquet")
    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR COLUMNS o_orderkey, o_custkey")
    spark.sql("ANALYZE TABLE cbo_lineitem COMPUTE STATISTICS FOR COLUMNS l_orderkey")
    spark.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS FOR COLUMNS c_custkey, c_mktsegment")

    // written WORST-first: fact ⋈ mid, then the selective dim last
    val sql =
      """SELECT c.c_custkey, count(*) AS n
        |FROM cbo_lineitem l
        |JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
        |JOIN cbo_customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY c.c_custkey""".stripMargin

    withConfs(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true") {
      val optimized = spark.sql(sql).queryExecution.optimizedPlan
      // the cost-based order joins orders⋈customer (15k × filtered dim)
      // before touching the 60k-row lineitem: in the reordered tree the
      // first (innermost) join must NOT involve lineitem
      val joins = optimized.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      assert(joins.nonEmpty)
      val innermost = joins.last
      val innermostTables = innermost.collectLeaves().map(_.toString).mkString
      assert(!innermostTables.contains("lineitem"),
        s"join reorder left the fact in the innermost join:\n$optimized")
      // and the result is still correct (sanity vs the non-CBO run)
      val n = spark.sql(sql).count()
      withConfs("spark.sql.cbo.enabled" -> "false") {
        assert(spark.sql(sql).count() === n)
      }
    }
  }
}
