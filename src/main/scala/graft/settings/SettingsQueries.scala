package graft.settings

import graft.{QueryDef, QueryRegistry, Tables}

/** Declared A15 capability: a query whose predicate arrives as a BOUND
  * parameter (never interpolated into the SQL text), oracle-checked. */
object SettingsQueries extends QueryRegistry {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "a15_params_bound",
      (s, d) => {
        Tables.t(s, d, "orders").createOrReplaceTempView("orders_params_v")
        Params.sql(s,
          """SELECT o_orderkey, o_custkey, o_totalprice FROM orders_params_v
            |WHERE o_totalprice > :minPrice AND o_orderpriority = :prio
            |ORDER BY o_orderkey""".stripMargin,
          Map("minPrice" -> 250000.0, "prio" -> "1-URGENT"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |WHERE o_totalprice > 250000.0 AND o_orderpriority = '1-URGENT'
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- SQL-text entry point: the reference's primary UX is shipping
    // a SQL string (`client.rs:643 query_raw`); here the same string runs
    // through Catalyst end-to-end over registered views — a TPC-H Q3
    // shape with join + agg + sort, proving the text path exercises the
    // full optimizer (pushdown, join selection) like the DataFrame path.
    QueryDef(
      "b_sql1_text_query",
      (s, d) => {
        Tables.t(s, d, "customer").createOrReplaceTempView("customer_sql_v")
        Tables.t(s, d, "orders").createOrReplaceTempView("orders_sql_v")
        Tables.t(s, d, "lineitem").createOrReplaceTempView("lineitem_sql_v")
        s.sql(
          """SELECT l_orderkey,
            |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
            |  date_format(o_orderdate, 'yyyy-MM-dd') AS odate
            |FROM customer_sql_v
            |JOIN orders_sql_v ON c_custkey = o_custkey
            |JOIN lineitem_sql_v ON l_orderkey = o_orderkey
            |WHERE c_mktsegment = 'BUILDING' AND l_shipdate > o_orderdate
            |GROUP BY l_orderkey, o_orderdate
            |ORDER BY revenue DESC, l_orderkey
            |LIMIT 20""".stripMargin)
      },
      Some("""SELECT l_orderkey,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |  strftime(o_orderdate, '%Y-%m-%d') AS odate
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING' AND l_shipdate > o_orderdate
             |GROUP BY l_orderkey, o_orderdate
             |ORDER BY revenue DESC, l_orderkey
             |LIMIT 20""".stripMargin))
  )
}
