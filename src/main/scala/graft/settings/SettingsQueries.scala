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
             |ORDER BY o_orderkey""".stripMargin))
  )
}
