package graft.client

import graft.{SparkSpec, Tables}
import graft.limits.QueryLimits
import org.apache.spark.sql.functions._

class ClientOpsSpec extends SparkSpec {

  test("A10: queryRows caps at the limit and reports truncation") {
    val li = Tables.t(spark, sf001, "lineitem").orderBy("l_orderkey", "l_linenumber")
    val (rows, stats) = ClientOps.queryRows(li, QueryLimits(maxRows = Some(100)))
    assert(rows.length === 100)
    assert(stats.truncated)
    assert(stats.reason === "max_rows")
  }

  test("A10: queryColumn and queryOne") {
    val nation = Tables.t(spark, sf001, "nation")
    val (names, stats) = ClientOps.queryColumn[String](nation.orderBy("n_nationkey"), "n_name")
    assert(names.length === 25)
    assert(!stats.truncated)
    val one = ClientOps.queryOne[Int](nation.orderBy("n_nationkey").select("n_nationkey"))
    assert(one === Some(0))
    assert(ClientOps.queryOne[Int](nation.filter(col("n_nationkey") < 0).select("n_nationkey")).isEmpty)
  }

  test("A21: healthCheck and job-group cancel") {
    assert(ClientOps.healthCheck(spark))
    // cancel of an idle group is a no-op that must not throw
    ClientOps.cancel(spark, "no-such-group")
  }
}
