package graft

/** Every declared query (SparkEntry.queries) must run end-to-end on the
  * smallest fixture and produce rows — the local mirror of the driver's
  * smoke gate; value-level correctness is the DuckDB oracle's job
  * (scripts/check.py at sf0.01). */
class QueriesSpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a unique name and every oracle key exists") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.allDefs.foreach { q =>
    test(s"${q.name} runs and returns rows on sf0.001") {
      val df = q.build(spark, sf0001)
      assert(df.count() > 0, s"${q.name} returned no rows")
    }
  }
}
