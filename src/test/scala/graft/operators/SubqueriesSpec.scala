package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Plan-shape evidence that Catalyst decorrelates every declared subquery
  * into a join — no nested-loop re-execution per row, no cartesian
  * product (the property that keeps these scalable; SURVEY §4.1). */
class SubqueriesSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("IN subquery plans as a semi join") {
    val p = plan("b_sub1_in")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("correlated EXISTS decorrelates to a semi join") {
    val p = plan("b_sub3_exists")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("NOT EXISTS decorrelates to an anti join") {
    val p = plan("b_sub4_not_exists")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("scalar subquery evaluates once, not per row") {
    val p = plan("b_sub2_scalar")
    assert(p.contains("Subquery") || p.contains("ReusedSubquery"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
