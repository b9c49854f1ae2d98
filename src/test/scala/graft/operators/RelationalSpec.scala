package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Plan-shape evidence for the sort family: the bounded and unbounded
  * paths must pick the right physical strategy for scale. */
class RelationalSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("sort+limit runs as TakeOrderedAndProject, not a full sort") {
    val p = plan("b_srt1_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("full global sort range-partitions before sorting") {
    val p = plan("b_srt2_global_sort")
    assert(p.contains("rangepartitioning"), p)
    assert(p.contains("Sort"), p)
  }
}
