package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Plan evidence for the dialect extensions that claim a physical
  * strategy: the join-algorithm hint must actually change the join. */
class ChExtrasSpec extends SparkSpec {

  test("shuffle_hash hint selects ShuffledHashJoin over the default sort-merge") {
    val p = SparkEntry.queries("b_jn11_hint_shuffle_hash")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("shuffle_merge hint selects SortMergeJoin") {
    val p = SparkEntry.queries("b_jn15_hint_merge")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("ShuffledHashJoin") && !p.contains("BroadcastHashJoin"), p)
  }
}
