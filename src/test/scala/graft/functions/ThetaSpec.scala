package graft.functions

import graft.SparkSpec

class ThetaSpec extends SparkSpec {
  import spark.implicits._

  test("theta sketches are exact below k and set ops match true set algebra") {
    val a = ThetaSketches.distinctSketch(
      (1L to 1000L).toDF("k"), "k") // 1000 < k=4096 -> exact
    val b = ThetaSketches.distinctSketch(
      (500L to 1500L).toDF("k"), "k")
    assert(math.round(a.getEstimate) === 1000L)
    assert(math.round(b.getEstimate) === 1001L)
    assert(math.round(ThetaSketches.union(a, b).getEstimate) === 1500L)
    assert(math.round(ThetaSketches.intersect(a, b).getEstimate) === 501L)
    assert(math.round(ThetaSketches.aNotB(a, b).getEstimate) === 499L)
  }

  test("theta estimate stays within 3x RSE in the sampling regime") {
    val n = 50000L
    val sk = ThetaSketches.distinctSketch(
      spark.range(n).toDF("id").repartition(8), "id")
    assert(sk.isEstimationMode, "50k distinct should exceed k=4096")
    // RSE ~= 1/sqrt(k); allow 3x
    val rse = 1.0 / math.sqrt(4096.0)
    val rel = math.abs(sk.getEstimate - n) / n
    assert(rel < 3 * rse, s"estimate ${sk.getEstimate} off by $rel")
  }
}
