package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Correctness evidence for the no-oracle native-hash query (b_fnh2):
  * xxhash64 / murmur3 / crc32 are engine-native (Spark-seeded), so
  * cross-engine SQL can't check them — instead we pin golden values
  * (regression-stable across Spark upgrades and our refactors) and assert
  * determinism on fixture data.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("b_fnh2: native hashes match pinned golden values") {
    val rows = Seq("abc", "clickhouse-arrow", "")
      .toDF("t")
      .select(
        col("t"),
        xxhash64(col("t")).as("xx"),
        hash(col("t")).cast("long").as("mm"),
        crc32(col("t").cast("binary")).as("crc"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows("abc") === ((1423657621850124518L, 1322437556L, 891568578L)))
    assert(rows("clickhouse-arrow") === ((-795267821800463482L, -237099897L, 489866296L)))
    assert(rows("") === ((-7444071767201028348L, 142593372L, 0L)))
  }

  test("b_fnh2: hashes are deterministic and collision-free on the fixture") {
    val docs = graft.Tables.t(spark, sf001, "documents")
    val h = docs.select(col("doc_id"), xxhash64(col("text")).as("h"))
    val first = h.orderBy("doc_id").collect().toSeq
    val second = h.orderBy("doc_id").collect().toSeq
    assert(first === second)
    // 500 docs over a 64-bit space: any collision would signal a broken hash
    val texts = docs.select("text").distinct().count()
    val hashes = docs.select(xxhash64(col("text"))).distinct().count()
    assert(hashes === texts)
  }

  test("sumKahan keeps low-order mass a naive double sum drops") {
    // 1e16 + 1.0 == 1e16 in doubles: naive summation loses every 1.0
    val adversarial = (Seq(1e16) ++ Seq.fill(1000)(1.0) ++ Seq(-1e16))
    // kernel-level: exact answer is 1000.0
    val st = adversarial.foldLeft(StateAggregates.KahanSumAggregator.zero)(
      (b, x) => StateAggregates.KahanSumAggregator.reduce(b, x))
    assert(StateAggregates.KahanSumAggregator.finish(st) === 1000.0)
    val naive = adversarial.foldLeft(0.0)(_ + _)
    assert(naive !== 1000.0, s"naive sum unexpectedly exact: $naive")
    // through Spark's partial/merge path: compensation is exact WITHIN a
    // partition; each merge may round once (≤ ulp(1e16) = 2 per merge).
    // Naive summation loses essentially all 1000 units; Kahan keeps them
    // to within a few merge roundings.
    val df = adversarial.toDF("x").repartition(7)
    val viaSpark = df.agg(StateAggregates.sumKahan(col("x"))).head.getDouble(0)
    assert(math.abs(viaSpark - 1000.0) <= 16.0, s"got $viaSpark")
    val naiveSpark = df.agg(sum(col("x"))).head.getDouble(0)
    assert(math.abs(naiveSpark - 1000.0) > 100.0,
      s"naive spark sum unexpectedly accurate: $naiveSpark")
  }
}
