package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Evidence for the enrichment families beyond the DuckDB oracle:
  * plan shape for dictGet (must stay a broadcast join — zero fact-side
  * shuffle at 100 TB) and known-value checks for the geo formula. */
class EnrichSpec extends SparkSpec {

  test("dictGet plans as a broadcast join with no shuffle on the fact side") {
    val df = SparkEntry.queries("b_dict1_dictget")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    // the only exchange should be the broadcast, never a shuffle
    assert(!p.contains("ShuffleExchange"), p)
  }

  test("missing dictionary keys fall back to the default") {
    import spark.implicits._
    val dict = Seq((1, "FRANCE")).toDF("k", "v")
    val facts = Seq(1, 99).toDF("k2")
    val out = facts
      .join(broadcast(dict), col("k2") === col("k"), "left")
      .select(coalesce(col("v"), lit("UNKNOWN")).as("v"))
      .as[String].collect().sorted
    assert(out.toSeq == Seq("FRANCE", "UNKNOWN"))
  }

  test("haversine distance matches a known geodesic") {
    import spark.implicits._
    // Paris (48.8566, 2.3522) → London (51.5074, -0.1278) ≈ 343.5 km
    val lat1 = lit(51.5074); val lon1 = lit(-0.1278)
    val lat2 = lit(48.8566); val lon2 = lit(2.3522)
    val dlat = radians(lat1 - lat2); val dlon = radians(lon1 - lon2)
    val a = pow(sin(dlat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dlon / 2), 2)
    val km = Seq(1).toDF("x")
      .select((lit(2 * 6371.0) * asin(sqrt(a))).as("km"))
      .as[Double].head()
    assert(math.abs(km - 343.5) < 1.0, s"got $km")
  }

  test("url parse / set ops / exact quantile queries stay codegen'd projections or single aggregates") {
    for (name <- Seq("b_url1_parse", "b_fna6_array_setops")) {
      val p = SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.executedPlan.toString
      // `*(n)` is WholeStageCodegen's marker in executedPlan.toString
      assert(p.contains("*(1)"), s"$name: $p")
      assert(!p.contains("Exchange"), s"$name should not shuffle: $p")
    }
  }

  test("geohash codec: public golden vectors and encode/decode fixpoint") {
    // Wikipedia's canonical example
    assert(Enrich.GeoKernel.geohashEncode(57.64911, 10.40744, 11) === "u4pruydqqvj")
    assert(Enrich.GeoKernel.geohashEncode(57.64911, 10.40744, 5) === "u4pru")
    // equator/prime-meridian cell
    assert(Enrich.GeoKernel.geohashEncode(0.0, 0.0, 1) === "s")
    // decode returns the cell center; re-encoding the center reproduces
    // the hash prefix at the same precision
    for (h <- Seq("u4pruyd", "s000000", "9q8yyk8", "ezs42")) {
      val (la, lo) = Enrich.GeoKernel.geohashDecodeCenter(h)
      assert(Enrich.GeoKernel.geohashEncode(la, lo, h.length) === h)
    }
    // decode error stays bounded by the cell size at precision 7
    val (la, lo) = Enrich.GeoKernel.geohashDecodeCenter(
      Enrich.GeoKernel.geohashEncode(48.8566, 2.3522, 7))
    assert(math.abs(la - 48.8566) < 0.001 && math.abs(lo - 2.3522) < 0.001)
  }
}
