package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator: derives an sf1-equivalent fixture set from the
  * driver's sf0.1 parquet by replicating each fact table `factor` times
  * with DISJOINT KEY SHIFTS, preserving referential integrity across the
  * star schema (every replica's l_orderkey joins its own replica's
  * o_orderkey, etc.). Scale certification (VERDICT r06 next-#1) needs
  * 10× rows with the same distributions — plans change shape with stats,
  * and a query can pass sf0.1 and go super-linear at sf1.
  *
  * Shifts per key family (offset > max key at sf0.1, so replica key
  * ranges never collide):
  *   orderkey 10M · custkey/partkey/doc/vec 1M · suppkey 100k ·
  *   event_id 10M · user_id 1M
  *
  * Dims `region`/`nation` are fixed-cardinality in TPC-H and copied
  * unchanged (FKs to them stay valid in every replica).
  *
  * Two columns get content perturbation so scaled data exercises the
  * operators the way a real 10× corpus would, not as a degenerate
  * 10-exact-copies set:
  *   - `documents.text`: word-rotation by an offset drawn from 1..n-1
  *     (7-stride) — a replica is never byte-identical to its original
  *     (exact/normalized dedup sees distinct docs; only sub-replica-count
  *     word counts can repeat a rotation between replicas) while
  *     length/vocabulary/language stats are preserved;
  *     replicas remain NEAR-duplicates (rotation only changes seam
  *     shingles), which stress-tests the MinHash/SimHash banding at a
  *     ~10-member-per-group dup rate — bounded candidate pairs
  *     (C(10,2)=45 per group), not all-pairs.
  *   - `embeddings.embedding`: element-rotation by r — distinct unit
  *     directions per replica (ANN/centroid work scales linearly instead
  *     of collapsing onto 2k duplicated points).
  *
  * Usage: runMain graft.GenScale [srcDir] [outDir] [factor]
  * Default: /root/testdata/sf0.1 -> testdata_sf1 (gitignored), factor 10.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("testdata_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Sessions.local("32", "32")
    try {
      gen(spark, src, out, factor)
    } finally {
      spark.stop()
      // StubCHServer-style non-daemon threads must never pin this JVM
      System.exit(0)
    }
  }

  private val ORD = 10000000L
  private val CUST = 1000000L
  private val PART = 1000000L
  private val SUPP = 100000L
  private val EVT = 10000000L
  private val USER = 1000000L
  private val DOC = 1000000L
  private val VEC = 1000000L

  def gen(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    def raw(n: String): DataFrame = spark.read.parquet(s"$src/$n.parquet")
    // one scan per table: explode a 0..factor-1 replica column, shift keys
    def rep(df: DataFrame): DataFrame =
      df.withColumn("_r", explode(lit((0 until factor).toArray)))
    def shift(c: String, off: Long) = (col(c) + col("_r").cast("long") * lit(off)).as(c)

    def write(name: String, df: DataFrame, parts: Int): Unit = {
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[genscale] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // fixed dims: copy unchanged
    write("region", raw("region"), 1)
    write("nation", raw("nation"), 1)

    write("customer", rep(raw("customer")).select(
      shift("c_custkey", CUST), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment")), 4)

    write("supplier", rep(raw("supplier")).select(
      shift("s_suppkey", SUPP), col("s_name"), col("s_nationkey"),
      col("s_acctbal")), 2)

    write("part", rep(raw("part")).select(
      shift("p_partkey", PART), col("p_name"), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice")), 4)

    write("orders", rep(raw("orders")).select(
      shift("o_orderkey", ORD), shift("o_custkey", CUST),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")), 8)

    write("lineitem", rep(raw("lineitem")).select(
      shift("l_orderkey", ORD), shift("l_partkey", PART),
      shift("l_suppkey", SUPP), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")), 32)

    // events.ts has shipped as TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    // across driver rounds; the raw read/write preserves whichever form
    // the source carries and Tables.normalizeEventTs handles both on load
    write("events", rep(raw("events")).select(
      shift("event_id", EVT), col("ts"), shift("user_id", USER),
      col("event_type"), col("value"), col("props")), 8)

    // word-rotate text (deliberate near-dup stress — see scaladoc).
    // The rotation offset is drawn from 1..n-1 so a replica is NEVER
    // byte-identical to the original (k = 7r mod n collapses to 0
    // whenever n divides 7r — measured 459/5000 sf0.1 docs). Docs with
    // fewer words than replicas can still repeat a rotation BETWEEN
    // replicas (pigeonhole over n-1 offsets) — short-doc exact dups are
    // a realistic corpus property the exact-dedup queries then count.
    val d = rep(raw("documents"))
    val w = split(col("text"), " ")
    val n = size(w)
    val k = when(n >= 2,
      lit(1) + pmod((col("_r") - 1) * lit(7), n - lit(1))).otherwise(lit(0))
    val rotText = array_join(
      concat(slice(w, k + lit(1), n - k), slice(w, lit(1), k)), " ")
    write("documents", d.select(
      shift("doc_id", DOC),
      when(col("_r") === 0, col("text")).otherwise(rotText).as("text"),
      col("lang"), col("source"), col("n_chars")), 8)

    // element-rotate embeddings by r: distinct directions, same norm
    val e = rep(raw("embeddings"))
    val ev = col("embedding")
    val en = size(ev)
    val ek = pmod(col("_r"), greatest(en, lit(1)))
    val rotVec = concat(slice(ev, ek + lit(1), en - ek), slice(ev, lit(1), ek))
    write("embeddings", e.select(
      shift("vec_id", VEC),
      when(col("_r") === 0, ev).otherwise(rotVec).as("embedding"),
      col("label")), 4)
  }
}
