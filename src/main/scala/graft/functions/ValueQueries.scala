package graft.functions

import graft.{QueryDef, QueryRegistry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Declared §4.2 value-semantics capabilities, oracle-checked: IPv4
  * text⇄binary round trip, UUID binary→canonical text, Int256
  * string⇄binary round trip, Enum name→code. Inputs are derived
  * arithmetically from `orders` so DuckDB can compute the expected text
  * forms with plain SQL (IPv6's RFC-5952 canonicalizer has no DuckDB
  * counterpart — ValueExpressionsSpec pins it with golden vectors).
  */
object ValueQueries extends QueryRegistry {

  private val enumDict = Seq(
    "1-URGENT" -> 1, "2-HIGH" -> 2, "3-MEDIUM" -> 3, "4-NOT SPECIFIED" -> 4, "5-LOW" -> 5)

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "b_val1_ch_values",
      (s, d) => {
        val ipSql =
          """concat_ws('.',
            |  cast(o_orderkey % 256 as string),
            |  cast((o_orderkey div 7) % 256 as string),
            |  cast((o_orderkey div 11) % 256 as string),
            |  cast((o_orderkey div 13) % 256 as string))""".stripMargin
        Tables.t(s, d, "orders")
          .orderBy("o_orderkey").limit(2000) // smallest 2000 keys, both engines
          .select(
            col("o_orderkey"),
            // IPv4: text -> 4-byte binary -> canonical text (must fix-point)
            expr(s"ipv4_string(ipv4_binary($ipSql))").as("ip_rt"),
            // UUID: 16 md5 bytes -> canonical 8-4-4-4-12
            expr("uuid_string(unhex(md5(cast(o_orderkey as string))))").as("uuid_txt"),
            // Int256: decimal string -> 32-byte two's complement -> string
            expr("int256_string(int256_from_string(cast(cast(o_orderkey as decimal(38,0)) * 1234567890123456789 as string)))")
              .as("i256_rt"),
            EnumCodec.toCode(col("o_orderpriority"), enumDict).cast("int").as("prio_code"))
      },
      Some("""SELECT o_orderkey,
             |  (o_orderkey % 256) || '.' || ((o_orderkey // 7) % 256) || '.' ||
             |  ((o_orderkey // 11) % 256) || '.' || ((o_orderkey // 13) % 256) AS ip_rt,
             |  substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) || '-' ||
             |  substr(md5(CAST(o_orderkey AS VARCHAR)), 9, 4) || '-' ||
             |  substr(md5(CAST(o_orderkey AS VARCHAR)), 13, 4) || '-' ||
             |  substr(md5(CAST(o_orderkey AS VARCHAR)), 17, 4) || '-' ||
             |  substr(md5(CAST(o_orderkey AS VARCHAR)), 21, 12) AS uuid_txt,
             |  CAST(CAST(o_orderkey AS HUGEINT) * 1234567890123456789 AS VARCHAR) AS i256_rt,
             |  CAST(CASE o_orderpriority
             |    WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 WHEN '3-MEDIUM' THEN 3
             |    WHEN '4-NOT SPECIFIED' THEN 4 WHEN '5-LOW' THEN 5 END AS INTEGER) AS prio_code
             |FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 2000)""".stripMargin)),

    // ---- codegen'd vector expressions (vec_cosine/vec_dot/vec_norm):
    // consecutive-vector similarity via a self-join; the expression runs
    // inside whole-stage codegen, not as an interpreted HOF ----
    QueryDef(
      "b_val2_vec_cosine",
      (s, d) => {
        val e = Tables.t(s, d, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"))
        val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"))
        a.join(b, col("vec_a") + 1 === col("vec_b"))
          .select(col("vec_a"), col("vec_b"),
            round(expr("vec_cosine(va, vb)"), 6).as("cos"),
            round(expr("vec_dot(va, vb)"), 6).as("dot"),
            round(expr("vec_norm(va)"), 6).as("norm_a"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings)
             |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             |  round(list_sum(list_transform(range(len(a.v)), i -> a.v[i+1] * b.v[i+1]))
             |    / (sqrt(list_sum(list_transform(range(len(a.v)), i -> a.v[i+1] * a.v[i+1])))
             |     * sqrt(list_sum(list_transform(range(len(b.v)), i -> b.v[i+1] * b.v[i+1])))), 6) AS cos,
             |  round(list_sum(list_transform(range(len(a.v)), i -> a.v[i+1] * b.v[i+1])), 6) AS dot,
             |  round(sqrt(list_sum(list_transform(range(len(a.v)), i -> a.v[i+1] * a.v[i+1]))), 6) AS norm_a
             |FROM e a JOIN e b ON a.vec_id + 1 = b.vec_id""".stripMargin)),

    // ---- exact Decimal aggregation (CH Decimal64(2) money semantics) ----
    // Doubles drift when summed in different orders; Decimal(18,2) is
    // exact and associative, so the engines agree to the last cent with
    // no in-query rounding crutch. Results cross the oracle boundary as
    // strings: DuckDB's pandas bridge coerces every DECIMAL to float64,
    // which would silently downgrade the exactness being asserted.
    QueryDef(
      "b_val3_decimal",
      (s, d) =>
        Tables.t(s, d, "lineitem")
          .select(col("l_returnflag"),
            col("l_extendedprice").cast(DecimalType(18, 2)).as("p"))
          .groupBy("l_returnflag")
          .agg(
            sum(col("p")).cast(DecimalType(38, 2)).cast("string").as("total"),
            max(col("p")).cast("string").as("mx"),
            count(col("p")).as("n")),
      Some("""SELECT l_returnflag,
             |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS total,
             |  CAST(max(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS mx,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- isIPAddressInRange (CH): CIDR containment. The Spark side
    // goes text → ipv4_binary (codegen'd §4.2 expression) → 32-bit int →
    // prefix compare; the oracle recomputes the same integer from the
    // octet arithmetic directly — the expression round trip is what's
    // under test, the mask math is shared. /12 of 10.16.0.0 ≡ the
    // second octet in [16, 31]. ----
    QueryDef(
      "b_val4_cidr",
      (s, d) => {
        val ipSql =
          """concat_ws('.', '10',
            |  cast((o_orderkey div 7) % 256 as string),
            |  cast((o_orderkey div 11) % 256 as string),
            |  cast(o_orderkey % 256 as string))""".stripMargin
        Tables.t(s, d, "orders")
          .orderBy("o_orderkey").limit(2000)
          .select(
            col("o_orderkey"),
            expr(s"ipv4_string(ipv4_binary($ipSql))").as("ip"),
            expr(
              s"""(cast(conv(hex(ipv4_binary($ipSql)), 16, 10) as bigint) >> 20) =
                 |(cast(conv(hex(ipv4_binary('10.16.0.0')), 16, 10) as bigint) >> 20)"""
                .stripMargin).as("in_10_16_0_0_12"))
      },
      Some("""WITH w AS (
             |  SELECT o_orderkey,
             |    '10.' || ((o_orderkey // 7) % 256) || '.' ||
             |    ((o_orderkey // 11) % 256) || '.' || (o_orderkey % 256) AS ip,
             |    10 * 16777216 + ((o_orderkey // 7) % 256) * 65536 +
             |    ((o_orderkey // 11) % 256) * 256 + (o_orderkey % 256) AS ip_int
             |  FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 2000))
             |SELECT o_orderkey, ip,
             |  (ip_int >> 20) = ((10 * 16777216 + 16 * 65536) >> 20) AS in_10_16_0_0_12
             |FROM w""".stripMargin))
  )
}
