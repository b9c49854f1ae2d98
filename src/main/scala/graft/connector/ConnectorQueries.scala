package graft.connector

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import graft.{QueryDef, QueryRegistry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared connector capabilities, oracle-checked end-to-end through a
  * live (in-process, offline) HTTP endpoint: a pushdown read
  * (B-SRC1-via-A19: Arrow-IPC-over-HTTP scan) and a write+read-back
  * round trip (B-SNK1/A8 → A2), mirroring the reference's e2e shape
  * `tests/tests/arrow.rs:21-79` (create → insert → select → compare).
  */
object ConnectorQueries extends QueryRegistry {

  /** One stub endpoint per fixture dir, seeded lazily (the container has
    * no live ClickHouse — same role as the reference's testcontainers). */
  private val servers = new ConcurrentHashMap[String, StubCHServer]()
  private val writeSeq = new AtomicLong()

  def serverFor(spark: SparkSession, dir: String): StubCHServer =
    servers.computeIfAbsent(dir, { d =>
      val srv = new StubCHServer
      srv.load("nation", Tables.t(spark, d, "nation"))
      srv.load("region", Tables.t(spark, d, "region"))
      srv.load("supplier", Tables.t(spark, d, "supplier"))
      // nation.n_name serves dictionary-encoded (LowCardinality wire
      // form, A5): EVERY nation scan below rides the dict decode path
      // through the oracle gate, not just a dedicated spec
      srv.markLowCardinality("nation", Set("n_name"))
      srv
    })

  /** Auth-armed endpoints (one per fixture dir): every request must carry
    * matching X-ClickHouse-User/Key headers or is 403'd before execution
    * — the reference's credentialed-server contract (`http/client.rs:
    * 44-66` emits the headers; any cloud/hardened ClickHouse requires
    * them). Kept separate from [[serverFor]] so the unauthenticated
    * queries keep exercising the open-endpoint path. */
  private val authServers = new ConcurrentHashMap[String, StubCHServer]()

  def authServerFor(spark: SparkSession, dir: String): StubCHServer =
    authServers.computeIfAbsent(dir, { d =>
      val srv = new StubCHServer
      srv.load("nation", Tables.t(spark, d, "nation"))
      srv.requireAuth("analyst", "s3cret")
      srv
    })

  /** Read through the full connector path with filter + column pushdown. */
  def connectorScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = serverFor(spark, dir)
    spark.read.format("graft-ch")
      .option("url", srv.url)
      .option("table", "nation")
      .load()
      .filter(col("n_regionkey") < 3)
      .select("n_nationkey", "n_name", "n_regionkey")
  }

  /** Write a fixture through the connector insert path, read it back
    * through the scan path. A fresh table name per invocation keeps the
    * query idempotent across verify/bench runs. */
  def insertRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val srv = serverFor(spark, dir)
    val tbl = s"supplier_rt_${writeSeq.incrementAndGet()}"
    Tables.t(spark, dir, "supplier").write.format("graft-ch")
      .option("url", srv.url)
      .option("table", tbl)
      .mode("append")
      .save()
    spark.read.format("graft-ch")
      .option("url", srv.url)
      .option("table", tbl)
      .load()
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "b_src4_connector_scan",
      (s, d) => connectorScan(s, d),
      Some("""SELECT n_nationkey, n_name, n_regionkey FROM nation
             |WHERE n_regionkey < 3""".stripMargin)),

    QueryDef(
      "b_snk1_insert_roundtrip",
      (s, d) => insertRoundTrip(s, d),
      Some("SELECT * FROM supplier")),

    // ---- nested transport: Array(Float32) through insert + scan ----
    // The embeddings fixture rides the connector both ways (A3 list
    // serialize → A2 list decode); output scalarizes the vector (dim +
    // element sum, double-accumulated in element order on both engines)
    // because the oracle harness can't sort rows on an array cell.
    QueryDef(
      "b_src6_connector_array",
      (s, d) => {
        val srv = serverFor(s, d)
        val tbl = s"embeddings_rt_${writeSeq.incrementAndGet()}"
        Tables.t(s, d, "embeddings").write.format("graft-ch")
          .option("url", srv.url).option("table", tbl)
          .mode("append").save()
        s.read.format("graft-ch")
          .option("url", srv.url).option("table", tbl)
          .load()
          .select(col("vec_id"), col("label"),
            size(col("embedding")).as("dim"),
            round(expr("aggregate(embedding, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))"), 4)
              .as("vsum"))
      },
      Some("""SELECT vec_id, label, CAST(len(embedding) AS INT) AS dim,
             |  round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS vsum
             |FROM embeddings""".stripMargin)),

    // ---- TopN pushdown through the connector: ORDER BY + LIMIT run
    // server-side per scan partition (transport carries ≤ n rows per
    // partition), Spark's TopN merges — ConnectorSpec asserts the pushed
    // SQL and plan marker; this entry pins the end-to-end result. ----
    QueryDef(
      "b_src16_connector_topn",
      (s, d) => {
        val srv = serverFor(s, d)
        s.read.format("graft-ch")
          .option("url", srv.url).option("table", "supplier")
          .load()
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
          .orderBy(col("s_acctbal").desc, col("s_suppkey"))
          .limit(10)
      },
      Some("""SELECT s_suppkey, s_name, s_acctbal FROM supplier
             |ORDER BY s_acctbal DESC, s_suppkey LIMIT 10""".stripMargin)),

    // ---- FixedSizeBinary transport: UUID-shaped 16-byte values ride
    // the connector as Arrow FSB(16) — the wire form the reference uses
    // for UUID/IPv6/Int128 (`arrow/types.rs:381-398`) — then decode to
    // canonical text through the engine's uuid_string expression. The
    // FixedWidthKey metadata on the write side selects the FSB wire
    // form; the scan side maps FSB back to BinaryType + metadata. ----
    QueryDef(
      "b_val5_uuid_transport",
      (s, d) => {
        val srv = serverFor(s, d)
        val tbl = s"uuid_rt_${writeSeq.incrementAndGet()}"
        Tables.t(s, d, "nation")
          .select(col("n_nationkey"),
            unhex(md5(col("n_name").cast("binary"))).as("u", ArrowCodec.fixedWidthMetadata(16)))
          .write.format("graft-ch").option("url", srv.url).option("table", tbl)
          .mode("append").save()
        s.read.format("graft-ch").option("url", srv.url).option("table", tbl).load()
          .select(col("n_nationkey"), expr("uuid_string(u)").as("uuid_text"))
      },
      Some("""SELECT n_nationkey,
             |  concat(substr(md5(n_name),1,8),'-',substr(md5(n_name),9,4),'-',
             |         substr(md5(n_name),13,4),'-',substr(md5(n_name),17,4),'-',
             |         substr(md5(n_name),21,12)) AS uuid_text
             |FROM nation""".stripMargin)),

    // ---- OFFSET pushdown (pairs with the landed TopN): the server skips
    // and truncates; on the single-read plan Spark drops its own
    // limit/offset entirely (ConnectorSpec asserts the pushed SQL and the
    // multi-partition refusal) ----
    QueryDef(
      "b_src19_connector_offset",
      (s, d) => {
        val srv = serverFor(s, d)
        s.read.format("graft-ch")
          .option("url", srv.url).option("table", "supplier")
          .load()
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
          .orderBy(col("s_suppkey"))
          .offset(3).limit(5)
      },
      Some("""SELECT s_suppkey, s_name, s_acctbal FROM supplier
             |ORDER BY s_suppkey LIMIT 5 OFFSET 3""".stripMargin)),

    // ---- runtime join filtering (DPP for a remote scan): the broadcast
    // dim side's join keys reach the fact scan as a pushed IN list, so
    // the server prunes the fact read before the transport — the 100-TB
    // fact⋈dim lever (reference delegates joins wholesale,
    // `client.rs:643`; Spark keeps the join, ships the key set) ----
    QueryDef(
      "b_jn16_runtime_filter",
      (s, d) => {
        val srv = serverFor(s, d)
        val fact = s.read.format("graft-ch")
          .option("url", srv.url).option("table", "supplier").load()
        val dim = Tables.t(s, d, "nation").filter(col("n_regionkey") === 0)
        fact.join(broadcast(dim), fact("s_nationkey") === dim("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
      },
      Some("""SELECT s_suppkey, s_name, n_name FROM supplier
             |JOIN nation ON s_nationkey = n_nationkey
             |WHERE n_regionkey = 0""".stripMargin)),

    // ---- compressed transport: the same scan result through a
    // zstd-compressed wire (A7; reference compresses every block,
    // `compression.rs:25-200`) — byte-identical to the plain read ----
    QueryDef(
      "b_src20_compressed_scan",
      (s, d) => {
        val srv = serverFor(s, d)
        s.read.format("graft-ch")
          .option("url", srv.url).option("table", "nation")
          .option("compression", "zstd")
          .load()
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      },
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation"))
,
    // ---- LZ4 wire in ClickHouse's OWN frame format (A7 tail, r14:
    // CityHash128-checksummed frames per compression.rs:1-10 — the last
    // codec that previously used connector-local framing; CHLz4Spec
    // pins the byte layout and the loud checksum/method failures) ----
    QueryDef(
      "b_src26_lz4_scan",
      (s, d) => {
        val srv = serverFor(s, d)
        s.read.format("graft-ch")
          .option("url", srv.url).option("table", "nation")
          .option("compression", "lz4")
          .load()
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      },
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation"))
,
    // ---- authenticated scan (A19 auth tail): the endpoint REQUIRES
    // X-ClickHouse-User/Key on every request (schema probe, stats count,
    // data read) — the real-server contract against any cloud/hardened
    // ClickHouse; the reference sends these headers from
    // `http/client.rs:44-66`. AuthSpec pins the negative paths (missing/
    // wrong key → typed 401/403 code 516, no retry). ----
    QueryDef(
      "b_src25_auth_scan",
      (s, d) => {
        val srv = authServerFor(s, d)
        s.read.format("graft-ch")
          .option("url", srv.url)
          .option("table", "nation")
          .option("user", "analyst")
          .option("password", "s3cret")
          .load()
          .filter(col("n_regionkey") >= 1)
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      },
      Some("""SELECT n_nationkey, n_name, n_regionkey FROM nation
             |WHERE n_regionkey >= 1""".stripMargin)),
    // ---- LowCardinality transport (A5): n_name travels as an Arrow
    // dictionary (per-block dict + Int32 keys, the reference's
    // low_cardinality wire form); BatchReader decodes transparently and
    // the values hash-match the plain oracle ----
    QueryDef(
      "b_src21_lowcard_scan",
      (s, d) => {
        val srv = serverFor(s, d)
        s.read.format("graft-ch")
          .option("url", srv.url).option("table", "nation")
          .load()
          .select(col("n_name"), col("n_regionkey"))
          .filter(col("n_regionkey") >= 2)
      },
      Some("SELECT n_name, n_regionkey FROM nation WHERE n_regionkey >= 2")),

    // ---- system.* introspection (CH system.tables/columns surface):
    // driver-local metadata snapshots through the DSv2 system catalog.
    // No DuckDB analog (engine introspection) → rows-only; semantics
    // pinned in SystemCatalogSpec. ----
    // ---- Variant transport (dense-union wire form, reference
    // arrow/types.rs:483 + e2e new_types.rs:125): the scan materializes
    // the §1.2 tagged struct. The stub fixture is closed-form (odd rows
    // carry Int64 i, even rows String "s<i>" — StubCHServer
    // .loadVariantTable), so the oracle reproduces the Int64 slice by
    // construction; a wire-decode defect breaks the hash. ----
    QueryDef(
      "b_src22_variant_scan",
      (s, d) => {
        val srv = serverFor(s, d)
        srv.loadVariantTable("variants_q", 20)
        s.read.format("graft-ch")
          .option("url", srv.url).option("table", "variants_q")
          .load()
          .selectExpr("v.variant_type AS vt", "v.v0 AS s_val", "v.v1 AS i_val")
          .where("v.variant_type = 'Int64'")
      },
      Some("""SELECT 'Int64' AS vt, CAST(NULL AS VARCHAR) AS s_val,
             |  CAST(2 * i + 1 AS BIGINT) AS i_val
             |FROM range(10) t(i)""".stripMargin)),

    // ---- Enum8 transport (reference `arrow/types.rs:471-474`): the
    // wire is Dictionary(Int8, Utf8) with the declared name↔code map in
    // `ch.enumValues` field metadata; the scan decodes to strings and
    // the query maps names back to codes FROM THAT METADATA — proving
    // the declared codes (not dict positions) survive the round trip.
    // Oracle reproduces the stub's cycling fixture by construction. ----
    QueryDef(
      "b_val6_enum_transport",
      (s, d) => {
        val srv = serverFor(s, d)
        srv.loadEnumTable("enums_q", Seq("red" -> 1, "green" -> 2, "blue" -> 5), 40)
        val df = s.read.format("graft-ch")
          .option("url", srv.url).option("table", "enums_q").load()
        val codePairs = df.schema("e").metadata.getString(ArrowCodec.EnumValuesKey)
          .split(",").toSeq.map { kv =>
            val Array(nm, code) = kv.split("="); (nm, code.toInt)
          }
        val codeMap = map(codePairs.flatMap { case (nm, c) =>
          Seq(lit(nm), lit(c)) }: _*)
        // the derived `code` column doubles as the agg-pushdown blocker:
        // grouping on an expression keeps the GROUP BY Spark-side (the
        // raw-Arrow stub serves the stream verbatim and could not answer
        // it), and NO filter may appear (even an inferred IS NOT NULL
        // would push a WHERE the raw table refuses)
        df.withColumn("code", element_at(codeMap, col("e")))
          .groupBy(col("e"), col("code"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("e"))
      },
      Some("""SELECT e, n, code FROM (VALUES
             |  ('blue', CAST(13 AS BIGINT), 5),
             |  ('green', CAST(13 AS BIGINT), 2),
             |  ('red', CAST(14 AS BIGINT), 1)) AS t(e, n, code)
             |ORDER BY e""".stripMargin)),

    // ---- Dynamic transport (runtime-typed column): dense union tagged
    // ch.type=Dynamic; the scan surfaces the reference's observable read
    // form — stringified value + type name (new_types.rs:242-296). The
    // stub fixture is closed-form (i%3==0 → String "dyn<i>", i%3==1 →
    // Int64 i·10, i%3==2 → NULL — StubCHServer.loadDynamicTable), so the
    // oracle reproduces the non-null rows by construction. ----
    QueryDef(
      "b_src23_dynamic_scan",
      (s, d) => {
        val srv = serverFor(s, d)
        srv.loadDynamicTable("dynamics_q", 30)
        s.read.format("graft-ch")
          .option("url", srv.url).option("table", "dynamics_q").load()
          .selectExpr("dyn.dynamic_type AS dtype", "dyn.value AS v")
          .where("dyn.dynamic_type IS NOT NULL")
      },
      Some("""SELECT CASE WHEN i % 3 = 0 THEN 'String' ELSE 'Int64' END AS dtype,
             |  CASE WHEN i % 3 = 0 THEN 'dyn' || CAST(i AS VARCHAR)
             |       ELSE CAST(i * 10 AS VARCHAR) END AS v
             |FROM range(30) t(i) WHERE i % 3 < 2""".stripMargin)),

    // ---- BFloat16 / Time / Time64 transport (`values.rs:105-111`):
    // u16 raw bits widen to Float32, time-of-day vectors widen to
    // seconds/micros. The stub fixture is closed-form (row i: bf16 bits
    // of i·0.5 — exact in bf16 for i<50 —, i minutes as seconds, same
    // instant in micros — StubCHServer.loadScalarWireTable), so the
    // oracle reproduces the decoded values by construction; `aligned`
    // proves the two clocks agree row-by-row. ----
    QueryDef(
      "b_val7_time_bf16_transport",
      (s, d) => {
        val srv = serverFor(s, d)
        srv.loadScalarWireTable("scalars_q", 50)
        // `aligned` is computed as a column, not a filter — a filter's
        // inferred IS NOT NULL would push a WHERE the verbatim raw-Arrow
        // table refuses to evaluate
        s.read.format("graft-ch")
          .option("url", srv.url).option("table", "scalars_q").load()
          .selectExpr("bf", "t", "t64",
            "t64 = CAST(t AS BIGINT) * 1000000 AS aligned")
      },
      Some("""SELECT CAST(i * 0.5 AS FLOAT) AS bf, CAST(i * 60 AS INTEGER) AS t,
             |  CAST(i * 60000000 AS BIGINT) AS t64, true AS aligned
             |FROM range(50) t(i)""".stripMargin)),

    // ---- read-path SchemaConversions + ArrowOptions (the reference's
    // query-time per-column overrides, arrow/types.rs:81-116, and
    // strings_as_strings, client/options.rs:284-290): one scan overrides
    // region.r_name to Enum8 (names validated in the reader; declared
    // codes exposed through the ch.enumValues metadata the query maps
    // through), the other reads the same table in binary string mode
    // (CH String → BinaryType — the reference's DEFAULT Arrow mapping)
    // and proves the bytes round-trip to the same text. The in-query
    // `require`s are the schema contract: if either option silently
    // stopped applying, the scan fails rather than degrading. ----
    QueryDef(
      "b_src24_schema_override",
      (s, d) => {
        val srv = serverFor(s, d)
        val reg = s.read.format("graft-ch")
          .option("url", srv.url).option("table", "region")
          .option("schema.r_name",
            "Enum8('AFRICA'=1,'AMERICA'=2,'ASIA'=3,'EUROPE'=4,'MIDDLE EAST'=5)")
          .load()
        require(reg.schema("r_name").metadata.getString(ArrowCodec.CHTypeKey) == "Enum8",
          "schema.r_name override must mark the column Enum8")
        val codePairs = reg.schema("r_name").metadata
          .getString(ArrowCodec.EnumValuesKey).split(",").toSeq.map { kv =>
            val i = kv.lastIndexOf('='); (kv.substring(0, i), kv.substring(i + 1).toInt)
          }
        val codeMap = map(codePairs.flatMap { case (nm, c) => Seq(lit(nm), lit(c)) }: _*)
        val bin = s.read.format("graft-ch")
          .option("url", srv.url).option("table", "region")
          .option("stringsAsStrings", "false")
          .load()
        require(bin.schema("r_name").dataType ==
          org.apache.spark.sql.types.BinaryType,
          "stringsAsStrings=false must surface CH String as BinaryType")
        val e = reg.select(col("r_regionkey"), col("r_name"),
          element_at(codeMap, col("r_name")).cast("int").as("code"))
        val b = bin.select(col("r_regionkey"),
          length(col("r_name")).cast("int").as("name_bytes"),
          col("r_name").cast("string").as("name_rt"))
        e.join(b, Seq("r_regionkey"))
          .select(col("r_regionkey"), col("r_name"), col("code"), col("name_bytes"),
            (col("name_rt") === col("r_name")).as("bytes_match"))
      },
      Some("""SELECT r_regionkey, r_name,
             |  CAST(CASE r_name WHEN 'AFRICA' THEN 1 WHEN 'AMERICA' THEN 2
             |       WHEN 'ASIA' THEN 3 WHEN 'EUROPE' THEN 4 ELSE 5 END AS INT) AS code,
             |  CAST(strlen(r_name) AS INT) AS name_bytes,
             |  TRUE AS bytes_match
             |FROM region""".stripMargin)),

    // ---- harvested from the reference test corpus: `dynamicType(d)` /
    // `variantType(v)` (tests/new_types.rs:242-296) — the dialect maps
    // both onto the §1.2 tagged-struct projections, so the reference's
    // own introspection queries run verbatim over connector scans ----
    QueryDef(
      "b_sql38_dynamic_type",
      (s, d) => {
        val srv = serverFor(s, d)
        srv.loadDynamicTable("dynamics_sql", 30)
        s.read.format("graft-ch")
          .option("url", srv.url).option("table", "dynamics_sql")
          .load().createOrReplaceTempView("dyn_sql_v")
        s.sql(
          """SELECT dynamicType(dyn) AS dtype, dyn.value AS v
            |FROM dyn_sql_v WHERE dynamicType(dyn) IS NOT NULL""".stripMargin)
      },
      Some("""SELECT CASE WHEN i % 3 = 0 THEN 'String' ELSE 'Int64' END AS dtype,
             |  CASE WHEN i % 3 = 0 THEN 'dyn' || CAST(i AS VARCHAR)
             |       ELSE CAST(i * 10 AS VARCHAR) END AS v
             |FROM range(30) t(i) WHERE i % 3 < 2""".stripMargin)),

    QueryDef(
      "b_sql39_variant_type",
      (s, d) => {
        val srv = serverFor(s, d)
        srv.loadVariantTable("variants_sql", 20)
        s.read.format("graft-ch")
          .option("url", srv.url).option("table", "variants_sql")
          .load().createOrReplaceTempView("var_sql_v")
        s.sql(
          """SELECT variantType(v) AS vt, v.v1 AS i_val
            |FROM var_sql_v WHERE variantType(v) = 'Int64'""".stripMargin)
      },
      Some("""SELECT 'Int64' AS vt, CAST(2 * i + 1 AS BIGINT) AS i_val
             |FROM range(10) t(i)""".stripMargin)),

    // ---- geo type transport e2e (§1.2 geo ↔ reference
    // native/types/geo.rs:11): Point/Ring/Polygon/MultiPolygon are
    // aliases of Tuple/Array shapes, so they ride the recursive
    // struct/list serde BOTH ways — a deterministic geo fixture built
    // from nation keys writes through the connector, reads back with
    // `schema.<col>` geo targets (the preserve arm of
    // schema_conversion), and scalarizes every level: point coords,
    // ring vertex count + x-sum, polygon ring count + y-sum,
    // multipolygon count + x-sum. The `require`s pin the declared geo
    // identity on the read schema. ----
    QueryDef(
      "b_val8_geo_transport",
      (s, d) => {
        val srv = serverFor(s, d)
        val tbl = s"geo_rt_${writeSeq.incrementAndGet()}"
        def pt(ex: org.apache.spark.sql.Column, ey: org.apache.spark.sql.Column) =
          struct(ex.cast("double").as("x"), ey.cast("double").as("y"))
        val id = col("id")
        Tables.t(s, d, "nation")
          .select(col("n_nationkey").cast("long").as("id"))
          .select(id,
            pt(id, id * 2).as("p"),
            array(pt(id, id), pt(id + 1, id), pt(id, id + 1)).as("ring"),
            array(array(pt(id, lit(0)), pt(id + 2, lit(0)), pt(id, lit(2)))).as("poly"),
            array(
              array(array(pt(lit(0), lit(0)), pt(id + 1, lit(1)), pt(lit(1), id + 1))),
              array(array(pt(id, id), pt(id + 3, id), pt(id, id + 3)))).as("mpoly"))
          .write.format("graft-ch").option("url", srv.url).option("table", tbl)
          .mode("append").save()
        val back = s.read.format("graft-ch")
          .option("url", srv.url).option("table", tbl)
          .option("schema.p", "Point").option("schema.ring", "Ring")
          .option("schema.poly", "Polygon").option("schema.mpoly", "MultiPolygon")
          .load()
        Seq("p" -> "Point", "ring" -> "Ring", "poly" -> "Polygon",
          "mpoly" -> "MultiPolygon").foreach { case (c, t) =>
          require(back.schema(c).metadata.getString(ArrowCodec.CHTypeKey) == t,
            s"geo column $c must read back declared as $t")
        }
        back.select(col("id"),
          col("p.x").as("px"), col("p.y").as("py"),
          size(col("ring")).cast("int").as("ring_n"),
          round(expr("aggregate(ring, CAST(0 AS DOUBLE), (a, q) -> a + q.x)"), 4)
            .as("ring_sx"),
          size(col("poly")).cast("int").as("poly_rings"),
          round(expr("aggregate(flatten(poly), CAST(0 AS DOUBLE), (a, q) -> a + q.y)"), 4)
            .as("poly_sy"),
          size(col("mpoly")).cast("int").as("mp_n"),
          round(expr("aggregate(flatten(flatten(mpoly)), CAST(0 AS DOUBLE), (a, q) -> a + q.x)"), 4)
            .as("mp_sx"))
      },
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS id,
             |  CAST(n_nationkey AS DOUBLE) AS px,
             |  CAST(n_nationkey * 2 AS DOUBLE) AS py,
             |  CAST(3 AS INT) AS ring_n,
             |  round(CAST(3 * n_nationkey + 1 AS DOUBLE), 4) AS ring_sx,
             |  CAST(1 AS INT) AS poly_rings,
             |  round(CAST(2 AS DOUBLE), 4) AS poly_sy,
             |  CAST(2 AS INT) AS mp_n,
             |  round(CAST(4 * n_nationkey + 5 AS DOUBLE), 4) AS mp_sx
             |FROM nation""".stripMargin)),

    // ---- system.tables/columns introspection: the dumped view's schema
    // is the fixed nation fixture schema, so the catalog listing is
    // deterministic and pinned as a golden vector (SystemCatalogSpec
    // covers the wider surface: functions/settings/one/numbers). ----
    QueryDef(
      "b_sys1_system_tables",
      (s, d) => {
        graft.Tables.t(s, d, "nation").createOrReplaceTempView("nation_sys_v")
        s.sql(
          """SELECT t.name AS table_name, c.name AS col, c.type, c.position
            |FROM system.tables t
            |JOIN system.columns c ON c.table = t.name
            |WHERE t.name = 'nation_sys_v'
            |ORDER BY c.position""".stripMargin)
      },
      Some("""SELECT 'nation_sys_v' AS table_name, col, "type",
             |  CAST(position AS INTEGER) AS position
             |FROM (VALUES ('n_nationkey', 'int', 1), ('n_name', 'string', 2),
             |             ('n_regionkey', 'int', 3)) AS t(col, "type", position)"""
        .stripMargin))
  )
}
