package graft.sources

import java.util.concurrent.atomic.AtomicLong

import graft.{QueryDef, QueryRegistry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interchange-format sources/sinks. The reference speaks ClickHouse
  * FORMATs on the HTTP channel (ArrowStream for data, but the server
  * accepts CSV/JSONEachRow/etc on the same endpoint —
  * `clickhouse-arrow/src/http/client.rs:22-219`); the Spark-native
  * counterparts are the built-in csv/json file sources, declared here as
  * write→read round trips so the oracle pins both directions.
  *
  * Scale notes: both reads carry an EXPLICIT schema — schema inference
  * is a full extra pass over the data at 100 TB. CSV/JSON are row
  * formats with no pushdown or pruning; the scaladoc'd guidance is that
  * they are interchange formats, with parquet/Arrow as the query path.
  */
object Formats extends QueryRegistry {

  private val seq = new AtomicLong()

  private def roundTrip(
      s: SparkSession, d: String, fmt: String)(opts: Map[String, String]): DataFrame = {
    val src = Tables.t(s, d, "supplier")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
    val dir = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft-$fmt-rt-${ProcessHandle.current().pid()}-${seq.incrementAndGet()}")
    src.write.mode("overwrite").options(opts).format(fmt).save(dir.toString)
    s.read.schema(src.schema).options(opts).format(fmt).load(dir.toString)
  }

  private val oracle =
    """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "b_src7_csv_roundtrip",
      (s, d) => roundTrip(s, d, "csv")(Map("header" -> "true")),
      Some(oracle)),
    QueryDef(
      "b_src8_jsonl_roundtrip",
      (s, d) => roundTrip(s, d, "json")(Map.empty),
      Some(oracle)),
    // columnar like parquet: pruning/pushdown-capable, a real query-path
    // format (unlike the row interchange formats above)
    QueryDef(
      "b_src9_orc_roundtrip",
      (s, d) => roundTrip(s, d, "orc")(Map.empty),
      Some(oracle)),
    // schema evolution (CH `ALTER TABLE ADD COLUMN` analog): an old
    // batch written without the new column reads back with nulls when
    // merged with a new-schema batch — no rewrite of historical files.
    QueryDef(
      "b_src10_schema_evolution",
      (s, d) => {
        val src = Tables.t(s, d, "supplier")
        val dir = new java.io.File(
          System.getProperty("java.io.tmpdir"),
          s"graft-evo-${ProcessHandle.current().pid()}-${seq.incrementAndGet()}").toString
        src.select(col("s_suppkey"), col("s_name"))
          .where(col("s_suppkey") % 2 === 0)
          .write.mode("overwrite").parquet(s"$dir/v=1")
        src.select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
          .where(col("s_suppkey") % 2 === 1)
          .write.mode("overwrite").parquet(s"$dir/v=2")
        s.read.option("mergeSchema", "true").parquet(dir)
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      },
      Some("""SELECT s_suppkey, s_name, NULL AS s_acctbal FROM supplier WHERE s_suppkey % 2 = 0
             |UNION ALL
             |SELECT s_suppkey, s_name, s_acctbal FROM supplier WHERE s_suppkey % 2 = 1""".stripMargin)),
    // the reference's own wire format as a file interchange: Arrow IPC
    // stream files, encoded/decoded by the connector codec
    QueryDef(
      "b_src11_arrow_ipc",
      (s, d) => {
        val src = Tables.t(s, d, "supplier")
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
        val dir = new java.io.File(
          System.getProperty("java.io.tmpdir"),
          s"graft-arrows-${ProcessHandle.current().pid()}-${seq.incrementAndGet()}").toString
        ArrowIpc.write(src, dir)
        ArrowIpc.read(s, dir)
      },
      Some(oracle))
  )
}
