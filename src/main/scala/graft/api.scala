package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query capability (SURVEY.md §2).
  *
  * The reference (`hyperi-io/clickhouse-arrow`) ships every SQL string to
  * ClickHouse unparsed (`clickhouse-arrow/src/query.rs:168-197`,
  * `src/client.rs:643`); the server provides the relational surface. Here
  * each capability is declared natively as a Spark DataFrame program plus,
  * when SQL-expressible, an equivalent DuckDB oracle the driver uses as the
  * correctness gate (FIXTURES.md §3).
  *
  * @param name   stable Q-ID-derived key (also the verify output dir name)
  * @param build  (session, sfDir) => result DataFrame; must alias output
  *               columns identically to the oracle SQL
  * @param oracle ANSI SQL over the same parquet tables, runnable by DuckDB;
  *               None for ops whose exact output is not SQL-expressible
  *               (approximate sketches, model-ish heuristics) — the driver
  *               then records a weaker rows-only check
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** A module of declared queries; SparkEntry concatenates all registries. */
trait QueryRegistry { def defs: Seq[QueryDef] }

/** Fixture-table loader (TESTDATA.md): every table is one parquet file. */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS); Spark's TimestampType is
      // µs-precision and rejects nanos outright, so read the raw int64
      // and truncate ns → µs (integral DIV — a double roundtrip would
      // lose precision above 2^53).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read
        .parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
