package graft.connector

import org.apache.spark.sql.sources.Filter

/** Client-side mutation surface — the reference reaches ClickHouse
  * mutations (`ALTER TABLE … UPDATE/DELETE`) through raw SQL execute
  * (`clickhouse-arrow/src/client.rs:643` `query_raw`, e2e in its mutation
  * tests). DELETE rides the DSv2 `SupportsDelete` path on [[CHTable]];
  * UPDATE has no DSv2 hook, so it's a direct helper compiling through the
  * same literal/filter translator as scan pushdown — non-compilable
  * filters or values reject the whole mutation (never a partial or
  * wrong-scope update).
  */
object Mutations {

  /** `ALTER TABLE t UPDATE col = value, … WHERE cond`. Values accept the
    * same Scala/Java types `CHSql.litOpt` knows (numbers, strings,
    * date/time, binary, null). The mutation runs server-side; Spark never
    * sees the rows.
    */
  def updateWhere(
      url: String,
      table: String,
      database: Option[String],
      assignments: Map[String, Any],
      where: Seq[Filter],
      auth: CHAuth = CHAuth.none): Unit = {
    require(assignments.nonEmpty, "updateWhere: no assignments")
    val sets = assignments.toSeq.map { case (colName, v) =>
      val lit = CHSql.litOpt(v).getOrElse(
        throw new IllegalArgumentException(s"updateWhere: no literal form for $colName = $v"))
      s"${CHSql.ident(colName)} = $lit"
    }
    val conds = where.map(f => CHSql.compileFilter(f).getOrElse(
      throw new IllegalArgumentException(s"updateWhere: filter not compilable: $f")))
    val cond = if (conds.isEmpty) "1" else conds.map(c => s"($c)").mkString(" AND ")
    CHHttp.execute(url,
      s"ALTER TABLE ${CHSql.tableRef(table, database)} UPDATE ${sets.mkString(", ")} WHERE $cond",
      auth)
  }

  /** CH `EXCHANGE TABLES a AND b` — the atomic two-way swap behind
    * blue/green table rollovers (stage into `t_new`, EXCHANGE, drop).
    * ClickHouse does this atomically server-side; over the plain-SQL
    * channel the swap decomposes into three RENAMEs through a temp name,
    * so a concurrent reader can observe the intermediate state — callers
    * needing atomicity gate reads on a catalog flag (documented, not
    * hidden).
    */
  def exchangeTables(url: String, a: String, b: String, database: Option[String] = None,
      auth: CHAuth = CHAuth.none): Unit = {
    def ref(t: String) = CHSql.tableRef(t, database)
    val tmp = s"${a}__xchg_tmp"
    CHHttp.execute(url, s"RENAME TABLE ${ref(a)} TO ${ref(tmp)}", auth)
    CHHttp.execute(url, s"RENAME TABLE ${ref(b)} TO ${ref(a)}", auth)
    CHHttp.execute(url, s"RENAME TABLE ${ref(tmp)} TO ${ref(b)}", auth)
  }

  /** CH `OPTIMIZE TABLE [FINAL] [DEDUPLICATE]` — force a server-side
    * merge (the reference reaches it through raw SQL, `client.rs:643`).
    * A maintenance passthrough: the server does the work; file-level
    * compaction of OUR parquet layouts is `sources/Formats` `OPTIMIZE`
    * (`b_src14_compaction`). */
  def optimizeTable(
      url: String, table: String, database: Option[String] = None,
      finalMerge: Boolean = false, deduplicate: Boolean = false,
      auth: CHAuth = CHAuth.none): Unit = {
    val suffix =
      (if (finalMerge) " FINAL" else "") + (if (deduplicate) " DEDUPLICATE" else "")
    CHHttp.execute(url, s"OPTIMIZE TABLE ${CHSql.tableRef(table, database)}$suffix", auth)
  }
}
