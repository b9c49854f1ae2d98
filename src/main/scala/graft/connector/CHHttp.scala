package graft.connector

import java.io.InputStream
import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets

/** Minimal HTTP transport for the connector — the Spark-side counterpart
  * of the reference's HTTP channel (`clickhouse-arrow/src/http/
  * client.rs:22-219`): queries go out as `POST ?query=<sql>` with
  * `FORMAT ArrowStream` appended, results come back as an Arrow IPC
  * stream (`src/http/arrow_stream.rs:17-64`); inserts POST the IPC bytes
  * as the request body. Plain `java.net` — executors need no extra deps.
  */
object CHHttp {

  private def open(url: String, sql: String): HttpURLConnection = {
    val q = URLEncoder.encode(sql, StandardCharsets.UTF_8)
    val conn = URI.create(s"$url/?query=$q").toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(300000)
    conn
  }

  private def failIfError(conn: HttpURLConnection, sql: String): Unit = {
    val code = conn.getResponseCode
    if (code != 200) {
      val err = Option(conn.getErrorStream)
        .map(s => new String(s.readAllBytes(), StandardCharsets.UTF_8)).getOrElse("")
      throw new java.io.IOException(s"HTTP $code for [$sql]: $err")
    }
  }

  /** SELECT returning the response body as an Arrow IPC stream. */
  def queryArrow(url: String, sql: String): InputStream = {
    val conn = open(url, s"$sql FORMAT ArrowStream")
    conn.setDoOutput(true)
    conn.getOutputStream.close()
    failIfError(conn, sql)
    conn.getInputStream
  }

  /** INSERT: IPC bytes produced by `body` stream out as the request body
    * (single deferred flush, like `client/internal.rs:482-535`). */
  def insertArrow(url: String, insertSql: String, body: java.io.OutputStream => Unit): Unit = {
    val conn = openInsert(url, insertSql)
    val out = conn.getOutputStream
    try body(out) finally out.close()
    finishInsert(conn, insertSql)
  }

  /** Open a chunked INSERT connection whose request `OutputStream` the
    * caller writes incrementally — nothing buffers beyond the 1 MiB chunk,
    * so an arbitrarily large partition streams through constant memory.
    * Close the stream, then call [[finishInsert]].
    */
  def openInsert(url: String, insertSql: String): HttpURLConnection = {
    val conn = open(url, s"$insertSql FORMAT ArrowStream")
    conn.setDoOutput(true)
    conn.setChunkedStreamingMode(1 << 20)
    conn
  }

  /** Complete an [[openInsert]] request: check the response status. */
  def finishInsert(conn: HttpURLConnection, insertSql: String): Unit = {
    failIfError(conn, insertSql)
    conn.getInputStream.close()
  }

  /** DDL / commands with no result set. */
  def execute(url: String, sql: String): Unit = {
    val conn = open(url, sql)
    conn.setDoOutput(true)
    conn.getOutputStream.close()
    failIfError(conn, sql)
    conn.getInputStream.close()
  }

  /** Schema probe: `SELECT * ... LIMIT 0` and read the IPC header —
    * the reference's zero-row header block (`client/reader.rs:58`). */
  def fetchSchema(url: String, table: String, database: Option[String]): org.apache.spark.sql.types.StructType = {
    val sql = s"SELECT * FROM ${CHSql.tableRef(table, database)} LIMIT 0"
    val in = queryArrow(url, sql)
    try ArrowCodec.readSchema(in.readAllBytes())
    finally in.close()
  }

  /** `SHOW TABLES` — one Utf8 column of names (A14 equivalent,
    * `src/client.rs:2263-2414`). */
  def listTables(url: String, database: Option[String]): Seq[String] = {
    val sql = database.map(d => s"SHOW TABLES FROM ${CHSql.ident(d)}").getOrElse("SHOW TABLES")
    val in = queryArrow(url, sql)
    try {
      val (_, rows) = ArrowCodec.decode(in.readAllBytes())
      rows.map(_.getUTF8String(0).toString)
    } finally in.close()
  }
}
