package graft.connector

import java.io.File
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Golden HTTP traces for the connector contract (VERDICT r16 next-#3,
  * the sandbox-feasible half of "no e2e against a real server"): every
  * other connector test certifies `CHHttp` against `StubCHServer`, so
  * the client and the stub could drift IN TANDEM and every test would
  * stay green. These traces pin the wire contract itself: canonical
  * request lines (method + URI + the contract headers) and body bytes
  * are frozen as committed resources, and responses are served from
  * frozen bytes rather than stub logic — if either side of the client
  * changes what it puts on or expects from the wire, a byte diff fails
  * here with no stub in the loop. The exchange shapes mirror the
  * reference's e2e suite (`clickhouse-arrow/tests/e2e_http.rs:88-433`:
  * query-with-FORMAT-ArrowStream, settings on the URL, compressed
  * transfer incl. the ClickHouse LZ4 frame, insert body, summary
  * header, typed error body).
  *
  * Volatile headers (Host, User-Agent, Connection, Content-Length) are
  * deliberately outside the pin; the pinned subset is exactly the
  * contract surface: Accept-Encoding, Content-Encoding and the
  * X-ClickHouse-* auth/database trio.
  *
  * Regenerate after an INTENDED wire change with
  * `GRAFT_REGEN_TRACES=1 sbt "testOnly graft.connector.TraceSpec"`
  * and commit the diff — the diff IS the wire-change review.
  */
class TraceSpec extends AnyFunSuite {

  private val traceDir = new File("src/test/resources/traces")
  private val regen = sys.env.contains("GRAFT_REGEN_TRACES")

  private def golden(name: String, actual: Array[Byte]): Unit = {
    val f = new File(traceDir, name)
    if (regen) {
      traceDir.mkdirs()
      Files.write(f.toPath, actual)
    } else {
      assert(f.exists(),
        s"missing golden trace $name — run once with GRAFT_REGEN_TRACES=1 and commit")
      val expected = Files.readAllBytes(f.toPath)
      assert(java.util.Arrays.equals(expected, actual),
        s"wire bytes drifted from golden trace $name " +
          s"(expected ${expected.length} bytes, got ${actual.length}) — " +
          "if the change is intended, regenerate with GRAFT_REGEN_TRACES=1")
    }
  }

  // ---- capture server: one exchange, canned response bytes ----

  private val PinnedHeaders = Seq("Accept-encoding", "Content-encoding",
    "X-clickhouse-user", "X-clickhouse-key", "X-clickhouse-database")

  final case class Captured(method: String, uri: String,
      headers: Seq[(String, String)], body: Array[Byte]) {
    /** The pinned text form: request line + contract headers, sorted. */
    def pin: String =
      (s"$method $uri" +: headers.map { case (k, v) => s"$k: $v" }.sorted)
        .mkString("", "\n", "\n")
  }

  private def withServer(status: Int, respHeaders: Seq[(String, String)],
      respBody: Array[Byte])(f: String => Unit): Captured = {
    @volatile var cap: Captured = null
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", (x: HttpExchange) => {
      val hs = PinnedHeaders.flatMap { k =>
        Option(x.getRequestHeaders.getFirst(k)).map(v => (k, v))
      }
      cap = Captured(x.getRequestMethod, x.getRequestURI.toString, hs,
        x.getRequestBody.readAllBytes())
      respHeaders.foreach { case (k, v) => x.getResponseHeaders.add(k, v) }
      x.sendResponseHeaders(status, if (respBody.isEmpty) -1 else respBody.length.toLong)
      if (respBody.nonEmpty) x.getResponseBody.write(respBody)
      x.close()
    })
    srv.start()
    try f(s"http://127.0.0.1:${srv.getAddress.getPort}")
    finally srv.stop(0)
    assert(cap != null, "the client never reached the trace server")
    cap
  }

  // ---- canonical payload: a tiny 2-column result/insert batch ----

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true)))
  private val rows = Vector(
    InternalRow(1L, UTF8String.fromString("alpha")),
    InternalRow(2L, UTF8String.fromString("beta")),
    InternalRow(3L, UTF8String.fromString("gamma")))
  private def ipcBytes: Array[Byte] = ArrowCodec.encode(schema, rows.iterator)

  private def decodeNames(in: java.io.InputStream): Seq[(Long, String)] = {
    val (sch, got) = ArrowCodec.decode(in.readAllBytes())
    assert(sch.fieldNames.toSeq == Seq("id", "name"))
    got.map(r => (r.getLong(0), r.getUTF8String(1).toString))
  }
  private val expectedRows = Seq(1L -> "alpha", 2L -> "beta", 3L -> "gamma")

  test("trace: plain ArrowStream query — request line, response bytes, summary header") {
    golden("select_response.arrow", ipcBytes) // the frozen response body
    var summary: CHHttp.Summary = null
    var got: Seq[(Long, String)] = null
    val cap = withServer(200,
      Seq("X-ClickHouse-Summary" -> """{"read_rows":"3","written_rows":"0"}"""),
      ipcBytes) { url =>
      val (in, s) = CHHttp.queryArrowWithSummary(url, "SELECT id, name FROM t ORDER BY id")
      summary = s
      got = decodeNames(in)
    }
    golden("query_plain.req.txt", cap.pin.getBytes(UTF_8))
    assert(got == expectedRows)
    assert(summary == CHHttp.Summary(3L, 0L))
  }

  test("trace: per-query settings and auth headers ride the canonical URL/header form") {
    val auth = CHAuth(user = Some("analyst"), password = Some("s3cret"),
      database = Some("fleet"))
    val cap = withServer(200, Nil, ipcBytes) { url =>
      val in = CHHttp.queryArrow(url, "SELECT 1",
        settings = Seq("max_threads" -> "4", "join_use_nulls" -> "1"), auth = auth)
      in.readAllBytes()
    }
    golden("query_settings_auth.req.txt", cap.pin.getBytes(UTF_8))
  }

  test("trace: gzip-compressed transfer — negotiation pinned, frozen gzip body decodes") {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos, 1 << 16)
    gz.write(ipcBytes); gz.close()
    golden("select_response.arrow.gz", bos.toByteArray)
    var got: Seq[(Long, String)] = null
    val cap = withServer(200, Seq("Content-Encoding" -> "gzip"), bos.toByteArray) { url =>
      got = decodeNames(CHHttp.queryArrow(url, "SELECT id, name FROM t", codec = "gzip"))
    }
    golden("query_gzip.req.txt", cap.pin.getBytes(UTF_8))
    assert(got == expectedRows)
  }

  test("trace: ClickHouse-LZ4-framed transfer — frozen frame (CityHash128 checksum) decodes") {
    val bos = new java.io.ByteArrayOutputStream()
    val lz = new CHLz4.FramedOutputStream(bos)
    lz.write(ipcBytes); lz.close()
    golden("select_response.arrow.chlz4", bos.toByteArray)
    var got: Seq[(Long, String)] = null
    val cap = withServer(200, Seq("Content-Encoding" -> "lz4"), bos.toByteArray) { url =>
      got = decodeNames(CHHttp.queryArrow(url, "SELECT id, name FROM t", codec = "lz4"))
    }
    golden("query_lz4.req.txt", cap.pin.getBytes(UTF_8))
    assert(got == expectedRows)
  }

  test("trace: insert — request line and the exact IPC body bytes") {
    val cap = withServer(200,
      Seq("X-ClickHouse-Summary" -> """{"read_rows":"0","written_rows":"3"}"""),
      Array.emptyByteArray) { url =>
      CHHttp.insertArrow(url, "INSERT INTO t (id, name)", out => out.write(ipcBytes))
    }
    golden("insert_plain.req.txt", cap.pin.getBytes(UTF_8))
    golden("insert_body.arrow", cap.body)
    assert(java.util.Arrays.equals(cap.body, ipcBytes),
      "the insert body must be the unmodified IPC stream")
  }

  test("trace: LZ4-framed insert — the request body is the frozen CH frame") {
    val cap = withServer(200, Nil, Array.emptyByteArray) { url =>
      CHHttp.insertArrow(url, "INSERT INTO t (id, name)",
        out => out.write(ipcBytes), codec = "lz4")
    }
    golden("insert_lz4.req.txt", cap.pin.getBytes(UTF_8))
    golden("insert_body.arrow.chlz4", cap.body)
    // and the frozen frame must decode back to the exact IPC bytes
    val back = new CHLz4.FramedInputStream(
      new java.io.ByteArrayInputStream(cap.body)).readAllBytes()
    assert(java.util.Arrays.equals(back, ipcBytes))
  }

  test("trace: typed error body — frozen CH error text parses to code/name/severity") {
    val body = "Code: 60. DB::Exception: Table default.nope does not exist. " +
      "(UNKNOWN_TABLE) (version 24.8.1.1)"
    golden("error_unknown_table.resp.txt", body.getBytes(UTF_8))
    val cap = withServer(404, Nil, body.getBytes(UTF_8)) { url =>
      val e = intercept[CHServerException] {
        CHHttp.queryArrow(url, "SELECT * FROM nope")
      }
      assert(e.code == 60)
      assert(e.name == "UNKNOWN_TABLE")
      assert(!e.retryable, "a deterministic schema error must never be retried")
      assert(e.httpStatus == 404)
    }
    golden("error_query.req.txt", cap.pin.getBytes(UTF_8))
  }
}
