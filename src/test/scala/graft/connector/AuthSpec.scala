package graft.connector

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connector authentication + TLS (A19 tail; reference
  * `clickhouse-arrow/src/http/client.rs:44-66` default_headers,
  * builder `with_username`/`with_password`/`with_tls`/`cafile`):
  * credential headers on every request, typed non-retryable auth
  * failures, and a REAL TLS handshake against an https stub with a
  * test-generated CA.
  */
class AuthSpec extends SparkSpec {
  import spark.implicits._

  private def seed(srv: StubCHServer): Unit =
    srv.load("t_auth", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))

  test("A22 cloud wakeup: wakeOnConnect pings a sleeping endpoint awake, then connects") {
    val srv = new StubCHServer
    try {
      seed(srv)
      // an idle "cloud instance": the next 3 requests 503 — the wakeup
      // loop's pings absorb them, then the scan proceeds normally
      srv.sleepFor(3)
      assert(!CHHttp.ping(srv.url), "sleeping stub must fail the first ping")
      val out = spark.read.format("graft-ch")
        .option("url", srv.url).option("table", "t_auth")
        .option("wakeOnConnect", "true")
        .load()
      assert(out.count() === 3)
      assert(CHHttp.ping(srv.url), "stub should answer /ping once awake")
    } finally srv.stop()
  }

  test("A22 cloud wakeup: an endpoint that never wakes fails loudly within the timeout") {
    val srv = new StubCHServer
    try {
      seed(srv)
      srv.sleepFor(1000000)
      val e = intercept[IllegalArgumentException] {
        spark.read.format("graft-ch")
          .option("url", srv.url).option("table", "t_auth")
          .option("wakeOnConnect", "true")
          .option("wakeupTimeoutMs", "600")
          .load()
      }
      assert(e.getMessage.contains("did not answer /ping"), e.getMessage)
    } finally srv.stop()
  }

  test("credential headers ride every request of a scan and a write") {
    val srv = new StubCHServer
    try {
      seed(srv)
      srv.requireAuth("analyst", "s3cret")
      val plain = spark.read.format("graft-ch")
        .option("url", srv.url).option("table", "t_auth")
        .option("user", "analyst").option("password", "s3cret")
        .load()
        .filter(col("id") >= 2)
      assert(plain.count() === 2)
      // every request (schema probe, stats count, data read) carried the
      // credential headers — the reference emits them on each request
      assert(srv.receivedAuth.nonEmpty)
      assert(srv.receivedAuth.forall { case (u, k, _) =>
        u.contains("analyst") && k.contains("s3cret")
      })
      // write path too
      Seq((10L, "x")).toDF("id", "v")
        .write.format("graft-ch")
        .option("url", srv.url).option("table", "t_auth")
        .option("user", "analyst").option("password", "s3cret")
        .mode("append").save()
      assert(srv.rowCount("t_auth") === 4)
    } finally srv.stop()
  }

  test("X-ClickHouse-Database header is emitted when database is set") {
    val srv = new StubCHServer
    try {
      seed(srv)
      // the stub's table map is unqualified, so use default (matches the
      // SQL qualifier the connector also emits)
      val n = spark.read.format("graft-ch")
        .option("url", srv.url).option("table", "t_auth")
        .option("database", "default")
        .load().count()
      assert(n === 3)
      assert(srv.receivedAuth.exists { case (_, _, db) => db.contains("default") })
    } finally srv.stop()
  }

  test("wrong key → typed 403/516, not retried") {
    val srv = new StubCHServer
    try {
      seed(srv)
      srv.requireAuth("analyst", "s3cret")
      val before = srv.receivedAuth.size
      val ex = intercept[CHServerException] {
        spark.read.format("graft-ch")
          .option("url", srv.url).option("table", "t_auth")
          .option("user", "analyst").option("password", "WRONG")
          .load()
      }
      assert(ex.httpStatus === 403)
      assert(ex.code === 516)
      assert(ex.name === "AUTHENTICATION_FAILED")
      assert(!ex.retryable,
        "re-presenting identical bad credentials is deterministic — must not retry")
      // exactly ONE request reached the server: the transport did not
      // hammer the auth path
      assert(srv.receivedAuth.size === before + 1)
    } finally srv.stop()
  }

  test("missing credentials against an auth-required endpoint → 403/516") {
    val srv = new StubCHServer
    try {
      seed(srv)
      srv.requireAuth("analyst", "s3cret")
      val ex = intercept[CHServerException] {
        spark.read.format("graft-ch")
          .option("url", srv.url).option("table", "t_auth")
          .load()
      }
      assert(ex.code === 516 && !ex.retryable)
    } finally srv.stop()
  }

  test("auth error family is non-retryable; transient families still retry") {
    // policy pins (the classifier keeps the reference's Protocol severity
    // for auth codes — error_codes.rs:160-165 — but retry excludes them)
    for (code <- Seq(516, 192, 193, 194, 195, 497)) {
      val e = CHError.parse(403, "SELECT 1", s"Code: $code. DB::Exception: x")
      assert(e.severity === CHError.Protocol)
      assert(!e.retryable, s"code $code must not retry")
    }
    val transient = CHError.parse(500, "SELECT 1", "Code: 210. DB::Exception: x")
    assert(transient.retryable, "NETWORK_ERROR stays retryable")
  }

  // ---- TLS: generate a self-signed server cert with keytool (JDK tool),
  // serve https from the stub, and connect with the exported CA PEM —
  // a genuine handshake with full certificate + hostname verification,
  // the `with_tls` + `cafile` path of the reference builder.

  private def makeTls(): (javax.net.ssl.SSLContext, String) = {
    import scala.sys.process._
    val dir = Files.createTempDirectory("graft-tls").toFile
    dir.deleteOnExit()
    val ks = new java.io.File(dir, "server.p12").getAbsolutePath
    val pem = new java.io.File(dir, "ca.pem").getAbsolutePath
    val gen = Seq("keytool", "-genkeypair", "-alias", "stub", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "2", "-dname", "CN=127.0.0.1",
      "-ext", "SAN=IP:127.0.0.1", "-keystore", ks, "-storetype", "PKCS12",
      "-storepass", "changeit").!
    assert(gen === 0, "keytool -genkeypair failed")
    val exp = Seq("keytool", "-exportcert", "-alias", "stub", "-keystore", ks,
      "-storepass", "changeit", "-rfc", "-file", pem).!
    assert(exp === 0, "keytool -exportcert failed")
    val store = java.security.KeyStore.getInstance("PKCS12")
    val in = new java.io.FileInputStream(ks)
    try store.load(in, "changeit".toCharArray) finally in.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(store, "changeit".toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    (ctx, pem)
  }

  test("https endpoint: full TLS handshake with sslCaCert; refused without") {
    val (ctx, pem) = makeTls()
    val srv = new StubCHServer(Some(ctx))
    try {
      seed(srv)
      assert(srv.url.startsWith("https://"))
      // trusted CA → handshake + scan succeed, hostname verified (the
      // cert's SAN is IP:127.0.0.1)
      val n = spark.read.format("graft-ch")
        .option("url", srv.url).option("table", "t_auth")
        .option("sslCaCert", pem)
        .load().count()
      assert(n === 3)
      // no CA configured → the JVM default trust store refuses the
      // self-signed cert: the connector must NOT silently trust it
      val ex = intercept[Exception] {
        spark.read.format("graft-ch")
          .option("url", srv.url).option("table", "t_auth")
          .load()
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(ex).exists(_.isInstanceOf[javax.net.ssl.SSLHandshakeException]))
      // explicit insecure opt-out connects (test/dev only — documented)
      val n2 = spark.read.format("graft-ch")
        .option("url", srv.url).option("table", "t_auth")
        .option("sslInsecure", "true")
        .load().count()
      assert(n2 === 3)
    } finally srv.stop()
  }

  test("https + auth compose: credentials over TLS") {
    val (ctx, pem) = makeTls()
    val srv = new StubCHServer(Some(ctx))
    try {
      seed(srv)
      srv.requireAuth("analyst", "s3cret")
      val n = spark.read.format("graft-ch")
        .option("url", srv.url).option("table", "t_auth")
        .option("sslCaCert", pem)
        .option("user", "analyst").option("password", "s3cret")
        .load().count()
      assert(n === 3)
    } finally srv.stop()
  }

  test("catalog credentials propagate to table scans") {
    val srv = new StubCHServer
    try {
      seed(srv)
      srv.requireAuth("analyst", "s3cret")
      val cat = "chauth"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.url", srv.url)
      spark.conf.set(s"spark.sql.catalog.$cat.user", "analyst")
      spark.conf.set(s"spark.sql.catalog.$cat.password", "s3cret")
      try {
        val n = spark.sql(s"SELECT * FROM $cat.t_auth").count()
        assert(n === 3)
        assert(srv.receivedAuth.forall { case (u, k, _) =>
          u.contains("analyst") && k.contains("s3cret")
        })
      } finally {
        spark.conf.unset(s"spark.sql.catalog.$cat")
        spark.conf.unset(s"spark.sql.catalog.$cat.url")
        spark.conf.unset(s"spark.sql.catalog.$cat.user")
        spark.conf.unset(s"spark.sql.catalog.$cat.password")
      }
    } finally srv.stop()
  }

  test("StubCHServer.load refuses beyond the fixture cap") {
    val srv = new StubCHServer
    try {
      val big = spark.range(StubCHServer.MaxFixtureRows.toLong + 10).toDF("id")
      val ex = intercept[IllegalArgumentException] { srv.load("huge", big) }
      assert(ex.getMessage.contains("fixture cap"))
    } finally srv.stop()
  }
}
