package graft.connector

import java.net.HttpURLConnection
import java.util.concurrent.ConcurrentHashMap

import javax.net.ssl.{HttpsURLConnection, SSLContext, SSLSocketFactory, TrustManagerFactory, X509TrustManager}

import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Connector credentials + TLS configuration (SURVEY §2.1 A19 tail) —
  * the Spark-side surface of the reference's auth options: every HTTP
  * request carries `X-ClickHouse-User` / `X-ClickHouse-Key` /
  * `X-ClickHouse-Database` when set (reference
  * `clickhouse-arrow/src/http/client.rs:44-66` `default_headers`;
  * builder surface `src/client/builder.rs:495,522` `with_username`/
  * `with_password`, `:347` `with_tls`, `cafile`
  * `src/client/options.rs:61`).
  *
  * DSv2 options:
  *  - `user` / `password` — credential headers on every request;
  *  - `database` — doubles as the SQL qualifier (existing behavior) AND
  *    the `X-ClickHouse-Database` header, so unqualified server-side
  *    statements resolve in the right database like the reference;
  *  - `https://` URLs work as-is against a trusted certificate;
  *  - `sslCaCert` — path to a PEM CA certificate to trust instead of
  *    the JVM default store (the reference's `cafile`); full hostname
  *    verification stays ON;
  *  - `sslInsecure=true` — skip certificate AND hostname verification.
  *    Test/dev only, never production: it removes the protection TLS
  *    exists to provide (documented the same way reqwest marks its
  *    `danger_accept_invalid_certs`).
  *
  * Serializable by construction (plain strings), so it rides inside
  * [[CHInputPartition]] to executor tasks; SSL machinery is rebuilt
  * per-JVM through a small cache, never serialized.
  */
final case class CHAuth(
    user: Option[String] = None,
    password: Option[String] = None,
    database: Option[String] = None,
    sslCaCert: Option[String] = None,
    sslInsecure: Boolean = false)
    extends Serializable {

  /** Redacted: the case-class default would print the plaintext password
    * into Spark task descriptions, exception messages and logs (the JDBC
    * connector redaction convention). */
  override def toString: String =
    s"CHAuth(user=$user, password=${password.map(_ => "***")}, " +
      s"database=$database, sslCaCert=$sslCaCert, sslInsecure=$sslInsecure)"

  /** Request headers this config contributes (reference
    * `http/client.rs:44-66` emits exactly these three, each only when
    * set). */
  def headers: Seq[(String, String)] =
    user.map("X-ClickHouse-User" -> _).toSeq ++
      password.map("X-ClickHouse-Key" -> _).toSeq ++
      database.map("X-ClickHouse-Database" -> _).toSeq

  /** Apply headers + TLS config to an outgoing connection. */
  def configure(conn: HttpURLConnection): Unit = {
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    conn match {
      case https: HttpsURLConnection =>
        if (sslInsecure) {
          https.setSSLSocketFactory(CHAuth.insecureFactory)
          https.setHostnameVerifier((_, _) => true)
        } else sslCaCert.foreach { pem =>
          https.setSSLSocketFactory(CHAuth.caFactory(pem))
        }
      case _ => ()
    }
  }
}

object CHAuth {

  val none: CHAuth = CHAuth()

  def fromOptions(options: CaseInsensitiveStringMap): CHAuth = CHAuth(
    Option(options.get("user")),
    Option(options.get("password")),
    Option(options.get("database")),
    Option(options.get("sslCaCert")),
    options.getBoolean("sslInsecure", false))

  // ---- TLS plumbing: one SSLSocketFactory per CA file per JVM (executor
  // tasks hit this on every partition read — the handshake context must
  // not be rebuilt per request, and can never be serialized)

  // keyed on (path → content hash): a rotated CA certificate at the same
  // path is re-read when the BYTES change, not just the mtime — mtime has
  // second-or-coarser granularity on some filesystems, so a CA rotated
  // twice within one tick (or swapped via an mtime-preserving rename)
  // would pin a stale trust store for the executor's lifetime (ADVICE
  // r14). PEM files are a few KB: one read + SHA-256 per request is
  // noise next to the TLS handshake the cached factory avoids;
  // superseded entries are evicted (one live factory per path)
  private val caFactories = new ConcurrentHashMap[String, (String, SSLSocketFactory)]()

  /** Trust exactly the CA certificate(s) in the PEM file (the reference's
    * `cafile`); standard hostname verification still applies. */
  private[connector] def caFactory(pemPath: String): SSLSocketFactory = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(pemPath))
    val digest = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-256").digest(bytes))
    caFactories.compute(pemPath, (path, prev) =>
      if (prev != null && prev._1 == digest) prev
      else (digest, buildCaFactory(path, bytes)))._2
  }

  private def buildCaFactory(path: String, pem: Array[Byte]): SSLSocketFactory = {
      val cf = java.security.cert.CertificateFactory.getInstance("X.509")
      // parse the bytes the digest was computed over (no re-read TOCTOU)
      val in = new java.io.ByteArrayInputStream(pem)
      val certs =
        try cf.generateCertificates(in)
        finally in.close()
      require(!certs.isEmpty, s"sslCaCert: no certificates found in $path")
      val ks = java.security.KeyStore.getInstance(java.security.KeyStore.getDefaultType)
      ks.load(null, null)
      val it = certs.iterator()
      var i = 0
      while (it.hasNext) { ks.setCertificateEntry(s"ca$i", it.next()); i += 1 }
      val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(ks)
      val ctx = SSLContext.getInstance("TLS")
      ctx.init(null, tmf.getTrustManagers, null)
      ctx.getSocketFactory
  }

  /** Accept-anything factory for `sslInsecure` — built once, used only
    * when the caller explicitly opted out of verification. */
  private[connector] lazy val insecureFactory: SSLSocketFactory = {
    val tm = new X509TrustManager {
      override def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      override def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] = Array.empty
    }
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, Array(tm), new java.security.SecureRandom())
    ctx.getSocketFactory
  }
}
