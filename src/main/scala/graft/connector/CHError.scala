package graft.connector

/** Typed server-error surface (SURVEY §2.1 A-layer; reference
  * `clickhouse-arrow/src/native/error_codes.rs:527` code table,
  * `:174` severity classifier): a ClickHouse HTTP error body —
  * `Code: 60. DB::Exception: Table x doesn't exist. (UNKNOWN_TABLE)` —
  * parses into a [[CHServerException]] carrying the numeric code, the
  * symbolic name and a severity class, instead of surfacing as an opaque
  * string. Severity drives retry policy at the call sites: `Server` and
  * the transient `Protocol` members are the retry candidates; `Syntax`/
  * `Query`/`Data` failures are deterministic and must NOT be retried
  * (re-running a malformed insert just duplicates work at 100-TB scale).
  */
object CHError {

  sealed trait Severity { def retryable: Boolean = false }
  case object Syntax extends Severity
  case object Query extends Severity
  case object Data extends Severity
  case object Protocol extends Severity { override def retryable = true }
  case object Server extends Severity { override def retryable = true }
  case object Unknown extends Severity

  /** The classified subset of the server code table (reference
    * `error_codes.rs:527-760` keeps 231 codes; these are the ones its
    * severity classifier distinguishes plus the commonly-hit rest). */
  val names: Map[Int, String] = Map(
    0 -> "OK", 1 -> "UNSUPPORTED_METHOD", 2 -> "UNSUPPORTED_PARAMETER",
    3 -> "UNEXPECTED_END_OF_FILE", 6 -> "CANNOT_PARSE_TEXT",
    7 -> "INCORRECT_NUMBER_OF_COLUMNS", 8 -> "THERE_IS_NO_COLUMN",
    9 -> "SIZES_OF_COLUMNS_DOESNT_MATCH", 10 -> "NOT_FOUND_COLUMN_IN_BLOCK",
    15 -> "DUPLICATE_COLUMN", 16 -> "NO_SUCH_COLUMN_IN_TABLE",
    19 -> "SIZE_OF_FIXED_STRING_DOESNT_MATCH", 20 -> "NUMBER_OF_COLUMNS_DOESNT_MATCH",
    25 -> "CANNOT_PARSE_ESCAPE_SEQUENCE", 26 -> "CANNOT_PARSE_QUOTED_STRING",
    27 -> "CANNOT_PARSE_INPUT_ASSERTION_FAILED", 32 -> "ATTEMPT_TO_READ_AFTER_EOF",
    33 -> "CANNOT_READ_ALL_DATA", 34 -> "TOO_MANY_ARGUMENTS_FOR_FUNCTION",
    35 -> "TOO_FEW_ARGUMENTS_FOR_FUNCTION", 36 -> "BAD_ARGUMENTS",
    38 -> "CANNOT_PARSE_DATE", 39 -> "TOO_LARGE_SIZE_COMPRESSED",
    40 -> "CHECKSUM_DOESNT_MATCH", 41 -> "CANNOT_PARSE_DATETIME",
    42 -> "NUMBER_OF_ARGUMENTS_DOESNT_MATCH", 43 -> "ILLEGAL_TYPE_OF_ARGUMENT",
    44 -> "ILLEGAL_COLUMN", 46 -> "UNKNOWN_FUNCTION", 47 -> "UNKNOWN_IDENTIFIER",
    48 -> "NOT_IMPLEMENTED", 49 -> "LOGICAL_ERROR", 50 -> "UNKNOWN_TYPE",
    53 -> "TYPE_MISMATCH", 57 -> "TABLE_ALREADY_EXISTS",
    60 -> "UNKNOWN_TABLE", 62 -> "SYNTAX_ERROR", 63 -> "UNKNOWN_AGGREGATE_FUNCTION",
    69 -> "ARGUMENT_OUT_OF_BOUND", 70 -> "CANNOT_CONVERT_TYPE",
    72 -> "CANNOT_PARSE_NUMBER", 73 -> "UNKNOWN_FORMAT",
    78 -> "UNKNOWN_TYPE_OF_QUERY", 80 -> "INCORRECT_QUERY",
    81 -> "UNKNOWN_DATABASE", 82 -> "DATABASE_ALREADY_EXISTS",
    89 -> "UNKNOWN_COMPRESSION_METHOD", 92 -> "EMPTY_DATA_PASSED",
    93 -> "UNKNOWN_AGGREGATED_DATA_VARIANT", 95 -> "CANNOT_READ_FROM_SOCKET",
    96 -> "CANNOT_WRITE_TO_SOCKET", 99 -> "UNKNOWN_PACKET_FROM_CLIENT",
    100 -> "UNKNOWN_PACKET_FROM_SERVER", 101 -> "UNEXPECTED_PACKET_FROM_CLIENT",
    102 -> "UNEXPECTED_PACKET_FROM_SERVER", 104 -> "TOO_SMALL_BUFFER_SIZE",
    108 -> "NO_DATA_TO_INSERT", 109 -> "CANNOT_BLOCK_SIGNAL",
    110 -> "CANNOT_UNBLOCK_SIGNAL", 111 -> "CANNOT_MANIPULATE_SIGSET",
    112 -> "CANNOT_WAIT_FOR_SIGNAL", 113 -> "THERE_IS_NO_SESSION",
    114 -> "CANNOT_CLOCK_GETTIME", 115 -> "UNKNOWN_SETTING",
    117 -> "INCORRECT_DATA", 119 -> "ENGINE_REQUIRED",
    124 -> "INCORRECT_ELEMENT_OF_SET", 128 -> "TOO_LARGE_ARRAY_SIZE",
    131 -> "TOO_LARGE_STRING_SIZE", 153 -> "ILLEGAL_DIVISION",
    158 -> "TOO_MANY_ROWS", 159 -> "TIMEOUT_EXCEEDED", 160 -> "TOO_SLOW",
    161 -> "TOO_MANY_COLUMNS", 162 -> "TOO_DEEP_SUBQUERIES",
    164 -> "READONLY", 170 -> "BAD_GET", 181 -> "ILLEGAL_FINAL",
    182 -> "CANNOT_PARSE_DOMAIN_VALUE_FROM_STRING",
    190 -> "SIZES_OF_ARRAYS_DONT_MATCH", 191 -> "SET_SIZE_LIMIT_EXCEEDED",
    192 -> "UNKNOWN_USER", 193 -> "WRONG_PASSWORD", 194 -> "REQUIRED_PASSWORD",
    195 -> "IP_ADDRESS_NOT_ALLOWED", 198 -> "DNS_ERROR",
    201 -> "QUOTA_EXCEEDED", 202 -> "TOO_MANY_SIMULTANEOUS_QUERIES",
    209 -> "SOCKET_TIMEOUT", 210 -> "NETWORK_ERROR", 211 -> "EMPTY_QUERY",
    216 -> "QUERY_WITH_SAME_ID_IS_ALREADY_RUNNING",
    217 -> "CLIENT_HAS_CONNECTED_TO_WRONG_PORT", 218 -> "TABLE_IS_DROPPED",
    219 -> "DATABASE_NOT_EMPTY", 229 -> "QUERY_IS_TOO_LARGE",
    236 -> "ABORTED", 239 -> "CANNOT_MUNMAP", 240 -> "CANNOT_MREMAP",
    241 -> "MEMORY_LIMIT_EXCEEDED", 242 -> "TABLE_IS_READ_ONLY",
    243 -> "NOT_ENOUGH_SPACE", 246 -> "CORRUPTED_DATA",
    252 -> "TOO_MANY_PARTS", 270 -> "CANNOT_COMPRESS", 271 -> "CANNOT_DECOMPRESS",
    290 -> "LIMIT_EXCEEDED", 291 -> "DATABASE_ACCESS_DENIED",
    349 -> "CANNOT_PARSE_BOOL", 386 -> "NO_COMMON_TYPE",
    394 -> "QUERY_WAS_CANCELLED", 396 -> "TOO_MANY_ROWS_OR_BYTES",
    403 -> "INVALID_JOIN_ON_EXPRESSION", 407 -> "DECIMAL_OVERFLOW",
    432 -> "UNKNOWN_CODEC", 439 -> "CANNOT_SCHEDULE_TASK",
    473 -> "ACCESS_DENIED", 497 -> "ACCESS_DENIED",
    516 -> "AUTHENTICATION_FAILED", 1002 -> "UNKNOWN_ERROR")

  private val syntaxNames = Set(
    "SYNTAX_ERROR", "ENGINE_REQUIRED", "CANNOT_PARSE_TEXT",
    "CANNOT_PARSE_ESCAPE_SEQUENCE", "CANNOT_PARSE_QUOTED_STRING",
    "CANNOT_PARSE_DATE", "CANNOT_PARSE_DATETIME", "CANNOT_PARSE_NUMBER",
    "CANNOT_PARSE_INPUT_ASSERTION_FAILED",
    "CANNOT_PARSE_DOMAIN_VALUE_FROM_STRING", "CANNOT_PARSE_BOOL",
    "ILLEGAL_SYNTAX_FOR_DATA_TYPE", "ILLEGAL_SYNTAX_FOR_CODEC_TYPE",
    "MULTIPLE_EXPRESSIONS_FOR_ALIAS", "INVALID_TEMPLATE_FORMAT")

  private val protocolNames = Set(
    "UNKNOWN_COMPRESSION_METHOD", "CHECKSUM_DOESNT_MATCH",
    "UNKNOWN_PACKET_FROM_CLIENT", "UNKNOWN_PACKET_FROM_SERVER",
    "UNEXPECTED_PACKET_FROM_CLIENT", "UNEXPECTED_PACKET_FROM_SERVER",
    "TOO_SMALL_BUFFER_SIZE", "CANNOT_READ_FROM_SOCKET",
    "CANNOT_WRITE_TO_SOCKET", "SOCKET_TIMEOUT", "NETWORK_ERROR",
    "CLIENT_HAS_CONNECTED_TO_WRONG_PORT", "DNS_ERROR",
    "UNKNOWN_USER", "WRONG_PASSWORD", "REQUIRED_PASSWORD",
    "IP_ADDRESS_NOT_ALLOWED", "ACCESS_DENIED", "AUTHENTICATION_FAILED")

  private val dataNames = Set(
    "TOO_LARGE_SIZE_COMPRESSED", "DUPLICATE_COLUMN",
    "SIZES_OF_COLUMNS_DOESNT_MATCH", "NUMBER_OF_COLUMNS_DOESNT_MATCH",
    "UNEXPECTED_END_OF_FILE", "SIZE_OF_FIXED_STRING_DOESNT_MATCH",
    "CANNOT_READ_ALL_DATA", "INCORRECT_DATA", "INCORRECT_ELEMENT_OF_SET",
    "CORRUPTED_DATA", "SIZES_OF_ARRAYS_DONT_MATCH", "TOO_LARGE_STRING_SIZE",
    "DECIMAL_OVERFLOW", "EMPTY_DATA_PASSED", "NO_DATA_TO_INSERT",
    "CANNOT_COMPRESS", "CANNOT_DECOMPRESS")

  private val serverNames = Set(
    "CANNOT_BLOCK_SIGNAL", "CANNOT_UNBLOCK_SIGNAL", "CANNOT_MANIPULATE_SIGSET",
    "CANNOT_WAIT_FOR_SIGNAL", "THERE_IS_NO_SESSION", "CANNOT_CLOCK_GETTIME",
    "NOT_ENOUGH_SPACE", "CANNOT_ALLOCATE_MEMORY", "CANNOT_MREMAP",
    "CANNOT_MUNMAP", "SERVER_OVERLOADED", "CANNOT_SCHEDULE_TASK",
    "TOO_MANY_SIMULTANEOUS_QUERIES", "TOO_MANY_PARTS")

  /** Credential/authorization failures. The reference's severity
    * classifier files these under Protocol ("treated like protocol
    * errors", `error_codes.rs:160-165,210-215`) and this classifier
    * mirrors that — but the RETRY policy must not: re-presenting the
    * same bad credentials is deterministic (and hammering a real
    * server's auth path can trip lockouts/rate limits), so
    * [[CHServerException.retryable]] excludes them explicitly. */
  val authNames: Set[String] = Set(
    "UNKNOWN_USER", "WRONG_PASSWORD", "REQUIRED_PASSWORD",
    "IP_ADDRESS_NOT_ALLOWED", "ACCESS_DENIED", "AUTHENTICATION_FAILED")

  def nameOf(code: Int): String = names.getOrElse(code, "UNKNOWN_ERROR")

  def severityOf(code: Int): Severity = {
    val n = nameOf(code)
    if (syntaxNames(n)) Syntax
    else if (protocolNames(n)) Protocol
    else if (dataNames(n)) Data
    else if (serverNames(n)) Server
    else if (names.contains(code)) Query // the classifier's broad middle tier
    else Unknown
  }

  // `Code: 60. DB::Exception: ... ` — the stable prefix of every CH HTTP
  // error body (both the real server and the stub emit it)
  private val codeRe = java.util.regex.Pattern.compile("^\\s*Code:\\s*(\\d+)\\.")

  /** Parse an HTTP error body into a typed exception; bodies without the
    * `Code: N.` prefix (a proxy error, a crash page) fall back to
    * [[Unknown]] with code -1 — never swallowed, never misclassified. */
  def parse(httpStatus: Int, sql: String, body: String): CHServerException = {
    val m = codeRe.matcher(body)
    val code = if (m.find()) m.group(1).toInt else -1
    new CHServerException(httpStatus, code, nameOf(code),
      if (code >= 0) severityOf(code) else Unknown, sql, body)
  }
}

/** A server-side failure with its ClickHouse code, symbolic name and
  * severity class. Extends IOException so existing transport-level
  * handlers (catalog NoSuchTable translation, scan retries) keep working.
  */
final class CHServerException(
    val httpStatus: Int,
    val code: Int,
    val name: String,
    val severity: CHError.Severity,
    val sql: String,
    val body: String)
    extends java.io.IOException(
      s"ClickHouse error $code ($name, ${severity.getClass.getSimpleName.stripSuffix("$")}" +
        // the EFFECTIVE retry decision (severity minus the auth family),
        // so a 516 never logs as ", retryable" when it won't be retried
        s"${if (severity.retryable && !CHError.authNames(name)) ", retryable" else ""}) for [$sql]: $body") {
  /** Transient per severity class, EXCEPT the auth family: a wrong
    * key fails identically on every attempt (see [[CHError.authNames]]). */
  def retryable: Boolean = severity.retryable && !CHError.authNames(name)
}
