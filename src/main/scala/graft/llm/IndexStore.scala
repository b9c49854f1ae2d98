package graft.llm

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Cross-application persistence for the standing indexes — the half of
  * "standing" that survives a restart (VERDICT r13 next-#1).
  *
  * Each index is stored as a parquet table under `<path>/data` plus a
  * flat JSON metadata sidecar `<path>/_index_meta.json` carrying the
  * model state a probe needs but a table can't hold: seeds and bit
  * widths, k-means centroids, PQ codebooks and subspace bounds, the BM25
  * `(n, Σdl)` corpus scalars, band parameters. That is the artifact
  * layout a production deployment materializes (cell/bucket-partitioned
  * parquet + a manifest); the reference's analog is the client fetching
  * schemas/artifacts from the server at connect
  * (`clickhouse-arrow/src/client.rs:2263-2414`).
  *
  * The COLD path is structural, not conventional: the load functions
  * take only `(session, path)`, so a probe over a loaded index CANNOT
  * consult the per-application [[SessionMemo]]s or model caches — every
  * model parameter rides the sidecar. Cold-probe certification rows run
  * the load+probe in a `newSession()` clone whose SessionMemo state is
  * empty by construction (the memo keys on the session object).
  *
  * All IO goes through the Hadoop FileSystem API, so `path` may be
  * local, HDFS or an object store — the same code serves `local[32]`
  * certification and a 1000-executor deployment.
  *
  * Metadata doubles round-trip EXACTLY: values are encoded with
  * `java.lang.Double.toString`, whose shortest-decimal output parses
  * back to the identical bit pattern — a reloaded centroid/codebook is
  * bit-equal to the trained one, so cold probes can be certified against
  * warm probes by row-set identity, not tolerance.
  */
object IndexStore {

  /** Write the index table (+ optional partition columns — the
    * cell/bucket layout that turns probes into partition-pruned scans at
    * scale) and its metadata sidecar. Overwrite is idempotent: the swap
    * pattern for refresh writes a new artifact beside the old and
    * renames (see [[swap]]). */
  /** Artifact format version, stamped into every sidecar — the loader
    * of a future incompatible layout gets a named mismatch instead of a
    * silent misread. */
  val FormatVersion = "1"

  def save(index: DataFrame, path: String, meta: Map[String, String],
      partitionBy: Seq[String] = Nil): Unit = {
    val w = index.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(s"$path/data")
    writeMeta(index.sparkSession, s"$path/_index_meta.json",
      meta + ("format" -> FormatVersion,
        "partitions" -> partitionBy.mkString(",")))
  }

  /** Disk-level index MAINTENANCE — the on-artifact half of the merge
    * contract: APPEND an admitted batch's rows into the stored layout
    * (same partition columns, read from the sidecar). Zero shuffle of
    * the standing data, exactly the "parquet append" every merge
    * function's scaladoc promises. The caller dedups admissions first
    * (the DataFrame merges' anti-join/dropDuplicates guard) — a raw
    * file append cannot. */
  def append(batch: DataFrame, path: String): Unit = {
    val parts = partitionsOf(readMeta(batch.sparkSession, path))
    val w = batch.write.mode("append")
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(s"$path/data")
  }

  /** COMPACTION — appends fragment the artifact one file per touched
    * partition per batch; periodic compaction rewrites each partition
    * into one task's output (hash repartition on the partition columns;
    * AQE coalesces small cells) and EXCHANGES it in via [[swap]], so
    * readers never see a half-compacted artifact. Mirrors the table
    * compaction operator (`b_src14`) applied to index artifacts. */
  def compact(s: SparkSession, path: String,
      targetBytes: Long = 128L << 20): Unit = {
    val meta = readMeta(s, path)
    val parts = partitionsOf(meta)
    val df = load(s, path)
    val staged = path + ".compacting"
    val compacted =
      if (parts.nonEmpty) df.repartition(parts.map(org.apache.spark.sql.functions.col): _*)
      else {
        // unpartitioned artifacts coalesce to ceil(bytes/target) files
        // (the Formats.compact sizing) — never a single file at scale
        val bytes = {
          val p = new Path(s"$path/data")
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.getContentSummary(p).getLength
        }
        df.coalesce(math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt)
      }
    val w = compacted.write.mode("overwrite")
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(s"$staged/data")
    writeMeta(s, s"$staged/_index_meta.json", meta)
    swap(s, staged, path)
  }

  private def partitionsOf(meta: Map[String, String]): Seq[String] =
    meta.getOrElse("partitions", "").split(",").toSeq.filter(_.nonEmpty)

  /** Number of parquet data files under the artifact (fragmentation
    * measure for the compaction contract). */
  def dataFileCount(s: SparkSession, path: String): Long = {
    val p = new Path(s"$path/data")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }

  /** Load the index table from a saved artifact. Takes only (session,
    * path) — by construction no per-application cache can be consulted. */
  def load(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/data")

  /** EXCHANGE the artifact at `live` with the one staged at `staged`
    * (the `b_src18` stage-and-swap overwrite pattern applied to an
    * index): the live artifact moves aside, the staged one renames in,
    * the old one is dropped. Each rename is atomic on HDFS/POSIX, so
    * readers never observe a half-written artifact; a crash BETWEEN the
    * two renames leaves `live` absent with both generations intact
    * (`live + ".old"` and `staged`) — recovery re-promotes one, never
    * reconstructs. A production catalog would swap a manifest pointer
    * instead (one atomic write); this is the filesystem-only analog.
    * Readers of the OLD frame keep their snapshot (parquet files are
    * immutable once read-planned); new loads see the new artifact. */
  def swap(s: SparkSession, staged: String, live: String): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val livePath = new Path(live)
    val fs = livePath.getFileSystem(conf)
    val old = new Path(live + ".old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(livePath)) require(fs.rename(livePath, old),
      s"index swap: cannot move live artifact aside: $live")
    require(fs.rename(new Path(staged), livePath),
      s"index swap: cannot promote staged artifact: $staged -> $live")
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** Per-application scratch root for certification artifacts (the
    * rows own their save+load cost; reps overwrite in place). */
  def tempRoot(s: SparkSession): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_idx_${s.sparkContext.applicationId}"

  private val savedOnce =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()

  /** Run `save` once per (application, path): the on-disk artifact IS
    * the standing index, so writing it is the amortized one-time build
    * — cold-probe rows then measure the marginal restart path (load +
    * probe), the same cost convention the warm probes follow with their
    * pinned frames. The full artifact-write cost class has a dedicated
    * owner (`x_sim_index_rebuild` writes two complete artifacts + swap
    * every rep). */
  def saveOnce(s: SparkSession, path: String)(save: => Unit): Unit =
    if (savedOnce.add((s.sparkContext.applicationId, path))) save

  // ---- metadata sidecar: a flat string→string JSON object ----

  def writeMeta(s: SparkSession, file: String, meta: Map[String, String]): Unit = {
    val p = new Path(file)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val json = meta.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{\n  ", ",\n  ", "\n}\n")
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def readMeta(s: SparkSession, path: String): Map[String, String] = {
    val p = new Path(s"$path/_index_meta.json")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val json =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val meta = parseFlat(json)
    require(meta.getOrElse("format", FormatVersion) == FormatVersion,
      s"index artifact at $path has format ${meta("format")}, " +
        s"this reader speaks $FormatVersion")
    meta
  }

  private def esc(v: String) =
    v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  /** Flat string→string JSON scanner (quotes/backslash/newline escapes).
    * Character-level on purpose: sidecar values run to tens of KB
    * (encoded centroid matrices), where a backtracking regex overflows
    * the stack. */
  private[llm] def parseFlat(json: String): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    var i = 0
    def str(): String = { // positioned ON the opening quote
      i += 1
      val sb = new java.lang.StringBuilder
      while (json.charAt(i) != '"') {
        if (json.charAt(i) == '\\') {
          json.charAt(i + 1) match {
            case 'n' => sb.append('\n')
            case c => sb.append(c)
          }
          i += 2
        } else { sb.append(json.charAt(i)); i += 1 }
      }
      i += 1
      sb.toString
    }
    while (i < json.length) {
      if (json.charAt(i) == '"') {
        val k = str()
        while (json.charAt(i) != ':') i += 1
        i += 1
        while (json.charAt(i) != '"') i += 1
        b += k -> str()
      } else i += 1
    }
    b.result()
  }

  // ---- exact numeric codecs for sidecar values ----

  def encodeVec(v: Array[Double]): String = v.map(_.toString).mkString(",")
  def decodeVec(s: String): Array[Double] =
    if (s.isEmpty) Array.empty else s.split(",", -1).map(java.lang.Double.parseDouble)

  def encodeMatrix(m: Array[Array[Double]]): String = m.map(encodeVec).mkString(";")
  def decodeMatrix(s: String): Array[Array[Double]] =
    if (s.isEmpty) Array.empty else s.split(";", -1).map(decodeVec)

  def encodeCube(c: Array[Array[Array[Double]]]): String = c.map(encodeMatrix).mkString("|")
  def decodeCube(s: String): Array[Array[Array[Double]]] =
    if (s.isEmpty) Array.empty else s.split("\\|", -1).map(decodeMatrix)

  def encodeInts(v: Array[Int]): String = v.mkString(",")
  def decodeInts(s: String): Array[Int] =
    if (s.isEmpty) Array.empty else s.split(",", -1).map(_.toInt)

  /** Rebuild a SMALL result frame inside another session of the same
    * context (cold-probe certification joins a fresh-session result
    * against warm-session baselines; plans from different sessions must
    * not mix in one tree). Bounded by the certification contract — probe
    * outputs are |queries| × k, candidate sets fixture-bounded. */
  /** Largest frame [[recreate]] may collect — certification results are
    * |queries| × k probe outputs or fixture-bounded candidate sets, so a
    * breach means a corpus-sized frame was handed to a certification
    * helper by mistake. */
  private[llm] val maxRecreateRows: Long = 1L << 20

  def recreate(target: SparkSession, df: DataFrame): DataFrame = {
    // budget the collect loudly (the Dedup.contamination house style):
    // count first, die with the contract named, never OOM inside collect
    val n = df.count()
    require(n <= maxRecreateRows,
      s"IndexStore.recreate: frame carries $n rows, over the $maxRecreateRows " +
        "maxRecreateRows budget — recreate is for certification-sized probe " +
        "outputs, not corpus-scale frames")
    val rows = new java.util.ArrayList[Row]()
    df.collect().foreach(rows.add)
    target.createDataFrame(rows, df.schema)
  }
}
