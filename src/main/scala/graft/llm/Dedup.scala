package graft.llm

import graft.{QueryDef, QueryRegistry, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data deduplication operators over the `documents` fixture
  * (SURVEY.md §2.3): exact, exact-jaccard (inverted index), MinHash+LSH,
  * SimHash. All are pure DataFrame programs built from codegen'd builtins
  * and higher-order lambdas — no UDFs, no driver-side loops — so each is
  * one-or-two shuffles regardless of corpus size.
  */
object Dedup extends QueryRegistry {

  /** Word 3-gram shingle set (distinct), guarded for short docs. */
  def shingleCol: Column = expr(
    """array_distinct(CASE WHEN size(ws) >= 3
      |  THEN transform(sequence(0, size(ws)-3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))
      |  ELSE array() END)""".stripMargin)

  private def withShingles(docs: DataFrame): DataFrame =
    docs.withColumn("ws", split(col("text"), " ")).withColumn("sh", shingleCol)

  /** Exact pairwise word-3gram Jaccard >= `tau` via an inverted shingle
    * index: explode → self-equi-join on shingle → |A∩B| counts → join
    * per-doc sizes. Shuffles on shingle then on doc pairs — never a cross
    * product. (At 100 TB add a document-frequency cap on pathological
    * stop-shingles; kept exact here to match the oracle.)
    */
  def ngramJaccardPairs(docs: DataFrame, tau: Double): DataFrame = {
    val sh = withShingles(docs)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("jaccard", col("i") / (col("sa.n") + col("sb.n") - col("i")))
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash signatures: K affine permutations over the 32-bit-folded
    * shingle hash, h_j(x) = ((x32*(2j+1) + j*c) mod p), taking the min over
    * the shingle set. The 32-bit fold keeps every product far from Long
    * overflow (Spark 4 runs ANSI mode: overflow throws, it doesn't wrap).
    */
  def withMinhash(docs: DataFrame, k: Int): DataFrame =
    withShingles(docs).withColumn("sig", expr(
      s"""transform(sequence(0, $k - 1), j ->
         |  array_min(transform(sh, t ->
         |    pmod(pmod(xxhash64(t), 4294967296) * (2*j + 1) + j * 2654435761, 4294967291))))""".stripMargin))

  /** MinHash + LSH banding: B bands of R rows hash into buckets; docs
    * sharing any band-bucket become candidates (one equi-join — the scale
    * path: no pairwise comparison outside buckets); candidates are scored
    * by signature agreement (estimated Jaccard) >= `tau`.
    */
  def minhashPairs(docs: DataFrame, k: Int, bands: Int, tau: Double): DataFrame = {
    val rows = k / bands
    val sigs = withMinhash(docs, k).select("doc_id", "sig")
    val buckets = sigs
      .select(col("doc_id"), col("sig"),
        explode(expr(s"transform(sequence(0, $bands - 1), b -> struct(b AS band, hash(slice(sig, b*$rows + 1, $rows)) AS bkey))")).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
    cand
      .withColumn("est_jaccard",
        expr(s"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), m -> m)) / CAST($k AS DOUBLE)"))
      .filter(col("est_jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), round(col("est_jaccard"), 6).as("est_jaccard"))
  }

  /** 64-bit SimHash over the word-3gram shingle set (same feature space as
    * [[ngramJaccardPairs]] — single-word features would report multiset-
    * similar but order-scrambled docs as dups): per bit j, sign of the sum
    * of ±1 votes from each shingle's hash bit. One pass, O(64·|sh|)/doc.
    */
  def withSimhash(docs: DataFrame): DataFrame =
    withShingles(docs)
      .withColumn("simhash", expr(
        """aggregate(
          |  transform(sequence(0, 63), j ->
          |    CASE WHEN aggregate(sh, 0, (acc, w) ->
          |      acc + CASE WHEN (shiftright(xxhash64(w), j) & 1) = 1 THEN 1 ELSE -1 END) > 0
          |    THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END),
          |  CAST(0 AS BIGINT), (a, x) -> a | x)""".stripMargin))

  /** SimHash near-dup pairs: 4 bands of 16 bits as LSH (a pair within
    * Hamming distance 3 of 64 shares >= 1 exact band w.h.p.), then exact
    * Hamming filter via bit_count(xor).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sigs = withSimhash(docs).select("doc_id", "simhash")
    val banded = sigs.select(col("doc_id"), col("simhash"),
      explode(expr(
        "transform(sequence(0, 3), b -> struct(b AS band, shiftright(simhash, b*16) & 65535 AS bkey))")).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("ha"), col("b.simhash").as("hb"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // ---- exact dedup: group by content hash, keep min doc_id ----
    QueryDef(
      "x_dedup_exact",
      (s, d) =>
        t(s, d, "documents")
          .groupBy(md5(col("text").cast("binary")).as("content_hash"))
          .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("copies")),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keeper, count(*) AS copies
             |FROM documents GROUP BY md5(text)""".stripMargin)),

    // ---- exact n-gram Jaccard near-dup pairs (inverted index) ----
    QueryDef(
      "x_dedup_ngram_jaccard",
      (s, d) => ngramJaccardPairs(t(s, d, "documents"), 0.5),
      Some("""WITH docs AS (SELECT doc_id, str_split(text, ' ') ws FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(ws) >= 3
             |  THEN list_transform(range(len(ws)-2), i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
             |  ELSE [] END)) AS s FROM docs),
             |sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
             |inter AS (SELECT a.doc_id da, b.doc_id db, count(*) i FROM sh a
             |  JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
             |SELECT da AS doc_a, db AS doc_b,
             |  round(i / (sa.n + sb.n - i * 1.0), 6) AS jaccard
             |FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
             |WHERE i / (sa.n + sb.n - i * 1.0) >= 0.5""".stripMargin)),

    // ---- MinHash + LSH near-dup candidates (engine-native hashes → no
    // cross-engine oracle; DedupSpec asserts parity with the exact pairs) ----
    QueryDef(
      "x_dedup_minhash",
      (s, d) => minhashPairs(t(s, d, "documents"), k = 32, bands = 8, tau = 0.5),
      None),

    // ---- SimHash near-dup pairs (no oracle; DedupSpec covers it) ----
    QueryDef(
      "x_dedup_simhash",
      (s, d) => simhashPairs(t(s, d, "documents"), maxHamming = 3),
      None)
  )
}
