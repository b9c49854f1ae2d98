package graft.llm

import graft.{QueryDef, QueryRegistry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pure vector kernels for similarity search, standalone and serializable
  * so Spark closures reference the module statically. Sequential-fold
  * float math — identical IEEE operation order to the SQL
  * `aggregate(zip_with(...))` form it replaced (and to the DuckDB
  * `list_sum(list_transform(...))` oracle), so rounded results hash-match.
  */
private[llm] object VecKernels extends Serializable {

  /** cos(a, b), double accumulation, sequential. */
  def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); i += 1 }
    i = 0
    while (i < a.length) { na += a(i) * a(i); i += 1 }
    i = 0
    while (i < b.length) { nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Sign-LSH bucket key for table `t`: bits-bit integer, bit j = sign of
    * the projection onto hyperplane planes(t)(j).
    */
  def bucketKey(v: Array[Double], planes: Array[Array[Double]]): Int = {
    var acc = 0
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      var dot = 0.0
      var i = 0
      val n = math.min(v.length, p.length)
      while (i < n) { dot += v(i) * p(i); i += 1 }
      acc = acc * 2 + (if (dot > 0) 1 else 0)
      j += 1
    }
    acc
  }
}

/** Approximate-nearest-neighbor search over the `embeddings` fixture
  * (SURVEY.md §2.3): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane (sign-LSH) bucketed variant as the scale path.
  *
  * Join/bucket/top-k structure is declarative DataFrame logic (broadcast
  * query side, equi-join on bucket keys, never a full cross product in the
  * LSH variant); per-vector arithmetic runs as JIT'd Scala kernels in typed
  * `map`/`mapPartitions` ([[VecKernels]]) — Spark's higher-order array
  * lambdas are interpreted per element, a measured 10-50x tax at scale.
  */
object Similarity extends QueryRegistry {

  /** Score (qid, vid, qv, cv) pairs with exact cosine via a typed map. */
  private def scoreCosine(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col("qid"), col("vid"), col("qv"), col("cv"))
      .as[(Long, Long, Array[Double], Array[Double])]
      .map { case (qid, vid, qv, cv) => (qid, vid, VecKernels.cosine(qv, cv)) }
      .toDF("qid", "vid", "cos")
  }

  /** Exact top-k by cosine for each query vector: broadcast the (small)
    * query set against all candidates, then per-query top-k via window —
    * the correctness baseline the LSH path is measured against. O(N·Q) by
    * design; use [[lshTopK]] at scale.
    */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qv"))
    val c = emb.select(col("vec_id").as("vid"), col("embedding").cast("array<double>").as("cv"))
    val scored = scoreCosine(
      c.crossJoin(broadcast(q)).filter(col("qid") =!= col("vid")))
    graft.operators.LimitBy
      .limitBy(scored, Seq(col("qid")), Seq(col("cos").desc, col("vid").asc), k)
      .select(col("qid"), col("vid"), round(col("cos"), 6).as("cos"))
  }

  /** Sign-LSH ANN: `tables` independent hash tables, each hashing the sign
    * pattern of `bits` pseudo-random hyperplane projections into a bucket.
    * Hyperplanes are seeded gaussians computed ONCE on the driver and
    * closed over by the JIT'd bucket kernel. Candidates = bucket collisions
    * in any table (equi-join, shuffle on bucket key); exact cosine re-ranks.
    *
    * Multi-probe: the (small, broadcast) query side also probes every
    * Hamming-1 neighbor bucket — for moderate-similarity neighbors
    * (cos ~0.3, per-bit agree p ~0.6) this lifts per-table recall from
    * p^bits to p^bits + bits·p^(bits-1)(1-p) (~5x) at only (bits+1)x the
    * probed-bucket count, all on the broadcast side — far cheaper than
    * adding tables, which re-hash and re-shuffle the full candidate set.
    *
    * `dim` defaults to the embedding width probed from one row (guarded:
    * empty input → empty result, no driver exception).
    */
  def lshTopK(emb: DataFrame, queries: DataFrame, k: Int, tables: Int, bits: Int,
              dim: Int = -1): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val d =
      if (dim > 0) dim
      else emb.select(size(col("embedding")).as("d")).limit(1).collect()
        .headOption.map(_.getInt(0)).getOrElse(0)
    if (d == 0) return spark.emptyDataset[(Long, Long, Double)].toDF("qid", "vid", "cos")

    val rnd = new scala.util.Random(42)
    val planes: Array[Array[Array[Double]]] =
      Array.fill(tables)(Array.fill(bits)(Array.fill(d)(rnd.nextGaussian())))

    // (id, vec) -> one row per table with its bucket key, via a JIT'd kernel
    def bucketed(df: DataFrame, idCol: String, vCol: String): DataFrame =
      df.select(col(idCol), col(vCol)).as[(Long, Array[Double])]
        .mapPartitions { it =>
          it.flatMap { case (id, v) =>
            Iterator.tabulate(tables)(t => (id, v, t, VecKernels.bucketKey(v, planes(t))))
          }
        }
        .toDF(idCol, vCol, "tbl", "bkey")

    val q = bucketed(
      queries.select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qv")),
      "qid", "qv")
      .withColumn("bkey", explode(expr(
        s"concat(array(bkey), transform(sequence(0, $bits - 1), f -> cast(bkey as int) ^ shiftleft(1, f)))")))
    val c = bucketed(
      emb.select(col("vec_id").as("vid"), col("embedding").cast("array<double>").as("cv")),
      "vid", "cv")
    val cand = scoreCosine(
      c.join(broadcast(q), Seq("tbl", "bkey"))
        .filter(col("qid") =!= col("vid"))
        .dropDuplicates("qid", "vid"))
    graft.operators.LimitBy
      .limitBy(cand, Seq(col("qid")), Seq(col("cos").desc, col("vid").asc), k)
      .select(col("qid"), col("vid"), round(col("cos"), 6).as("cos"))
  }

  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)
  private def queriesOf(df: DataFrame) = df.filter(col("vec_id") % 25 === 0)

  val defs: Seq[QueryDef] = Seq(

    // ---- brute-force cosine top-5 for every 25th vector ----
    QueryDef(
      "x_sim_topk_brute",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        bruteForceTopK(emb, queriesOf(emb), 5)
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
             |q AS (SELECT * FROM e WHERE vec_id % 25 = 0),
             |scored AS (
             |  SELECT q.vec_id qid, c.vec_id vid,
             |    list_sum(list_transform(range(len(q.v)), i -> q.v[i+1] * c.v[i+1]))
             |      / (sqrt(list_sum(list_transform(range(len(q.v)), i -> q.v[i+1] * q.v[i+1])))
             |       * sqrt(list_sum(list_transform(range(len(c.v)), i -> c.v[i+1] * c.v[i+1])))) AS cos
             |  FROM q, e c WHERE q.vec_id <> c.vec_id)
             |SELECT qid, vid, round(cos, 6) AS cos FROM (
             |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) rn
             |  FROM scored) WHERE rn <= 5""".stripMargin)),

    // ---- sign-LSH ANN top-5 (engine-native hashing → no oracle;
    // SimilaritySpec measures recall vs the brute-force baseline) ----
    QueryDef(
      "x_sim_topk_lsh",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        lshTopK(emb, queriesOf(emb), k = 5, tables = 8, bits = 6)
      },
      None)
  )
}
