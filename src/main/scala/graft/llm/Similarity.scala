package graft.llm

import graft.{QueryDef, QueryRegistry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` fixture
  * (SURVEY.md §2.3): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane (sign-LSH) bucketed variant as the scale path.
  *
  * All vector math is done with higher-order functions over
  * `array<double>` (cast once from the float column) — codegen'd,
  * per-row, no UDFs. The query side is broadcast; the candidate side never
  * materializes a full cross product in the LSH variant.
  */
object Similarity extends QueryRegistry {

  /** cos(a, b) with double accumulation, sequential fold → deterministic
    * and engine-portable. */
  private val cosExpr =
    """aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (a, x) -> a + x)
      |  / (sqrt(aggregate(qv, 0D, (a, x) -> a + x * x))
      |   * sqrt(aggregate(cv, 0D, (a, x) -> a + x * x)))""".stripMargin

  /** Exact top-k by cosine for each query vector: broadcast the (small)
    * query set against all candidates, then per-query top-k via window —
    * the correctness baseline the LSH path is measured against.
    */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qv"))
    val c = emb.select(col("vec_id").as("vid"), col("embedding").cast("array<double>").as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("vid"))
      .withColumn("cos", expr(cosExpr))
    graft.operators.LimitBy
      .limitBy(scored, Seq(col("qid")), Seq(col("cos").desc, col("vid").asc), k)
      .select(col("qid"), col("vid"), round(col("cos"), 6).as("cos"))
  }

  /** Sign-LSH ANN: `tables` independent hash tables, each hashing the sign
    * pattern of `bits` pseudo-random hyperplane projections into a bucket.
    * Hyperplanes are seeded gaussians computed ONCE on the driver and
    * shipped as a literal `[tables][bits][dim]` array — each row then does
    * pure arithmetic (`zip_with` dot products) instead of deriving plane
    * components per row. Candidates = bucket collisions in any table
    * (equi-join, shuffle on bucket key); exact cosine re-ranks.
    *
    * Multi-probe: the (small, broadcast) query side also probes every
    * Hamming-1 neighbor bucket — for moderate-similarity neighbors
    * (cos ~0.3, per-bit agree p ~0.6) this lifts per-table recall from
    * p^bits to p^bits + bits·p^(bits-1)(1-p) (~5x) at only (bits+1)x the
    * probed-bucket count, all on the broadcast side — far cheaper than
    * adding tables, which re-hash and re-shuffle the full candidate set.
    */
  def lshTopK(emb: DataFrame, queries: DataFrame, k: Int, tables: Int, bits: Int): DataFrame = {
    val dim = emb.select(size(col("embedding")).as("d")).head.getInt(0)
    val rnd = new scala.util.Random(42)
    val planes: Seq[Seq[Seq[Double]]] =
      Seq.fill(tables)(Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian())))
    def bucketed(df: DataFrame, vcol: String): DataFrame =
      df.withColumn("pl", typedLit(planes))
        .select(col("*"), explode(expr(
          s"""transform(sequence(0, $tables - 1), t -> struct(t AS tbl,
             |  aggregate(sequence(0, $bits - 1), 0, (acc, j) -> acc * 2 +
             |    CASE WHEN aggregate(zip_with($vcol, pl[t][j], (x, p) -> x * p), 0D, (a, x) -> a + x) > 0
             |    THEN 1 ELSE 0 END) AS bkey))""".stripMargin)).as("bb"))
        .select(df.columns.map(col) :+ col("bb.tbl").as("tbl") :+ col("bb.bkey").as("bkey"): _*)

    val q = bucketed(
      queries.select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qv")), "qv")
      .withColumn("bkey", explode(expr(
        s"concat(array(bkey), transform(sequence(0, $bits - 1), f -> cast(bkey as int) ^ shiftleft(1, f)))")))
    val c = bucketed(
      emb.select(col("vec_id").as("vid"), col("embedding").cast("array<double>").as("cv")), "cv")
    val cand = c.join(broadcast(q), Seq("tbl", "bkey"))
      .filter(col("qid") =!= col("vid"))
      .dropDuplicates("qid", "vid")
      .withColumn("cos", expr(cosExpr))
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
