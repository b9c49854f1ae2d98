package graft.llm

import graft.{Sessions, Tables}

import org.apache.spark.sql.functions._

/** Threshold-calibration probe for the accuracy-contract oracles
  * (langid accuracy, ANN recalls, LM separation, pair recalls): prints
  * the measured metrics at a given fixture dir so contract floors can
  * be set (and later re-audited) with explicit margin below them.
  * The floors currently shipped in Similarity/Dedup cite these numbers.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.local("16", "16")
    import spark.implicits._

    val docs = Tables.t(spark, d, "documents")
    val emb = Tables.t(spark, d, "embeddings")

    // langid accuracy per true lang + overall
    val pred = TextOps.languageId(docs)
    pred.groupBy("true_lang")
      .agg(count(lit(1)).as("n"),
        avg(when(col("pred_lang") === col("true_lang"), 1.0).otherwise(0.0)).as("acc"))
      .orderBy("true_lang").show(50, false)

    // lm separation: real vs reversed text under a FIXED real-text
    // model (the x_text_lm_score shape — retraining on the reversed
    // text would score it against its own isomorphic trigram counts
    // and always print sep = 0.0)
    val (lmM, lmFloor) = TextOps.lmModel(docs)
    val real = TextOps.lmScoreAgainst(lmM, lmFloor, docs)
      .agg(avg("avg_logp")).first().getDouble(0)
    val gib = TextOps.lmScoreAgainst(lmM, lmFloor,
      docs.withColumn("text", reverse(col("text"))))
      .agg(avg("avg_logp")).first().getDouble(0)
    println(s"PROBE lm real=$real reversed=$gib sep=${real - gib}")

    // ANN recalls vs brute
    val q = emb.filter(col("vec_id") % 25 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(emb, q, 5))
    def rec(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = pairs(df)
      println(s"PROBE recall $name = ${(brute intersect p).size.toDouble / brute.size}")
    }
    rec("lsh", Similarity.lshTopK(emb, q, k = 5, tables = 8, bits = 6))
    rec("ivf", Similarity.ivfTopK(emb, q, k = 5, nlist = 0, nprobe = 0))
    // shipped defaults (m=8, ksub=256) so a floor re-audit prints the
    // numbers the contracts actually run under
    rec("pq", Similarity.pqTopK(emb, q, k = 5))
    rec("ivfpq", Similarity.ivfPqTopK(emb, q, k = 5))

    // sliced-merge scenario calibration (the x_sim_index_update_*
    // floors): corpus = vec_id % 5 != 0, full query batch, brute
    // baseline on the same sliced corpus — density knobs auto
    if (args.contains("scenarios")) {
      val sliced = emb.filter(col("vec_id") % 5 =!= 0)
      val bruteS = pairs(Similarity.bruteForceTopK(sliced, q, 5))
      def recS(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val p = pairs(df)
        println(s"PROBE recall $name = ${(bruteS intersect p).size.toDouble / bruteS.size}")
      }
      recS("ivf_sliced", Similarity.ivfTopK(sliced, q, k = 5, nlist = 0, nprobe = 0))
      recS("pq_sliced", Similarity.pqTopK(sliced, q, k = 5))
      recS("ivfpq_sliced", Similarity.ivfPqTopK(sliced, q, k = 5))
    }

    // knob sweep for the density-aware PQ shortlist: recall as a
    // function of (nprobe, shortlistFactor) at this fixture's density
    if (args.contains("sweep")) {
      for (sf <- Seq(2, 4, 8, 16, 32); np <- Seq(4, 6, 8)) {
        rec(s"ivfpq np=$np sf=$sf",
          Similarity.ivfPqTopK(emb, q, k = 5, nprobe = np, shortlistFactor = sf))
      }
      for (sf <- Seq(2, 4, 8, 16, 32))
        rec(s"pq sf=$sf", Similarity.pqTopK(emb, q, k = 5, shortlistFactor = sf))
      // the shortlist LEVER at auto nlist/nprobe: how much recall a
      // deployment gives back by pinning shortlistFactor below the
      // √N auto (the composed probe's residual super-constant cost
      // term at high density — SURVEY r17 density row)
      for (sf <- Seq(8, 16, 32, 0)) {
        val tag = if (sf == 0) "auto" else sf.toString
        rec(s"ivfpq lever np=auto sf=$tag",
          Similarity.ivfPqTopK(emb, q, k = 5, shortlistFactor = sf))
      }
    }

    // embed LSH + semantic recall vs exact pairs
    def ppairs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ppairs(Similarity.embedDupPairsExact(emb, 0.4))
    val lshp = ppairs(Similarity.embedDupPairsLsh(emb, 0.4, 16, 5))
    val semp = ppairs(Similarity.semanticDupPairs(emb, 0.4, 8, 2, 3))
    println(s"PROBE embed exact=${exact.size} lsh_recall=${(exact intersect lshp).size.toDouble / exact.size} lsh_fp=${(lshp -- exact).size}")
    println(s"PROBE semantic recall=${(exact intersect semp).size.toDouble / exact.size} fp=${(semp -- exact).size}")

    spark.stop()
    System.exit(0)
  }
}
