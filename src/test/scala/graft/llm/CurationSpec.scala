package graft.llm

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions.col

/** Plan/semantics evidence for the curation operators beyond the oracle:
  * the per-row ops must stay shuffle-free (linear at 100 TB) and the
  * hash-based sample/split must be deterministic across runs. */
class CurationSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("redact, chunk, and split are shuffle-free per-row plans") {
    for (name <- Seq("x_text_redact", "x_text_chunk", "x_smp3_split")) {
      val p = plan(name)
      assert(!p.contains("Exchange"), s"$name should not shuffle: $p")
    }
  }

  test("snapshot diff labels added/removed/modified/unchanged exactly") {
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, "a"), (2L, "B"), (5L, "e"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Curation.snapshotDiff(v1, v2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "unchanged", 2L -> "modified", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("FIM re-assembles PSM with non-empty prefix/middle/suffix; short docs pass through") {
    import spark.implicits._
    val docs = Seq(
      (7L, "a b c d e f"), // L=6: s=1+(7%4)=4, m=1+((7/3)%(6-1-4))=1 -> PRE a b c d / SUF f / MID e
      (0L, "x y z"),       // L=3: s=1, m=1 -> PRE x / SUF z / MID y
      (5L, "one two"),     // L=2: passthrough
      (9L, null.asInstanceOf[String])) // null: passthrough as ''
      .toDF("doc_id", "text")
    val out = Curation.fimTransform(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(7L) === "<PRE> a b c d <SUF> f <MID> e")
    assert(out(0L) === "<PRE> x <SUF> z <MID> y")
    assert(out(5L) === "one two")
    assert(out(9L) === "")
    // structural invariant on the fixture: every transformed doc carries
    // all three markers in PSM order, untouched docs carry none
    val fx = Curation.fimTransform(graft.Tables.t(spark, sf001, "documents"))
    val marked = fx.where(col("fim_text").contains("<PRE> "))
    assert(marked.where(!(col("fim_text").contains(" <SUF> ") &&
      col("fim_text").contains(" <MID> "))).count() === 0L)
    assert(marked.count() > 0L)
    // map-only plan: no exchange anywhere
    assert(!fx.queryExecution.executedPlan.toString.contains("Exchange"),
      "FIM must stay a map-only projection")
  }

  test("FIM property: prefix ++ middle ++ suffix always reassembles the original tokens") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // sampled generator drive (no scalatest-scalacheck bridge offline —
    // the CHTypeSpec convention)
    val tokGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val docGen = for {
      id <- Gen.chooseNum(0L, 1000000L)
      n <- Gen.chooseNum(3, 40)
      ts <- Gen.listOfN(n, tokGen)
    } yield (id, ts.mkString(" "))
    val rows = (0 until 200).flatMap { i =>
      docGen.apply(Gen.Parameters.default, Seed(i.toLong))
    }.distinctBy(_._1)
    val out = Curation.fimTransform(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val orig = rows.toMap
    val psm = """<PRE> (.*) <SUF> (.*) <MID> (.*)""".r
    rows.foreach { case (id, text) =>
      out(id) match {
        case psm(pre, suf, mid) =>
          assert(s"$pre $mid $suf" === text,
            s"doc $id did not reassemble: pre=[$pre] mid=[$mid] suf=[$suf]")
          assert(pre.nonEmpty && mid.nonEmpty && suf.nonEmpty)
        case other => fail(s"doc $id not in PSM form: $other")
      }
    }
  }

  test("vocab aggregates with map-side partials") {
    val p = plan("x_text_vocab")
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
  }

  test("train/val/test split is deterministic and covers every doc") {
    val a = SparkEntry.queries("x_smp3_split")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = SparkEntry.queries("x_smp3_split")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    assert(a.values.toSet == Set("train", "val", "test"))
    // ~80/10/10 with md5-prefix buckets; allow generous tolerance
    val n = a.size.toDouble
    val train = a.values.count(_ == "train") / n
    assert(train > 0.7 && train < 0.9, s"train fraction $train")
  }

  test("leak-safe split co-assigns every near-duplicate pair; plan is map-only") {
    val rows = SparkEntry.queries("x_smp10_leak_safe_split")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // every planted mangled twin (doc_id + 10M) shares its original's
    // group AND split — the leakage guarantee x_smp3 cannot give
    val byId = rows.map(r => r._1 -> r).toMap
    val twins = rows.filter(_._1 >= 10000000L)
    assert(twins.nonEmpty)
    twins.foreach { case (id, g, s) =>
      val (_, g0, s0) = byId(id - 10000000L)
      assert(g == g0, s"twin $id changed group")
      assert(s == s0, s"twin $id leaked across the split: $s vs $s0")
    }
    // distribution still ~80/10/10 over GROUPS
    val n = rows.length.toDouble
    val train = rows.count(_._3 == "train") / n
    assert(train > 0.7 && train < 0.9, s"train fraction $train")
    // 100-TB shape: pure per-row map, no shuffle
    val p = plan("x_smp10_leak_safe_split")
    assert(!p.contains("Exchange"), s"leak-safe split should be map-only:\n$p")
  }

  test("chunks reassemble to the original prefix structure") {
    import spark.implicits._
    val chunks = SparkEntry.queries("x_text_chunk")(spark, sf0001)
      .where($"doc_id" === 1).orderBy($"chunk_id").as[(Long, Long, String)].collect()
    val doc = graft.Tables.t(spark, sf0001, "documents")
      .where($"doc_id" === 1).select("text").as[String].head()
    if (doc.nonEmpty) {
      assert(chunks.head._3 == doc.take(200))
      // stride 150 < size 200 → consecutive chunks overlap by 50 chars
      if (chunks.length > 1)
        assert(chunks(0)._3.takeRight(50) == chunks(1)._3.take(50))
    }
  }

  test("mixture resampling pulls the dominant domain down to the small-domain share") {
    val out = SparkEntry.queries("x_smp9_mixture")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val kept = out.groupBy(_._2).view.mapValues(_.length).toMap
    // planted skew: 'web' holds ~333 of 500 docs, the small domains ~8
    // each; after resampling every surviving domain should sit near the
    // smallest domain's size (md5-bucket granularity allows slack)
    val small = kept.filter(_._1 != "web").values
    assert(small.nonEmpty)
    assert(kept.contains("web"), "dominant domain must not be wiped out")
    val smallMax = small.max
    assert(kept("web") <= 3 * smallMax,
      s"web still dominant: ${kept("web")} vs small max $smallMax")
    // determinism: the keep set is a pure function of doc_id
    val again = SparkEntry.queries("x_smp9_mixture")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSet == again.toSet)
  }

  test("DSIR weights separate the target language from the rest") {
    import org.apache.spark.sql.functions._
    val w = SparkEntry.queries("x_sel_dsir")(spark, sf001)
    val docs = graft.Tables.t(spark, sf001, "documents").select("doc_id", "lang")
    val byLang = w.join(docs, "doc_id").groupBy(col("lang") === "en")
      .agg(avg(col("logw") / col("n_toks")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // target = en: English docs must score strictly higher per-token
    // importance than the rest — the whole point of the method
    assert(byLang(true) > byLang(false),
      s"en ${byLang(true)} should exceed non-en ${byLang(false)}")
    // every doc is scored exactly once
    assert(w.count() === docs.count())
  }

  test("DSIR resampling is deterministic and biased toward high-importance docs") {
    import org.apache.spark.sql.functions._
    def pick() = SparkEntry.queries("x_sel_dsir_resample")(spark, sf001)
      .collect().map(_.getLong(0)).toSet
    val sel = pick()
    assert(sel === pick(), "gumbel keys must be a pure function of doc_id")
    assert(sel.size === 50)
    val w = SparkEntry.queries("x_sel_dsir")(spark, sf001)
      .select(col("doc_id"), (col("logw") / col("n_toks")).as("pt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val selMean = sel.toSeq.map(w).sum / sel.size
    val allMean = w.values.sum / w.size
    // importance resampling must pull the selected set toward the
    // target distribution (higher mean per-token weight than the corpus)
    assert(selMean > allMean, s"selected mean $selMean <= corpus mean $allMean")
  }

  test("sequence packing: spans tile the token stream exactly") {
    import org.apache.spark.sql.functions._
    val ctx = 128L
    val spans = SparkEntry.queries("x_pack_sequences")(spark, sf001).cache()
    try {
      // per-doc: spans cover the doc's tokens exactly once, contiguously
      val docs = graft.Tables.t(spark, sf001, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("toks"))
      val perDoc = spans.groupBy("doc_id")
        .agg(sum(col("span_len")).as("covered"), min(col("doc_off")).as("first"))
        .join(docs, "doc_id")
      assert(perDoc.where(col("covered") =!= col("toks") || col("first") =!= 0).count() === 0)
      // per-sequence: every sequence except the LAST is exactly ctx full,
      // and within a sequence offsets+lengths tile [0, fill)
      val perSeq = spans.groupBy("seq_id")
        .agg(sum(col("span_len")).as("fill"), min(col("seq_off")).as("s0"))
      val maxSeq = perSeq.agg(max(col("seq_id"))).head.getLong(0)
      assert(perSeq.where(col("seq_id") < maxSeq && col("fill") =!= ctx).count() === 0)
      assert(perSeq.where(col("s0") =!= 0).count() === 0)
      // no span exceeds the context or is empty
      assert(spans.where(col("span_len") <= 0 || col("span_len") > ctx).count() === 0)
    } finally spans.unpersist()
  }

  test("BPE packing tiles exactly the tokenizer's per-doc counts") {
    import org.apache.spark.sql.functions._
    val ctx = 128L
    val spans = SparkEntry.queries("x_pack_sequences_bpe")(spark, sf001)
    val toks = TextOps.bpeEncode(
      graft.Tables.t(spark, sf001, "documents"), nMerges = 6)
      .select(col("doc_id"), col("bpe_tokens").as("toks"))
    // per-doc: span coverage equals the BPE token count exactly — the
    // packing is sized in tokenizer units, not whitespace words
    val perDoc = spans.groupBy("doc_id")
      .agg(sum(col("span_len")).as("covered")).join(toks, "doc_id")
    assert(perDoc.where(col("covered") =!= col("toks")).count() === 0)
    // every non-final sequence is exactly ctx-full
    val perSeq = spans.groupBy("seq_id").agg(sum(col("span_len")).as("fill"))
    val maxSeq = perSeq.agg(max(col("seq_id"))).head.getLong(0)
    assert(perSeq.where(col("seq_id") < maxSeq && col("fill") =!= ctx).count() === 0)
  }

  test("sequence packing rides Spectrum, not an unpartitioned window") {
    val p = plan("x_pack_sequences")
    // the global running sum must be the range-partitioned prefix-sum
    // shape: the corpus-sized cumsum rides a RangePartitioning exchange
    // (no vacuous substring match — 'rangepartitioning' specifically)
    assert(p.toLowerCase.contains("rangepartitioning"), p.take(2000))
    // and the only SinglePartition exchange allowed is Spectrum's
    // #partitions-sized offsets pass — its Window must consume __pid
    // aggregates, never the corpus rows. If a corpus-sized global window
    // sneaks back in, it shows up as a Window over a sort on the order
    // column (doc_id) under a SinglePartition exchange.
    val windows = p.linesIterator.filter(_.contains("Window ")).toSeq
    windows.foreach { w =>
      assert(w.contains("__pid") || !w.contains("doc_id"),
        s"corpus-sized global window detected: $w")
    }
  }
}
