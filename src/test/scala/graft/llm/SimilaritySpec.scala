package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("sign-LSH top-k achieves usable recall vs brute force") {
    val emb = Tables.t(spark, sf001, "embeddings")
    val queries = emb.filter(col("vec_id") % 25 === 0)
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = topSet(Similarity.bruteForceTopK(emb, queries, 5))
    val lsh = topSet(Similarity.lshTopK(emb, queries, 5, tables = 8, bits = 6))
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(brute.size === queries.count() * 5)
    assert(recall >= 0.5, s"LSH recall too low: $recall")
  }

  test("IVF top-k achieves usable recall vs brute force") {
    val emb = Tables.t(spark, sf001, "embeddings")
    val queries = emb.filter(col("vec_id") % 25 === 0)
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = topSet(Similarity.bruteForceTopK(emb, queries, 5))
    val ivf = topSet(Similarity.ivfTopK(emb, queries, 5, nlist = 16, nprobe = 4))
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("standing IVF index: built once, probes reuse the materialization") {
    // the x_sim_index_probe contract (the dedup corpusBandIndexFor
    // pattern applied to ANN): the pinned index is the SAME object on
    // every probe, it IS a checkpointed materialization, and probing it
    // returns exactly what the per-rep rebuild path returns (kmeans is
    // deterministic: fixed seed + deterministic sample)
    val i1 = Similarity.ivfIndexFor(spark, sf001)
    val i2 = Similarity.ivfIndexFor(spark, sf001)
    assert(i1 eq i2, "IVF index was rebuilt on the second probe")
    val leaves = i1.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    assert(leaves.nonEmpty && leaves.forall(_.isCheckpointed),
      "index should be a checkpointed materialization")

    val emb = Tables.t(spark, sf001, "embeddings")
    val queries = emb.filter(col("vec_id") % 25 === 0)
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // nlist = 0 on the rebuild side: the standing index builds at the
    // density-scaled cell count, and equality needs identical centroids
    val probe = topSet(Similarity.ivfIndexProbe(spark, sf001, queries, k = 5, nprobe = 4))
    val rebuild = topSet(Similarity.ivfTopK(emb, queries, 5, nlist = 0, nprobe = 4))
    assert(probe === rebuild,
      "standing-index probe must agree with the per-rep rebuild path")
  }

  test("standing PQ index: built once, probe agrees with the rebuild path") {
    val c1 = Similarity.pqIndexFor(spark, sf001)
    val c2 = Similarity.pqIndexFor(spark, sf001)
    assert(c1 eq c2, "PQ codes table was rebuilt on the second probe")
    val leaves = c1.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    assert(leaves.nonEmpty && leaves.forall(_.isCheckpointed),
      "codes table should be a checkpointed materialization")
    val emb = Tables.t(spark, sf001, "embeddings")
    val queries = emb.filter(col("vec_id") % 25 === 0)
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val probe = topSet(Similarity.pqIndexProbe(spark, sf001, queries, k = 5))
    val rebuild = topSet(Similarity.pqTopK(emb, queries, 5))
    assert(probe === rebuild,
      "standing-codes probe must agree with the per-rep rebuild path")
  }

  test("IVF index maintenance: merged assignment converges; merge is idempotent") {
    import spark.implicits._
    val emb = Tables.t(spark, sf001, "embeddings")
    val sample = emb.select(col("embedding").cast("array<double>"))
      .limit(2048).as[Array[Double]].collect()
    val centroids = VecKernels.kmeans(sample, 16, iters = 8, seed = 42L)
    val slice = pmod(col("vec_id"), lit(5L))
    val index0 = Similarity.ivfAssign(emb.where(slice >= 2), centroids)
    val merged = Similarity.mergeIvfIndex(index0, emb.where(slice === 1), centroids)
    val rebuilt = Similarity.ivfAssign(emb.where(slice =!= 0), centroids)
    def cells(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.select("vid", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells(merged) === cells(rebuilt),
      "maintained assignment diverged from a full re-assign")
    // idempotence: replaying the admitted batch must not duplicate rows
    val replayed = Similarity.mergeIvfIndex(merged, emb.where(slice === 1), centroids)
    assert(replayed.count() === rebuilt.count(),
      "replaying an admitted batch duplicated assignment rows")
  }

  test("PQ codes maintenance: merged codes converge; merge is idempotent") {
    import spark.implicits._
    val emb = Tables.t(spark, sf001, "embeddings")
    val c = emb.select(col("vec_id").as("vid"),
      col("embedding").cast("array<double>").as("cv"))
    val sample = c.select(col("cv")).limit(2048).as[Array[Double]].collect()
      .map(VecKernels.normalize)
    val (codebooks, bounds) = Similarity.pqTrain(sample, 8, 256, seed = 42L)
    val slice = pmod(col("vid"), lit(5L))
    val codes0 = Similarity.pqEncodeDf(c.where(slice >= 2), codebooks, bounds)
    val merged = Similarity.mergePqIndex(codes0, c.where(slice === 1), codebooks, bounds)
    val rebuilt = Similarity.pqEncodeDf(c.where(slice =!= 0), codebooks, bounds)
    def codeMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Byte]] =
      df.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(codeMap(merged) === codeMap(rebuilt),
      "maintained codes table diverged from a full re-encode")
    val replayed = Similarity.mergePqIndex(merged, c.where(slice === 1), codebooks, bounds)
    assert(replayed.count() === rebuilt.count(),
      "replaying an admitted batch duplicated codes rows")
  }

  test("composed IVF-PQ top-k achieves usable recall vs brute force") {
    val emb = Tables.t(spark, sf001, "embeddings")
    val queries = emb.filter(col("vec_id") % 25 === 0)
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = topSet(Similarity.bruteForceTopK(emb, queries, 5))
    val ivfpq = topSet(Similarity.ivfPqTopK(emb, queries, 5))
    val recall = (brute intersect ivfpq).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF-PQ recall too low: $recall")
  }

  test("standing IVF-PQ index: built once, probe agrees with the rebuild path") {
    val i1 = Similarity.ivfPqIndexFor(spark, sf001)
    val i2 = Similarity.ivfPqIndexFor(spark, sf001)
    assert(i1 eq i2, "composed index was rebuilt on the second probe")
    val leaves = i1.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    assert(leaves.nonEmpty && leaves.forall(_.isCheckpointed),
      "composed index should be a checkpointed materialization")
    val emb = Tables.t(spark, sf001, "embeddings")
    val queries = emb.filter(col("vec_id") % 25 === 0)
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val probe = topSet(Similarity.ivfPqIndexProbe(spark, sf001, queries, k = 5))
    val rebuild = topSet(Similarity.ivfPqTopK(emb, queries, 5))
    assert(probe === rebuild,
      "standing composed probe must agree with the per-rep rebuild path")
  }

  test("IVF-PQ maintenance: merged composed table converges; merge is idempotent") {
    import spark.implicits._
    val emb = Tables.t(spark, sf001, "embeddings")
    val c = emb.select(col("vec_id").as("vid"),
      col("embedding").cast("array<double>").as("cv"))
    val sample = c.select(col("cv")).limit(2048).as[Array[Double]].collect()
      .map(VecKernels.normalize)
    val (centroids, codebooks, bounds) =
      Similarity.ivfPqTrain(sample, 16, 8, 256, seed = 42L)
    val slice = pmod(col("vid"), lit(5L))
    val index0 = Similarity.ivfPqEncodeDf(c.where(slice >= 2), centroids, codebooks, bounds)
    val merged = Similarity.mergeIvfPqIndex(index0, c.where(slice === 1),
      centroids, codebooks, bounds)
    val rebuilt = Similarity.ivfPqEncodeDf(c.where(slice =!= 0), centroids, codebooks, bounds)
    def rowMap(df: org.apache.spark.sql.DataFrame): Map[Long, (Int, Seq[Byte])] =
      df.collect().map(r =>
        r.getLong(0) -> ((r.getInt(1), r.getAs[Array[Byte]](2).toSeq))).toMap
    assert(rowMap(merged) === rowMap(rebuilt),
      "maintained composed table diverged from a full re-encode")
    val replayed = Similarity.mergeIvfPqIndex(merged, c.where(slice === 1),
      centroids, codebooks, bounds)
    assert(replayed.count() === rebuilt.count(),
      "replaying an admitted batch duplicated composed rows")
  }

  test("IVF-PQ residual scan: single-cell composed scan matches the flat scan; pruned probe filters on cell") {
    import spark.implicits._
    val emb = Tables.t(spark, sf001, "embeddings")
    val c = emb.select(col("vec_id").as("vid"),
      col("embedding").cast("array<double>").as("cv"))
    val sample = c.select(col("cv")).limit(2048).as[Array[Double]].collect()
      .map(VecKernels.normalize)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the exact pin under by_residual: with nlist=1 every vector shares
    // one centroid, so the composed score q·c0 + ADC(residual) is the
    // flat ADC over the SAME residual codes shifted by a per-query
    // CONSTANT — ranking, ties (vid asc) and the exact re-rank are all
    // shift-invariant, so the composed kernel must return exactly what
    // pqScan returns over those codes (pins heap logic, the cell→query
    // routing, the best-first shortlist cut, and the re-rank)
    val (c1, cb1, bd1) = Similarity.ivfPqTrain(sample, nlist = 1, 8, 256, seed = 42L)
    val index1 = Similarity.ivfPqEncodeDf(c, c1, cb1, bd1)
    val composed = topSet(Similarity.ivfPqScan(index1, c, c1, cb1, bd1,
      queries, 5, 256, nprobe = 1, shortlistFactor = 4))
    val flat = topSet(Similarity.pqScan(index1.select("vid", "codes"), c,
      cb1, bd1, queries, 5, 256, shortlistFactor = 4))
    assert(composed === flat,
      "single-cell composed scan diverged from the flat PQ scan on identical residual codes")
    // and the pruned probe's plan actually filters on cell (real model)
    val (centroids, codebooks, bounds) =
      Similarity.ivfPqTrain(sample, 16, 8, 256, seed = 42L)
    val index = Similarity.ivfPqEncodeDf(c, centroids, codebooks, bounds)
    val prunedPlan = Similarity.ivfPqScan(index, c, centroids, codebooks, bounds,
      queries, 5, 256, nprobe = 4, shortlistFactor = 4)
      .queryExecution.executedPlan.toString
    assert(prunedPlan.contains("cell#") &&
        (prunedPlan.toLowerCase.contains("inset") || prunedPlan.toLowerCase.contains("in (")),
      s"composed scan lost its cell pruning filter:\n$prunedPlan")
  }

  test("ANN index deletion forgets exactly the requested vids; delete-then-admit round-trips") {
    import spark.implicits._
    val emb = Tables.t(spark, sf001, "embeddings")
    val sample = emb.select(col("embedding").cast("array<double>"))
      .limit(2048).as[Array[Double]].collect()
    val centroids = VecKernels.kmeans(sample, 16, iters = 8, seed = 42L)
    val slice = pmod(col("vec_id"), lit(5L))
    val full = Similarity.ivfAssign(emb, centroids)
    val forgotten = emb.where(slice === 1).select("vec_id")
    val shrunk = Similarity.deleteFromIndex(full, forgotten)
    val rebuilt = Similarity.ivfAssign(emb.where(slice =!= 1), centroids)
    def cells(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.select("vid", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells(shrunk) === cells(rebuilt),
      "deletion left different rows than a rebuild over the retained corpus")
    // update = delete-then-admit round-trips to the full assignment
    val readmitted = Similarity.mergeIvfIndex(shrunk, emb.where(slice === 1), centroids)
    assert(cells(readmitted) === cells(full), "delete-then-admit did not round-trip")
  }

  test("standing LSH index: built once, probe agrees with the rebuild path") {
    val b1 = Similarity.lshIndexFor(spark, sf001)
    val b2 = Similarity.lshIndexFor(spark, sf001)
    assert(b1 eq b2, "bucket table was rebuilt on the second probe")
    val emb = Tables.t(spark, sf001, "embeddings")
    val queries = emb.filter(col("vec_id") % 25 === 0)
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val probe = topSet(Similarity.lshIndexProbe(spark, sf001, queries, k = 5))
    // the standing index hashes at the SELECTIVE bit-width (8); the
    // rebuild comparison runs lshTopK at the same width — same planes,
    // same candidates, same re-rank
    val rebuild = topSet(Similarity.lshTopK(emb, queries, k = 5, tables = 8, bits = 8))
    assert(probe === rebuild,
      "standing-bucket probe must agree with the per-rep rebuild path")
    val brute = topSet(Similarity.bruteForceTopK(emb, queries, 5))
    val recall = (probe & brute).size.toDouble / brute.size
    info(f"8-bit standing-LSH recall vs brute: $recall%.3f")
    assert(recall >= 0.45, f"selective-index recall $recall%.3f under floor 0.45")
  }

  test("LSH index maintenance: merged buckets converge; merge is idempotent") {
    import spark.implicits._
    val emb = Tables.t(spark, sf001, "embeddings")
    val dim = emb.select(size(col("embedding")).as("d")).limit(1).collect()(0).getInt(0)
    val planes = Similarity.lshPlanesFor(dim)
    val slice = pmod(col("vec_id"), lit(5L))
    val index0 = Similarity.lshAssign(emb.where(slice >= 2), planes)
    val merged = Similarity.mergeLshIndex(index0, emb.where(slice === 1), planes)
    val rebuilt = Similarity.lshAssign(emb.where(slice =!= 0), planes)
    def buckets(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Int)] =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(buckets(merged) === buckets(rebuilt),
      "maintained bucket table diverged from a full re-hash")
    val replayed = Similarity.mergeLshIndex(merged, emb.where(slice === 1), planes)
    assert(replayed.count() === rebuilt.count(),
      "replaying an admitted batch duplicated bucket rows")
  }

  test("PQ/ADC top-k achieves usable recall vs brute force") {
    val emb = Tables.t(spark, sf001, "embeddings")
    val queries = emb.filter(col("vec_id") % 25 === 0)
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = topSet(Similarity.bruteForceTopK(emb, queries, 5))
    val pq = topSet(Similarity.pqTopK(emb, queries, 5))
    val recall = (brute intersect pq).size.toDouble / brute.size
    assert(recall >= 0.75, s"PQ recall too low: $recall")
  }

  test("embedding near-dup LSH pairs recall vs the exact pairs") {
    val emb = Tables.t(spark, sf001, "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.embedDupPairsExact(emb, 0.4))
    val lsh = pairs(Similarity.embedDupPairsLsh(emb, 0.4, tables = 16, bits = 5))
    assert(exact.nonEmpty, "fixture should contain cos>=0.4 pairs")
    // every LSH pair is exact-verified (cos filter), so no false positives
    assert((lsh -- exact).isEmpty, s"false positives: ${lsh -- exact}")
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH pair recall too low: $recall")
  }

  test("brute-force cosine agrees with a hand-computed value") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0)
    val out = Similarity.bruteForceTopK(emb, q, 3)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out(1L) === 1.0)
    assert(out(2L) === 0.0)
    assert(math.abs(out(3L) - 0.6) < 1e-9)
  }

  test("semantic cluster-blocked dedup: no false positives, usable recall") {
    val emb = Tables.t(spark, sf001, "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.embedDupPairsExact(emb, 0.4))
    val sem = pairs(Similarity.semanticDupPairs(emb, 0.4, k = 8, nprobe = 2, iters = 3))
    // every emitted pair passed the exact cosine filter -> subset of exact
    assert((sem -- exact).isEmpty, s"false positives: ${(sem -- exact).take(5)}")
    val recall = (exact intersect sem).size.toDouble / exact.size
    assert(recall >= 0.5, s"semantic-blocking recall too low: $recall")
  }

  test("power iteration recovers the dominant axis of anisotropic data") {
    import spark.implicits._
    // variance 100x larger along the (1,1,0,...)/sqrt(2) direction
    val axis = Array(1.0 / math.sqrt(2), 1.0 / math.sqrt(2), 0.0, 0.0)
    val pts = (0 until 200).map { i =>
      val t = (i - 100) * 0.1 // spread along the axis
      val noise = Array(0.01 * (i % 7 - 3), 0.01 * (i % 5 - 2),
        0.02 * (i % 3 - 1), 0.02 * (i % 11 - 5))
      (i.toLong, Array.tabulate(4)(j => axis(j) * t + noise(j)))
    }
    val v = Similarity.topComponent(pts.toDS().repartition(4), iters = 6)
    val cos = math.abs(v.zip(axis).map { case (a, b) => a * b }.sum)
    assert(cos > 0.98, s"recovered ${v.toSeq}, |cos|=$cos")
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9, "not unit norm")
  }

  test("distributed k-means: inertia non-increasing, blobs recovered") {
    import spark.implicits._
    // three well-separated blobs; ids 0..2 (the init seeds) land one per blob
    val pts = (0 until 90).map { i =>
      val blob = i % 3
      val base = Array(blob * 10.0, blob * -10.0)
      (i.toLong, Array(base(0) + (i / 3) * 0.01, base(1) + (i / 7) * 0.01))
    }
    val ds = pts.toDS().repartition(4)
    val (cents, inertia) = Similarity.fitKMeans(ds, k = 3, iters = 4)
    assert(cents.length === 3)
    inertia.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-9, s"inertia increased: ${inertia.toSeq}")
    }
    // final assignment groups each blob together
    val byBlob = pts.groupBy(_._1 % 3).values.map { blob =>
      blob.map(p => VecKernels.nearestCentroid(p._2, cents)).distinct
    }
    byBlob.foreach(cs => assert(cs.size === 1, s"blob split across $cs"))
    assert(byBlob.flatten.toSet.size === 3, "blobs collapsed into one cluster")
  }

  test("streamed IVF ingest: live engine converges and the probe meets the recall contract") {
    // the x_stream_ivf_ingest builder drives 4 micro-batches through the
    // REAL streaming engine with probe-then-merge; its in-engine requires
    // gate streamed ≡ direct assignment and that live probes ran — this
    // drive surfaces those requires as a spec failure, and the output row
    // must satisfy the recall contract
    val r = graft.SparkEntry.queries("x_stream_ivf_ingest")(spark, sf001).collect()(0)
    assert(r.getAs[Boolean]("recall_ok"), r.toString)
    assert(r.getAs[Long]("n_queries") > 0)
  }

  test("file-source IVF ingest: files landing DURING the stream are discovered and admitted") {
    // the x_stream_ivf_file_ingest builder writes one backlog parquet
    // file, starts a maxFilesPerTrigger=1 paced readStream, then lands
    // three more embedding slices between processAllAvailable fences;
    // its in-engine requires pin >=4 discovered non-empty micro-batches
    // (the two-stage discovery gate), live probes, and file-ingested ≡
    // direct assignment — this drive surfaces those requires as a spec
    // failure, and the output row must satisfy the recall contract
    val r = graft.SparkEntry.queries("x_stream_ivf_file_ingest")(spark, sf001).collect()(0)
    assert(r.getAs[Boolean]("recall_ok"), r.toString)
    assert(r.getAs[Long]("n_queries") > 0)
  }

  test("file-source LSH/PQ/IVF-PQ ingest: every ANN family's loop admits landing shards") {
    // the remaining families ride the same annFileIngest drive; each
    // row's in-engine requires pin the >=4-batch discovery gate, live
    // probes, and file-ingested ≡ direct state on the stored key
    for (name <- Seq("x_stream_lsh_file_ingest", "x_stream_pq_file_ingest",
        "x_stream_ivfpq_file_ingest")) {
      val r = graft.SparkEntry.queries(name)(spark, sf001).collect()(0)
      assert(r.getAs[Boolean]("recall_ok"), s"$name: $r")
      assert(r.getAs[Long]("n_queries") > 0, name)
    }
  }

  test("streamed LSH ingest: live engine converges and the probe meets the recall contract") {
    // same drive as the IVF row: the builder's in-engine requires gate
    // streamed ≡ direct bucket table and that live probes ran
    val r = graft.SparkEntry.queries("x_stream_lsh_ingest")(spark, sf001).collect()(0)
    assert(r.getAs[Boolean]("recall_ok"), r.toString)
    assert(r.getAs[Long]("n_queries") > 0)
  }

  test("streamed PQ ingest: live engine converges and the probe meets the recall contract") {
    // the in-engine requires gate streamed codes ≡ direct encode (the
    // family's codes-identity convention) and that live ADC probes ran
    val r = graft.SparkEntry.queries("x_stream_pq_ingest")(spark, sf001).collect()(0)
    assert(r.getAs[Boolean]("recall_ok"), r.toString)
    assert(r.getAs[Long]("n_queries") > 0)
  }

  test("streamed IVF-PQ ingest: live engine converges and the probe meets the recall contract") {
    // the in-engine requires gate streamed composed table ≡ direct
    // encode on (vid, cell, codes) and that live cell-pruned ADC
    // probes ran
    val r = graft.SparkEntry.queries("x_stream_ivfpq_ingest")(spark, sf001).collect()(0)
    assert(r.getAs[Boolean]("recall_ok"), r.toString)
    assert(r.getAs[Long]("n_queries") > 0)
  }

  test("LSH, PQ and IVF-PQ disk chains: append+compact converge to the direct build through a cold probe") {
    for (name <- Seq("x_sim_index_disk_update_lsh", "x_sim_index_disk_update_pq",
        "x_sim_index_disk_update_ivfpq")) {
      val r = graft.SparkEntry.queries(name)(spark, sf001).collect()(0)
      assert(r.getAs[Boolean]("converged"), s"$name: $r")
      assert(r.getAs[Boolean]("compacted_ok"), s"$name: $r")
      assert(r.getAs[Boolean]("recall_ok"), s"$name: $r")
    }
  }

  test("bruteForceTopK dies loudly, with the budget named, on a corpus-sized query frame") {
    import spark.implicits._
    // a mis-carved "query" frame over the budget must fail BEFORE the
    // driver collect, naming the knob — not OOM inside collect()
    val big = spark.range(Similarity.maxQueryBatch.toLong + 1)
      .select(col("id").as("vec_id"),
        array(lit(1.0), lit(0.0)).as("embedding"))
    val corpus = Seq((0L, Array(1.0, 0.0))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(corpus, big, 1)
    }
    assert(e.getMessage.contains("maxQueryBatch"), e.getMessage)
    // the one-shot LSH path carries the same contract
    val e2 = intercept[IllegalArgumentException] {
      Similarity.lshTopK(corpus, big, 1, tables = 2, bits = 2)
    }
    assert(e2.getMessage.contains("maxQueryBatch"), e2.getMessage)
  }

  test("pqScan and ivfPqScan die loudly, budget named, on a corpus-sized query frame") {
    import spark.implicits._
    // the multi-tile path now carries the family budget: a mis-carved
    // corpus-sized "query" frame must die naming maxQueryBatch before
    // any tile gather, not grind through ceil(nQ/tile) scan jobs
    val big = spark.range(Similarity.maxQueryBatch.toLong + 1)
      .select(col("id").as("vec_id"),
        array(lit(1.0), lit(0.0)).as("embedding"))
    val emb = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)),
      (2L, Array(0.6, 0.8))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTopK(emb, big, 1, m = 1, ksub = 2)
    }
    assert(e.getMessage.contains("maxQueryBatch"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(emb, big, 1, nlist = 2, nprobe = 1, m = 1, ksub = 2)
    }
    assert(e2.getMessage.contains("maxQueryBatch"), e2.getMessage)
  }

  test("pqScan tiles the query batch: per-tile LUT gather is bounded, results unchanged") {
    val emb = Tables.t(spark, sf001, "embeddings")
    val queries = emb.filter(col("vec_id") % 25 === 0)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val whole = rows(Similarity.pqTopK(emb, queries, 5))
    // a tiny tile forces the multi-tile path (several codes scans, one
    // bounded LUT gather per tile); per-query results must be identical
    // because each query lives in exactly one tile
    val tiled =
      try { Similarity.pqLutTile = 4; rows(Similarity.pqTopK(emb, queries, 5)) }
      finally Similarity.pqLutTile = 4096
    assert(tiled === whole)
  }

  test("ivfPqScan tiles the query batch: per-tile gather is bounded, results unchanged") {
    // the composed scan rides the same tile protocol (kernel-free count
    // probe, hash-tiling on the query frame, per-tile cell→queries map);
    // per-query results must be tile-invariant
    val emb = Tables.t(spark, sf001, "embeddings")
    val queries = emb.filter(col("vec_id") % 25 === 0)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val whole = rows(Similarity.ivfPqTopK(emb, queries, 5))
    val tiled =
      try { Similarity.pqLutTile = 4; rows(Similarity.ivfPqTopK(emb, queries, 5)) }
      finally Similarity.pqLutTile = 4096
    assert(tiled === whole)
  }

  test("density knobs: calibration points, floors/caps, bounded probed fraction") {
    // the r17 density triple — pin the exact values the shipped floors
    // were calibrated against (SURVEY r17 density row; Probe prints
    // these), so a knob-formula change forces a floor re-audit
    import Similarity.{densityNlist, densityNprobe, densityShortlistFactor,
      quantizerSampleSize, quantizerDriverSampleCap}
    // fixture calibration points (N = 500 / 2k / 20k / 50k)
    assert(densityNlist(500) === 16)       // cert-small keeps 16
    assert(densityNlist(2000) === 32)
    assert(densityNlist(20000) === 100)
    assert(densityNlist(50000) === 159)
    assert(densityNprobe(500, 16) === 6)
    assert(densityNprobe(2000, 32) === 12)
    assert(densityNprobe(20000, 100) === 36)
    assert(densityNprobe(50000, 159) === 57)
    assert(densityShortlistFactor(500) === 8)
    assert(densityShortlistFactor(2000) === 16)
    assert(densityShortlistFactor(20000) === 51)
    assert(densityShortlistFactor(50000) === 80)
    // floors and caps
    assert(densityNlist(10) === 16, "nlist floors at 16")
    // the r17 ceiling is GONE (r17 verdict weak-#2: min(√(N/2),
    // sample/4) froze nlist at 512 from N ≈ 0.5 M on, so nprobe's √N
    // growth silently saturated one decade above the sf1 cert) — the
    // sampler scales with the cell count instead
    assert(densityNlist(500000) === 500, "past the old knee")
    assert(densityNlist(2000000) === 1000,
      "nlist keeps scaling √N where the r17 sample cap froze it at 512")
    assert(quantizerSampleSize(500) === 39 * 500,
      "training sample scales ∝ 39·nlist (FAISS practice)")
    assert(quantizerSampleSize(16) === 2048, "small fixtures keep the floor")
    assert(quantizerSampleSize(10000) === quantizerDriverSampleCap,
      "past the driver budget the SAMPLE caps — training goes distributed")
    assert(densityNprobe(1L << 40, 64) === 64, "nprobe clamps to nlist")
    assert(densityShortlistFactor(1L << 40) === 256, "shortlist caps at 256")
    // the scale invariant the round exists for: across the certified
    // density range AND past the removed knee the probed fraction stays
    // bounded away from both brute (saturation) and blind (zero-cell)
    // regimes
    for (n <- Seq(500L, 2000L, 20000L, 50000L, 200000L, 1000000L, 10000000L)) {
      val nl = densityNlist(n)
      val frac = densityNprobe(n, nl).toDouble / nl
      assert(frac >= 0.2 && frac <= 0.5,
        s"probed fraction $frac out of [0.2, 0.5] at N=$n (nlist=$nl)")
    }
    // monotone: more corpus never means fewer cells or narrower probes
    val pts = Seq(500L, 2000L, 20000L, 50000L, 200000L, 1000000L)
    val nls = pts.map(densityNlist)
    assert(nls === nls.sorted, "nlist must be nondecreasing in N")
    val nps = pts.zip(nls).map { case (n, nl) => densityNprobe(n, nl) }
    assert(nps === nps.sorted, "nprobe must be nondecreasing in N")
  }

  test("distributed coarse-quantizer training matches the driver kernel's contract") {
    import spark.implicits._
    // a synthetic corpus big enough that nlist=24 under a tiny forced
    // driver budget exercises the DISTRIBUTED Lloyd path; determinism
    // and assignment sanity are the contract (exact centroid equality
    // with the driver kernel is not — init schemes differ by design)
    val n = 3000
    val dim = 8
    val vecs = spark.range(n.toLong).map { i =>
      val r = new java.util.Random(i)
      Array.fill(dim)(r.nextGaussian())
    }.toDF("cv")
    val init = vecs.limit(24).as[Array[Double]].collect()
    val ds = vecs.as[Array[Double]].map(v => (0L, v))
    val (cents, inertia) = Similarity.fitKMeans(ds, 24, iters = 6, init = Some(init))
    assert(cents.length === 24)
    assert(cents.forall(_.length == dim))
    // Lloyd guarantee: inertia non-increasing
    inertia.sliding(2).foreach { w =>
      assert(w(1) <= w(0) + 1e-9, s"inertia rose: ${w.toSeq}")
    }
    // deterministic: a second run reproduces identical centroids
    val (cents2, _) = Similarity.fitKMeans(ds, 24, iters = 6, init = Some(init))
    assert(cents.zip(cents2).forall { case (a, b) =>
      java.util.Arrays.equals(a, b)
    }, "distributed training must be deterministic")
    // every centroid is finite and assignment covers a sane cell spread
    val assigned = Similarity.ivfAssign(
      spark.range(n.toLong).map { i =>
        val r = new java.util.Random(i)
        (i, Array.fill(dim)(r.nextGaussian()))
      }.toDF("vec_id", "embedding"), cents)
    assert(assigned.select("cell").distinct().count() >= 12,
      "distributed quantizer left most cells empty")
  }
}
