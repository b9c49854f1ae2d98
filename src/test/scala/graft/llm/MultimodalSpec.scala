package graft.llm

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("aHash: identical payloads collide, small edits stay near, distinct differ") {
    val base = Array.tabulate[Byte](640)(i => ((i * 37 + 11) % 251).toByte)
    val same = base.clone()
    assert(Multimodal.aHash(base) === Multimodal.aHash(same))

    // one flipped byte perturbs at most a couple of grid cells
    val nearDup = base.clone()
    nearDup(300) = (nearDup(300) ^ 0x7f).toByte
    assert(hamming(Multimodal.aHash(base), Multimodal.aHash(nearDup)) <= 8)

    // structurally different payload lands far away
    val other = Array.tabulate[Byte](640)(i => ((i * i * 13 + 7) % 251).toByte)
    assert(hamming(Multimodal.aHash(base), Multimodal.aHash(other)) > 8)

    // degenerate inputs don't throw
    assert(Multimodal.aHash(Array.empty[Byte]) === 0L)
    assert(Multimodal.aHash(Array[Byte](42)) === Multimodal.aHash(Array[Byte](42)))
  }

  test("phash dedup query finds exactly the injected twins") {
    val out = graft.SparkEntry.queries("x_mm_phash_dedup")(spark, sf001)
      .collect()
    assert(out.nonEmpty, "injected twins should produce dup groups")
    assert(out.forall(_.getAs[Long]("n_dups") >= 2))
    val keepers = out.map(_.getAs[Long]("keeper"))
    assert(keepers.forall(_ < 20000000L), "keeper must be the original, not the twin")
  }
}
