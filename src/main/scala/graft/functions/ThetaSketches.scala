package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, UpdateSketch}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Theta-sketch distinct-set algebra (CH `uniqTheta` +
  * `uniqThetaUnion`/`uniqThetaIntersect`/`uniqThetaNot`; reference users
  * reach them through SQL passthrough, `clickhouse-arrow/src/client.rs:
  * 643`). Unlike HLL (`b_agg10`), theta sketches support INTERSECTION and
  * difference, which is what makes them the audience-overlap tool.
  *
  * Distribution shape: one JIT'd `mapPartitions` pass builds a compact
  * sketch per partition (the "-State" half); the driver unions the
  * per-partition sketches (the "-Merge" half) — driver traffic is
  * #partitions × sketch bytes (k-bounded, ≤ ~32 KiB each), independent
  * of row count, the same contract as the k-means trainer. Below k=4096
  * distinct keys a theta sketch is EXACT (no sampling has started), so
  * the sf0.01 oracle can compare against true distinct counts; the
  * approximate regime is spec-bounded in ThetaSpec.
  */
object ThetaSketches {

  /** Compact sketch of the distinct values of `keyCol` (one scan). */
  def distinctSketch(df: DataFrame, keyCol: String): CompactSketch = {
    val parts = df
      .select(col(keyCol).cast("long"))
      .as[Long](Encoders.scalaLong)
      .mapPartitions { it =>
        val sk = UpdateSketch.builder().build()
        it.foreach(sk.update)
        Iterator.single(sk.compact().toByteArray)
      }(Encoders.BINARY)
      .collect()
    val u = SetOperation.builder().buildUnion()
    parts.foreach(b => u.union(CompactSketch.wrap(Memory.wrap(b))))
    u.getResult
  }

  def union(a: Sketch, b: Sketch): CompactSketch = {
    val u = SetOperation.builder().buildUnion()
    u.union(a); u.union(b)
    u.getResult
  }

  def intersect(a: Sketch, b: Sketch): CompactSketch = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(a); i.intersect(b)
    i.getResult
  }

  /** a \ b (CH `uniqThetaNot`). */
  def aNotB(a: Sketch, b: Sketch): CompactSketch =
    SetOperation.builder().buildANotB().aNotB(a, b)
}
