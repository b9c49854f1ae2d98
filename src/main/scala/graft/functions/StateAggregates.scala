package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable aggregate states (SURVEY.md §2.2 B-AGG8).
  *
  * ClickHouse's `-State`/`-Merge` combinators expose an aggregate's partial
  * state as a first-class value (`Type::AggregateFunction`, reference
  * `clickhouse-arrow/src/native/types.rs:120-126`; opaque state
  * `native/values.rs:114`). Spark's equivalent is an
  * `Aggregator[IN, BUF, OUT]` whose BUF is exactly such a mergeable state:
  * Spark automatically splits it into partial (map-side) and merge
  * (reduce-side) steps — the same two-phase model ClickHouse uses.
  */
object StateAggregates {

  /** Welford/Chan parallel-merge state for mean+variance: the canonical
    * "partial aggregation state" — associative merge, numerically stable.
    */
  final case class MomentsState(n: Long, mean: Double, m2: Double) {
    def add(x: Double): MomentsState = {
      val n1 = n + 1
      val delta = x - mean
      val mean1 = mean + delta / n1
      MomentsState(n1, mean1, m2 + delta * (x - mean1))
    }
    def merge(o: MomentsState): MomentsState =
      if (n == 0) o
      else if (o.n == 0) this
      else {
        val nt = n + o.n
        val delta = o.mean - mean
        MomentsState(
          nt,
          mean + delta * o.n / nt,
          m2 + o.m2 + delta * delta * n.toDouble * o.n.toDouble / nt)
      }
    def varSamp: Double = if (n < 2) Double.NaN else m2 / (n - 1)
  }

  /** Sample variance via an explicitly mergeable state. */
  object VarSampAggregator extends Aggregator[Double, MomentsState, Double] {
    override def zero: MomentsState = MomentsState(0L, 0.0, 0.0)
    override def reduce(b: MomentsState, a: Double): MomentsState = b.add(a)
    override def merge(b1: MomentsState, b2: MomentsState): MomentsState = b1.merge(b2)
    override def finish(r: MomentsState): Double = r.varSamp
    override def bufferEncoder: Encoder[MomentsState] = Encoders.product[MomentsState]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** `var_samp` computed through the mergeable-state path. */
  def varSampState(c: Column): Column = udaf(VarSampAggregator).apply(c)

  /** Kahan compensated summation state (CH `sumKahan`): the running
    * compensation `c` carries the low-order bits a plain double sum
    * drops. Merge sums both partials and both compensations — the
    * associativity loss is bounded by one rounding per merge, vs one per
    * ROW for the naive sum. StateAggregatesSpec shows the adversarial
    * case where naive summation loses 1.0s next to 1e16.
    */
  final case class KahanState(sum: Double, c: Double) {
    def add(x: Double): KahanState = {
      val y = x - c
      val t = sum + y
      KahanState(t, (t - sum) - y)
    }
    def merge(o: KahanState): KahanState = {
      val y = o.sum - c
      val t = sum + y
      KahanState(t, ((t - sum) - y) + o.c)
    }
    def value: Double = sum - c
  }

  object KahanSumAggregator extends Aggregator[Double, KahanState, Double] {
    override def zero: KahanState = KahanState(0.0, 0.0)
    override def reduce(b: KahanState, a: Double): KahanState = b.add(a)
    override def merge(b1: KahanState, b2: KahanState): KahanState = b1.merge(b2)
    override def finish(r: KahanState): Double = r.value
    override def bufferEncoder: Encoder[KahanState] = Encoders.product[KahanState]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** CH `sumKahan` through the mergeable-state path. */
  def sumKahan(c: Column): Column = udaf(KahanSumAggregator).apply(c)
}
