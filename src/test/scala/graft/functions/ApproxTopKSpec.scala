package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class ApproxTopKSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: capacity >= NDV reproduces exact counts, err = 0") {
    val data = (1 to 500).map(i => s"v${i % 20}") // 20 distinct values
    val ds = data.toDF("v").as[String](Encoders.STRING)
    val out = ds.select(ApproxTopK.topK(5, 32).toColumn.name("topk"))
      .select(explode(col("topk")).as("kv"))
      .select($"kv.value", $"kv.cnt", $"kv.err")
      .collect()
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getLong(1) === exact(r.getString(0)))
      assert(r.getLong(2) === 0L)
    }
  }

  test("approximate regime: heavy hitters survive a full summary with bounded overestimate") {
    // skewed stream: 3 heavy values (1000 each) + 200 singleton tail values,
    // capacity 16 << 203 distinct
    val heavy = Seq("a", "b", "c").flatMap(v => Seq.fill(1000)(v))
    val tail = (1 to 200).map(i => s"t$i")
    val data = new scala.util.Random(42).shuffle(heavy ++ tail)
    val n = data.length.toLong
    val capacity = 16
    val ds = data.toDF("v").as[String](Encoders.STRING).repartition(4)
    val out = ds.select(ApproxTopK.topK(3, capacity).toColumn.name("topk"))
      .select(explode(col("topk")).as("kv"))
      .select($"kv.value", $"kv.cnt", $"kv.err")
      .collect()
    // every value with true freq > N/capacity (= 200) must be in the top-3
    assert(out.map(_.getString(0)).toSet === Set("a", "b", "c"))
    out.foreach { r =>
      // estimate never under the true count, over by at most the recorded err
      assert(r.getLong(1) >= 1000L)
      assert(r.getLong(1) - r.getLong(2) <= 1000L)
    }
  }
}
