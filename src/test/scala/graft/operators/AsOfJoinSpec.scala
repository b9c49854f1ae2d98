package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("leftAsOf picks the latest right row at or before the left timestamp") {
    val left = Seq(
      (1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e0"),
      (2L, 15L, "e3")).toDF("k", "ts", "name")
    val right = Seq(
      (1L, 10L, "p10"), (1L, 18L, "p18"),
      (2L, 16L, "p16")).toDF("k", "ts", "pname")

    val out = AsOfJoin
      .leftAsOf(left, right.withColumnRenamed("ts", "rts"), Seq("k"), "ts", "rts", Seq("pname"))
      .select("name", "pname")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap

    assert(out("e0") === None) // before any right row
    assert(out("e1") === Some("p10")) // equal timestamp matches
    assert(out("e2") === Some("p18")) // latest at-or-before
    assert(out("e3") === None) // right row is strictly later
  }

  test("all four asof directions pick the right neighbor") {
    val left = Seq((1L, 10L, "L")).toDF("k", "ts", "name")
    val right = Seq(
      (1L, 5L, "r5"), (1L, 10L, "r10"), (1L, 15L, "r15")).toDF("k", "rts", "p")
    def run(dir: String): Option[String] =
      Option(AsOfJoin.leftAsOf(left, right, Seq("k"), "ts", "rts", Seq("p"), dir)
        .select("p").head.getString(0))
    assert(run(">=") === Some("r10")) // latest at-or-before
    assert(run(">") === Some("r5")) // latest strictly before
    assert(run("<=") === Some("r10")) // earliest at-or-after
    assert(run("<") === Some("r15")) // earliest strictly after
  }

  test("forward asof finds nothing when all right rows are earlier") {
    val left = Seq((1L, 100L, "L")).toDF("k", "ts", "name")
    val right = Seq((1L, 5L, "r5")).toDF("k", "rts", "p")
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "ts", "rts", Seq("p"), "<")
      .select("p").head
    assert(out.isNullAt(0))
  }

  test("asof query plan shuffles once per side (no range-join explosion)") {
    val df = graft.SparkEntry.queries("b_jn7_asof")(spark, sf0001)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"))
    assert(!physical.contains("BroadcastNestedLoopJoin"))
  }
}
