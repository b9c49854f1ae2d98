package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Every CH dialect alias resolves from SQL text and agrees with the
  * Spark-native spelling it maps onto. */
class ChDialectSpec extends SparkSpec {
  import spark.implicits._

  private def one(sql: String): Any =
    spark.sql(s"SELECT $sql AS r").head.get(0)

  test("conditional aggregates match their -If combinator semantics") {
    Seq((1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)).toDF("id", "v")
      .createOrReplaceTempView("chd")
    val r = spark.sql(
      """SELECT countIf(id % 2 = 0) AS c, sumIf(v, id > 1) AS s,
        |  avgIf(v, id > 2) AS a, minIf(v, id > 1) AS mn, maxIf(v, id < 4) AS mx
        |FROM chd""".stripMargin).head
    assert(r === Row(2L, 90.0, 35.0, 20.0, 30.0))
  }

  test("distinct and sketch aggregates") {
    Seq(1, 2, 2, 3, 3, 3).toDF("x").createOrReplaceTempView("chu")
    assert(spark.sql("SELECT uniqExact(x) FROM chu").head.get(0) === 3)
    val hll = spark.sql("SELECT uniq(x) FROM chu").head.getLong(0)
    assert(hll >= 2L && hll <= 4L) // approximate
    assert(spark.sql("SELECT groupUniqArray(x) FROM chu").head
      .getSeq[Int](0).sorted === Seq(1, 2, 3))
    assert(spark.sql("SELECT median(x) FROM chu").head.get(0).toString.toDouble === 2.5)
    assert(spark.sql("SELECT quantileExact(x, 0.0) FROM chu").head.get(0).toString.toDouble === 1.0)
  }

  test("to* conversions, date helpers, arithmetic spellings") {
    assert(one("toInt32('42')") === 42)
    assert(one("toUInt64('18446744073709551615')").toString === "18446744073709551615")
    assert(one("toString(7.5)") === "7.5")
    assert(one("toDate('2024-05-17')").toString === "2024-05-17")
    assert(one("toStartOfMonth(toDate('2024-05-17'))").toString === "2024-05-01")
    assert(one("toYYYYMM(toDate('2024-05-17'))") === 202405)
    assert(one("toYYYYMMDD(toDate('2024-05-17'))") === 20240517)
    assert(one("intDiv(7, 2)") === 3L)
    assert(one("modulo(7, 3)") === 1)
    assert(one("plus(2, 3)") === 5 && one("minus(5, 2)") === 3)
    assert(one("multiply(4, 3)") === 12 && one("divide(7, 2)") === 3.5)
    assert(one("bitAnd(12, 10)") === 8 && one("bitXor(12, 10)") === 6)
    assert(one("bitShiftLeft(1, 4)") === 16)
  }

  test("array and string spellings") {
    assert(one("has(array(1,2,3), 2)") === true)
    assert(one("indexOf(array(10,20,30), 30)") === 3L)
    assert(one("arrayDistinct(array(1,1,2))").asInstanceOf[scala.collection.Seq[_]].toSeq === Seq(1, 2))
    assert(one("arraySort(array(3,1,2))").asInstanceOf[scala.collection.Seq[_]].toSeq === Seq(1, 2, 3))
    assert(one("arrayStringConcat(array('a','b'), '-')") === "a-b")
    assert(one("arraySum(array(1.5, 2.5))") === 4.0)
    assert(one("lowerUTF8('ÅBC')") === "åbc")
    assert(one("lengthUTF8('héllo')") === 5)
    assert(one("match('abc123', '[a-z]+[0-9]+')") === true)
    assert(one("replaceAll('a-b-c', '-', '_')") === "a_b_c")
    assert(one("replaceRegexpAll('a1b2', '[0-9]', '#')") === "a#b#")
    assert(one("splitByChar('.', 'a.b.c')").asInstanceOf[scala.collection.Seq[_]].toSeq === Seq("a", "b", "c"))
    assert(one("positionUTF8('hello', 'll')") === 3)
  }

  test("arrayJoin explodes like the CH row expander") {
    Seq((1, Seq("x", "y"))).toDF("id", "tags").createOrReplaceTempView("chaj")
    val rows = spark.sql("SELECT id, arrayJoin(tags) AS t FROM chaj")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows === Seq((1, "x"), (1, "y")))
  }
}
