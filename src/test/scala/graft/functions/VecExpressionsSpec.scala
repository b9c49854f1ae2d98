package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class VecExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_cosine/vec_dot/vec_norm match the JIT'd kernel on fixture vectors") {
    val rows = Tables.t(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(50)
      .withColumn("rv", reverse(col("v")))
      .select(col("vec_id"),
        expr("vec_cosine(v, rv)").as("cos"),
        expr("vec_dot(v, rv)").as("dot"),
        expr("vec_norm(v)").as("nrm"),
        col("v"), col("rv"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Double](4).toArray
      val rv = r.getSeq[Double](5).toArray
      val dot = v.zip(rv).map { case (a, b) => a * b }.sum
      val expected = dot /
        (math.sqrt(v.map(x => x * x).sum) * math.sqrt(rv.map(x => x * x).sum))
      assert(math.abs(r.getDouble(1) - expected) < 1e-12)
      assert(math.abs(r.getDouble(3) - math.sqrt(v.map(x => x * x).sum)) < 1e-12)
      assert(math.abs(r.getDouble(2) - v.zip(rv).map { case (a, b) => a * b }.sum) < 1e-12)
    }
  }

  test("SQL registration, null propagation, null elements, zero-norm guard") {
    // registered via GraftExtensions: resolvable from SQL text
    val basic = spark.sql(
      "SELECT vec_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c").collect()(0).getDouble(0)
    assert(basic === 0.0)
    val same = spark.sql(
      "SELECT vec_cosine(array(2.0D, 1.0D), array(2.0D, 1.0D)) AS c").collect()(0).getDouble(0)
    assert(math.abs(same - 1.0) < 1e-12)
    // null argument -> null result (nullSafeEval)
    assert(spark.sql("SELECT vec_cosine(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D))")
      .collect()(0).isNullAt(0))
    // null ELEMENT counts as zero
    assert(spark.sql("SELECT vec_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 5.0D)) AS d")
      .collect()(0).getDouble(0) === 1.0)
    // zero-norm side -> 0.0, never NaN
    assert(spark.sql("SELECT vec_cosine(array(0.0D, 0.0D), array(1.0D, 1.0D)) AS c")
      .collect()(0).getDouble(0) === 0.0)
    // wrong type fails analysis, not execution
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_norm('nope')").collect()
    }
  }

  test("the expression stays inside whole-stage codegen on a parquet-backed plan") {
    val df = Tables.t(spark, sf0001, "embeddings")
      .select(expr("vec_norm(cast(embedding as array<double>))").as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no WholeStageCodegen span in:\n$plan")
    assert(df.limit(5).collect().forall(r => r.getDouble(0) > 0.0))
  }
}
