package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DotProductSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** the composed higher-order form the native expression replaces */
  private def hofDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  lazy val vecs = {
    val rng = new scala.util.Random(7)
    (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rng.nextFloat() * 2 - 1),
        Array.fill(64)(rng.nextFloat() * 2 - 1))
    }.toDF("id", "a", "b").cache()
  }

  test("native dot is bit-identical to the composed HOF form") {
    val diff = vecs
      .withColumn("n", GraftFunctions.dot($"a", $"b"))
      .withColumn("h", hofDot($"a", $"b"))
      .where($"n" =!= $"h" || $"n".isNull =!= $"h".isNull)
    assert(diff.count() == 0)
  }

  test("null input, length mismatch, null element -> null") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (2L, null, Array(1.0f)),
      (3L, Array(1.0f, 2.0f), Array(1.0f))
    ).toDF("id", "a", "b")
    val out = df.select($"id", GraftFunctions.dot($"a", $"b").as("d"))
      .orderBy($"id").collect()
    assert(out(0).getDouble(1) == 11.0)
    assert(out(1).isNullAt(1))
    assert(out(2).isNullAt(1)) // length mismatch, like zip_with padding
    val withNullElem = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS a, " +
        "array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT)) AS b")
    GraftExtensions.register(spark)
    assert(withNullElem.selectExpr("graft_dot(a, b) AS d").head()
      .isNullAt(0))
  }

  test("mixed float/double element types work") {
    val df = Seq((Array(1.0f, 2.0f), Array(0.5, 0.25)))
      .toDF("a", "b")
    assert(df.select(GraftFunctions.dot($"a", $"b")).head()
      .getDouble(0) == 1.0)
  }

  test("SQL registration exposes graft_dot; plan stays codegen'd") {
    GraftExtensions.register(spark)
    val v = spark.sql(
      """SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d"""
        .stripMargin).head().getDouble(0)
    assert(v == 11.0)
    // the projection containing the native dot compiles into
    // whole-stage codegen — the leading `*(n)` marks the codegen stage
    // (the HOF form keeps the project codegen'd but evaluates the
    // aggregate/zip_with lambdas interpreted inside it; the native
    // expression generates the loop)
    val plan = vecs.select(GraftFunctions.dot($"a", $"b").as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_dot("), plan)
  }
}
