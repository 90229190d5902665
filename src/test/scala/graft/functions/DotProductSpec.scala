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

  test("integer element arrays work (the composed form accepted them)") {
    val df = Seq((Array(1, 2, 3), Array(4L, 5L, 6L)))
      .toDF("ai", "al")
    val r = df.select(
      GraftFunctions.dot($"ai", $"al"),
      GraftFunctions.dot($"ai", $"ai")).head()
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 14.0)
  }

  test("mixed float/double element types work") {
    val df = Seq((Array(1.0f, 2.0f), Array(0.5, 0.25)))
      .toDF("a", "b")
    assert(df.select(GraftFunctions.dot($"a", $"b")).head()
      .getDouble(0) == 1.0)
  }

  test("SQL surface: scalar functions match their Column-API twins") {
    GraftExtensions.register(spark)
    val docs = Seq((1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "el rapido zorro marron salta sobre el perro perezoso"))
      .toDF("id", "text")
    docs.createOrReplaceTempView("ext_docs")
    val sql = spark.sql(
      """SELECT id, graft_token_count(text) AS tc,
        |  graft_language_id(text) AS lang,
        |  graft_fingerprint(text) AS fp, graft_simhash(text) AS sh,
        |  graft_quality_score(text) AS q
        |FROM ext_docs ORDER BY id""".stripMargin).collect()
    val api = docs.select($"id",
        graft.text.TextAnalysis.tokenCount($"text").as("tc"),
        graft.text.TextAnalysis.languageId($"text").as("lang"),
        graft.text.TextAnalysis.fingerprint($"text").as("fp"),
        graft.text.Dedup.simhash($"text").as("sh"),
        graft.text.TextAnalysis.qualityScore($"text").as("q"))
      .orderBy($"id").collect()
    assert(sql.map(_.toSeq).toSeq == api.map(_.toSeq).toSeq)
    assert(sql(0).getAs[String]("lang") == "en")
    // meteo twins on a numeric frame
    val m = spark.sql(
      "SELECT graft_vapor_pressure(15.0D, 70.0D) AS vp, " +
        "graft_dewpoint(15.0D, 70.0D) AS dp, " +
        "graft_sat_vapor_pressure(15.0D) AS svp").head()
    val mApi = spark.range(1).select(
      graft.meteo.Meteo.vaporPressure(lit(15.0), lit(70.0)),
      graft.meteo.Meteo.dewpointTemperature(lit(15.0), lit(70.0)),
      graft.meteo.Meteo.saturationVaporPressure(lit(15.0))).head()
    assert(m.toSeq == mApi.toSeq)
    // cosine + hamming round out the similarity surface
    assert(spark.sql("SELECT graft_cosine(array(1.0D, 0.0D), " +
      "array(1.0D, 0.0D)) AS c").head().getDouble(0) == 1.0)
    assert(spark.sql("SELECT graft_hamming(5L, 6L) AS h").head()
      .getInt(0) == 2)
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
