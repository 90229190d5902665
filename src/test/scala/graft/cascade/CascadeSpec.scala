package graft.cascade

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CascadeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val G = new java.io.File("src/test/resources/golden").getAbsolutePath

  lazy val hourlyPrecip: DataFrame = spark.read
    .option("header", "true").option("inferSchema", "true")
    .csv(s"$G/hourly_obs.csv.gz")
    .select(to_timestamp($"timestamp").as("timestamp"),
      $"precip".cast("double").as("precip")).cache()

  def loadStats(path: String): Seq[CascadeStatistics] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val src = scala.io.Source.fromFile(path)
    val parsed = try JsonMethods.parse(src.mkString) finally src.close()
    def arr2(v: JValue): Array[Array[Double]] =
      v.values.asInstanceOf[List[List[Any]]]
        .map(_.map(x => x.asInstanceOf[Number].doubleValue()).toArray)
        .toArray
    def arr3(v: JValue): Array[Array[Array[Double]]] =
      v.values.asInstanceOf[List[List[List[Any]]]]
        .map(_.map(_.map(x => x.asInstanceOf[Number].doubleValue()).toArray)
          .toArray).toArray
    def one(j: JValue): CascadeStatistics = CascadeStatistics(
      arr2(j \ "p01"), arr2(j \ "p10"), arr2(j \ "pxx"), arr3(j \ "wxx"),
      (j \ "threshold").values.asInstanceOf[List[Any]]
        .map(x => x.asInstanceOf[Number].doubleValue()).toArray,
      (j \ "percentile").values.asInstanceOf[Number].doubleValue())
    parsed match {
      case JArray(items) => items.map(one)
      case j => Seq(one(j))
    }
  }

  def assertClose(got: Array[Array[Double]], exp: Array[Array[Double]],
      what: String, tol: Double = 1e-9): Unit =
    for (b <- got.indices; t <- got(b).indices) {
      val g = got(b)(t); val e = exp(b)(t)
      assert((g.isNaN && e.isNaN) || math.abs(g - e) <= tol,
        s"$what[$b][$t]: $g vs $e")
    }

  test("buildCasc avg stats match reference calibration (p50)") {
    val Seq(exp) = loadStats(s"$G/casc_stats.json")
    val Left(got) = Cascade.buildCasc(hourlyPrecip, hourly = true,
      percentile = 50).head : @unchecked
    assert(got.threshold.zip(exp.threshold)
      .forall { case (a, b) => math.abs(a - b) < 1e-9 },
      s"thresholds ${got.threshold.toSeq} vs ${exp.threshold.toSeq}")
    assertClose(got.p01, exp.p01, "p01")
    assertClose(got.p10, exp.p10, "p10")
    assertClose(got.pxx, exp.pxx, "pxx")
    for (k <- 0 until 7)
      assertClose(got.wxx(k), exp.wxx(k), s"wxx[$k]")
  }

  test("buildCasc per-level stats match reference calibration (p90)") {
    val exp = loadStats(s"$G/casc_stats_p90_levels.json")
    val Right(got) = Cascade.buildCasc(hourlyPrecip, hourly = true,
      percentile = 90, avgStats = false).head : @unchecked
    assert(got.length == exp.length)
    got.zip(exp).zipWithIndex.foreach { case ((g, e), i) =>
      assert(math.abs(g.threshold(0) - e.threshold(0)) < 1e-9,
        s"level $i threshold")
      assertClose(g.p01, e.p01, s"L$i.p01")
      assertClose(g.p10, e.p10, s"L$i.p10")
      assertClose(g.pxx, e.pxx, s"L$i.pxx")
      for (k <- 0 until 7) assertClose(g.wxx(k), e.wxx(k), s"L$i.wxx[$k]")
    }
  }

  def dailyFixture: DataFrame = {
    val rng = new scala.util.Random(123)
    val rows = (0 until 120).map { i =>
      val d = java.time.LocalDate.of(2016, 3, 1).plusDays(i)
      val v: java.lang.Double =
        if (i % 17 == 0) null
        else if (rng.nextDouble() < 0.5) 0.0
        else math.rint(rng.nextDouble() * 2000) / 100.0
      (java.sql.Date.valueOf(d), v)
    }
    rows.toDF("date", "precip")
  }

  test("hourly cascade conserves daily mass and restores missing days") {
    val daily = dailyFixture
    val out = Cascade.disaggregate(daily,
      Left(CascadeStatistics.sampleData()), hourly = true, seed = 99L)
    assert(out.count() == 120 * 24)
    val sums = out.groupBy(to_date($"timestamp").as("date"))
      .agg(sum($"precip").as("s"), count($"precip").as("nonnull"))
    val joined = daily.join(sums, "date").collect()
    joined.foreach { r =>
      val expected = r.getAs[java.lang.Double]("precip")
      if (expected == null)
        assert(r.getAs[Long]("nonnull") == 0, s"missing day not null: $r")
      else
        assert(math.abs(r.getAs[Double]("s") - expected) <= 1e-9,
          s"mass not conserved: $r")
    }
  }

  test("pluggable md5 draw: same invariants, different draws") {
    import org.apache.spark.sql.Column
    val md5Draw = (seed: Long, cols: Seq[Column]) =>
      graft.functions.Draws.md5Uniform(seed, cols)
    val daily = dailyFixture
    val m = Cascade.disaggregate(daily,
      Left(CascadeStatistics.sampleData()), hourly = true, seed = 99L,
      draw = md5Draw)
    // conservation + missing-day restore hold under any draw function
    val sums = m.groupBy(to_date($"timestamp").as("date"))
      .agg(sum($"precip").as("s"), count($"precip").as("nonnull"))
    daily.join(sums, "date").collect().foreach { r =>
      val expected = r.getAs[java.lang.Double]("precip")
      if (expected == null)
        assert(r.getAs[Long]("nonnull") == 0)
      else assert(math.abs(r.getAs[Double]("s") - expected) <= 1e-9)
    }
    // and the draws genuinely differ from the xxhash production path
    val x = Cascade.disaggregate(daily,
      Left(CascadeStatistics.sampleData()), hourly = true, seed = 99L)
    assert(m.join(x.withColumnRenamed("precip", "p2"), "timestamp")
      .where($"precip" =!= $"p2").count() > 0)
  }

  test("cascade is deterministic for a fixed seed, differs across seeds") {
    val daily = dailyFixture
    val a = Cascade.disaggregate(daily,
      Left(CascadeStatistics.sampleData()), seed = 5L)
    val b = Cascade.disaggregate(daily,
      Left(CascadeStatistics.sampleData()), seed = 5L)
    val c = Cascade.disaggregate(daily,
      Left(CascadeStatistics.sampleData()), seed = 6L)
    assert(a.join(b.withColumnRenamed("precip", "p2"), "timestamp")
      .where(($"precip" =!= $"p2") ||
        ($"precip".isNull =!= $"p2".isNull)).count() == 0)
    assert(a.join(c.withColumnRenamed("precip", "p2"), "timestamp")
      .where($"precip" =!= $"p2").count() > 0)
  }

  test("cascade determinism is partitioning-independent") {
    val daily = dailyFixture
    val a = Cascade.disaggregate(daily.repartition(1),
      Left(CascadeStatistics.sampleData()), seed = 11L)
    val b = Cascade.disaggregate(daily.repartition(7),
      Left(CascadeStatistics.sampleData()), seed = 11L)
    assert(a.join(b.withColumnRenamed("precip", "p2"), "timestamp")
      .where($"precip" =!= $"p2").count() == 0)
  }

  test("5-min cascade (level 9) conserves mass at 288 steps/day") {
    val daily = dailyFixture.limit(40)
    // a level-9 calibration carries 9 per-level thresholds
    val stats9 = CascadeStatistics.sampleData().copy(
      threshold = Array(0.05, 0.08, 0.12, 0.2, 0.35, 0.6, 1.0, 1.7, 2.8))
    val out = Cascade.disaggregate(daily,
      Left(stats9), hourly = false, level = 9,
      seed = 4L)
    assert(out.count() == 40 * 288)
    val sums = out.groupBy(to_date($"timestamp").as("date"))
      .agg(sum($"precip").as("s"))
    val joined = daily.join(sums, "date")
      .where($"precip".isNotNull).collect()
    joined.foreach { r =>
      assert(math.abs(r.getAs[Double]("s") -
        r.getAs[Double]("precip")) <= 1e-9, s"5min mass: $r")
    }
  }

  test("per-level stats list drives disaggregation (avg_stats=false)") {
    val Right(levels) = Cascade.buildCasc(hourlyPrecip, hourly = true,
      percentile = 90, avgStats = false).head : @unchecked
    val daily = dailyFixture
    val out = Cascade.disaggregate(daily, Right(levels), seed = 3L)
    val sums = out.groupBy(to_date($"timestamp").as("date"))
      .agg(sum($"precip").as("s"))
    val bad = daily.join(sums, "date")
      .where($"precip".isNotNull && abs($"s" - $"precip") > 1e-9)
    assert(bad.count() == 0)
  }

  test("disaggregateDebug (test=True) dumps every level, mass-exact") {
    val daily = dailyFixture.limit(20)
    val levels = Cascade.disaggregateDebug(daily,
      Left(CascadeStatistics.sampleData()), hourly = true, seed = 99L)
    assert(levels.map(_._1) == (1 to 5))
    val totalIn = daily.agg(sum(coalesce($"precip", lit(0.0)))).head()
      .getDouble(0)
    levels.foreach { case (l, df) =>
      assert(df.count() == 20L * (1L << l), s"level $l box count")
      val s = df.agg(sum($"v")).head().getDouble(0)
      assert(math.abs(s - totalIn) <= 1e-9, s"level $l mass: $s")
    }
    // the debug chain IS the disaggregation chain: the same seed's final
    // level carries exactly the mass disaggregate() spreads over hours
    val lastMass = levels.last._2.agg(sum($"v")).head().getDouble(0)
    val outMass = Cascade.disaggregate(daily,
      Left(CascadeStatistics.sampleData()), hourly = true, seed = 99L)
      .agg(sum($"precip")).head().getDouble(0)
    assert(math.abs(lastMass - outMass) <= 1e-9)
  }

  test("shift lags the series") {
    val daily = dailyFixture.limit(10)
    val out = Cascade.disaggregate(daily,
      Left(CascadeStatistics.sampleData()), shift = 7, seed = 2L)
    val firstRows = out.orderBy($"timestamp").limit(7)
      .where($"precip".isNotNull).count()
    assert(firstRows == 0)
  }
}
