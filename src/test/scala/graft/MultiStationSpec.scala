package graft

import graft.cascade.{Cascade, CascadeStatistics}
import graft.disagg.{Temperature, Wind}
import graft.meteo.Meteo
import graft.agg.Aggregations
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB scale-out axis: every operator takes partitionCols so a
  * multi-station frame processes all stations in one job, windows
  * partitioned per station. These tests verify that a 3-station stacked
  * frame produces, per station, exactly the single-station results. */
class MultiStationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val G = new java.io.File("src/test/resources/golden").getAbsolutePath

  lazy val daily = spark.read.option("header", "true")
    .option("inferSchema", "true").csv(s"$G/daily.csv.gz")
    .withColumn("date", to_date($"date")).limit(120).cache()

  def stacked = Seq("s1", "s2", "s3").map(id =>
    daily.withColumn("station_id", lit(id))).reduce(_ unionByName _)
    // different station order on disk to exercise partitioned windows
    .repartition(6, $"date")

  test("temperature: stacked frame == per-station runs") {
    val single = Temperature
      .disaggregate(Meteo.withSunTimes(daily, "date", 8.86, 51.0, 1.0),
        "sine_min_max", "fix")
      .select($"timestamp", $"temp".as("t_single"))
    val multi = Temperature.disaggregate(
      Meteo.withSunTimes(stacked, "date", 8.86, 51.0, 1.0),
      "sine_min_max", "fix", partitionCols = Seq("station_id"))
    assert(multi.count() == 3 * 120 * 24)
    val diffs = multi.join(single, "timestamp")
      .where(abs($"temp" - $"t_single") > 1e-9 ||
        $"temp".isNull =!= $"t_single".isNull)
    assert(diffs.count() == 0)
  }

  test("cascade: per-station determinism unaffected by other stations") {
    val precip = daily.select($"date", $"precip")
    // the hash draws key on (station_id, idx), so the comparable
    // single-station run carries the same station key; the property under
    // test is independence from OTHER stations in the same frame
    val singleS2 = Cascade.disaggregate(
        precip.withColumn("station_id", lit("s2")),
        Left(CascadeStatistics.sampleData()), seed = 9L,
        partitionCols = Seq("station_id"))
      .select($"timestamp", $"precip".as("p_single"))
    val multiIn = Seq("s1", "s2", "s3").map(id =>
      precip.withColumn("station_id", lit(id))).reduce(_ unionByName _)
    val multi = Cascade.disaggregate(multiIn,
      Left(CascadeStatistics.sampleData()), seed = 9L,
      partitionCols = Seq("station_id"))
    val diffs = multi.where($"station_id" === "s2")
      .join(singleS2, "timestamp")
      .where(abs($"precip" - $"p_single") > 1e-9 ||
        $"precip".isNull =!= $"p_single".isNull)
    assert(diffs.count() == 0)
    // conservation holds per station
    val sums = multi.groupBy($"station_id",
        to_date($"timestamp").as("date"))
      .agg(sum($"precip").as("s"))
    val bad = sums.join(precip, "date")
      .where($"precip".isNotNull && abs($"s" - $"precip") > 1e-9)
    assert(bad.count() == 0)
  }

  lazy val hourlyObs = spark.read.option("header", "true")
    .option("inferSchema", "true").csv(s"$G/hourly_obs.csv.gz")
    .select(to_timestamp($"timestamp").as("timestamp"),
      $"precip".cast("double").as("precip")).cache()

  // two stations with genuinely different series (s2 scaled + thinned) so
  // their calibrations differ — a global threshold would show up here
  def obsFor(id: String) =
    if (id == "s1") hourlyObs
    else hourlyObs.withColumn("precip",
      when(hour($"timestamp") % 5 === 0, 0.0).otherwise($"precip" * 1.7))

  def assertStatsEqual(got: CascadeStatistics, exp: CascadeStatistics,
      what: String): Unit = {
    def cmp(g: Array[Array[Double]], e: Array[Array[Double]], n: String) =
      for (b <- g.indices; t <- g(b).indices)
        assert((g(b)(t).isNaN && e(b)(t).isNaN) ||
          g(b)(t) == e(b)(t), s"$what.$n[$b][$t]")
    cmp(got.p01, exp.p01, "p01"); cmp(got.p10, exp.p10, "p10")
    cmp(got.pxx, exp.pxx, "pxx")
    for (k <- 0 until 7) cmp(got.wxx(k), exp.wxx(k), s"wxx[$k]")
    assert(got.threshold.sameElements(exp.threshold), s"$what.threshold")
  }

  test("per-station calibration == independent single-station calibrates") {
    val stackedObs = Seq("s1", "s2").map(id =>
      obsFor(id).withColumn("station_id", lit(id)))
      .reduce(_ unionByName _).repartition(8)
    val multi = Cascade.buildCascPerStation(stackedObs, hourly = true,
      percentile = 50, partitionCols = Seq("station_id"))
    assert(multi.keySet == Set(Seq("s1"), Seq("s2")))
    for (id <- Seq("s1", "s2")) {
      val Left(single) = Cascade.buildCasc(obsFor(id), hourly = true,
        percentile = 50).head : @unchecked
      val Left(got) = multi(Seq(id)).head : @unchecked
      assertStatsEqual(got, single, id)
    }
  }

  test("per-station calibration per-level == single-station per-level") {
    val stackedObs = Seq("s1", "s2").map(id =>
      obsFor(id).withColumn("station_id", lit(id)))
      .reduce(_ unionByName _)
    val multi = Cascade.buildCascPerStation(stackedObs, hourly = true,
      percentile = 90, avgStats = false,
      partitionCols = Seq("station_id"))
    for (id <- Seq("s1", "s2")) {
      val Right(single) = Cascade.buildCasc(obsFor(id), hourly = true,
        percentile = 90, avgStats = false).head : @unchecked
      val Right(got) = multi(Seq(id)).head : @unchecked
      assert(got.length == single.length)
      got.zip(single).zipWithIndex.foreach { case ((g, e), i) =>
        assertStatsEqual(g, e, s"$id.L$i") }
    }
  }

  test("per-station disaggregation rejects uncalibrated stations") {
    val precip = daily.select($"date", $"precip")
    val statsBy = Map(Seq("s1") ->
      (Left(CascadeStatistics.sampleData()): Either[CascadeStatistics,
        Seq[CascadeStatistics]]))
    val multiIn = Seq("s1", "sX").map(id =>
      precip.withColumn("station_id", lit(id))).reduce(_ unionByName _)
    val e = intercept[IllegalArgumentException] {
      Cascade.disaggregatePerStation(multiIn, statsBy,
        partitionCols = Seq("station_id"))
    }
    assert(e.getMessage.contains("sX"))
  }

  test("per-station disaggregation uses each station's own statistics") {
    val precip = daily.select($"date", $"precip")
    val Left(stats2) = Cascade.buildCasc(hourlyObs, hourly = true,
      percentile = 50).head : @unchecked
    val statsBy = Map(
      Seq("s1") -> Left(CascadeStatistics.sampleData()),
      Seq("s2") -> Left(stats2))
    val multiIn = Seq("s1", "s2").map(id =>
      precip.withColumn("station_id", lit(id))).reduce(_ unionByName _)
    val multi = Cascade.disaggregatePerStation(multiIn, statsBy, seed = 9L,
      partitionCols = Seq("station_id"))
    for (id <- Seq("s1", "s2")) {
      val single = Cascade.disaggregate(
          precip.withColumn("station_id", lit(id)), statsBy(Seq(id)),
          seed = 9L, partitionCols = Seq("station_id"))
        .select($"timestamp", $"precip".as("p_single"))
      val diffs = multi.where($"station_id" === id)
        .join(single, "timestamp")
        .where(abs($"precip" - $"p_single") > 0 ||
          $"precip".isNull =!= $"p_single".isNull)
      assert(diffs.count() == 0, s"station $id diverges")
    }
    // and the two stations' outputs DO differ (different stats in play)
    val s1 = multi.where($"station_id" === "s1")
      .select($"timestamp", $"precip".as("p1"))
    val s2 = multi.where($"station_id" === "s2")
      .select($"timestamp", $"precip".as("p2"))
    assert(s1.join(s2, "timestamp")
      .where(abs($"p1" - $"p2") > 1e-12).count() > 0)
  }

  test("dewpointRegressionByStation == per-station dewpointRegression") {
    // two stations with different temp/hum relationships so the fitted
    // (a1, a0) genuinely differ per station
    def obs(scale: Double) = (0 until 30 * 24).map { i =>
      (f"2016-01-${i / 24 + 1}%02d ${i % 24}%02d:00:00",
        270.0 + (i / 24) * scale + (i % 24) * 0.4,
        55.0 + (i % 24) * scale)
    }.toDF("s", "temp", "hum")
      .select(to_timestamp($"s").as("timestamp"), $"temp", $"hum")
    val stackedObs = Seq("s1" -> 1.0, "s2" -> 1.6).map { case (id, sc) =>
      obs(sc).withColumn("station_id", lit(id)) }
      .reduce(_ unionByName _).repartition(8)
    val got = graft.disagg.Humidity
      .dewpointRegressionByStation(stackedObs, Seq("station_id"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("a1"), r.getAs[Double]("a0"))).toMap
    assert(got.keySet == Set("s1", "s2"))
    for ((id, sc) <- Seq("s1" -> 1.0, "s2" -> 1.6)) {
      val (a1, a0) = graft.disagg.Humidity.dewpointRegression(obs(sc))
      // grouped and scalar fits accumulate partial sums in different
      // orders -> agreement is to rounding, not bit-exact
      assert(math.abs(got(id)._1 - a1) < 1e-9 * (1 + math.abs(a1)) &&
        math.abs(got(id)._2 - a0) < 1e-9 * (1 + math.abs(a0)),
        s"station $id diverges")
    }
    assert(math.abs(got("s1")._1 - got("s2")._1) > 1e-6)
  }

  test("wind cosinePerStation == scalar cosine with each station's fit") {
    val fits = Seq(("s1", 0.3, 1.0, 13.0), ("s2", 0.5, 0.9, 10.0),
      ("s3", 0.2, 1.1, 15.0)).toDF("station_id", "a", "b", "t_shift")
    val multi = Wind.cosinePerStation(
      stacked.select($"station_id", $"date", $"wind"), fits,
      Seq("station_id"))
    assert(multi.count() == 3 * 120 * 24)
    fits.collect().foreach { p =>
      val id = p.getString(0)
      val single = Wind.disaggregate(daily.select($"date", $"wind"),
          "cosine", a = p.getDouble(1), b = p.getDouble(2),
          tShift = p.getDouble(3))
        .select($"timestamp", $"wind".as("w_single"))
      val diffs = multi.where($"station_id" === id)
        .join(single, "timestamp")
        .where(abs($"wind" - $"w_single") > 1e-12 ||
          $"wind".isNull =!= $"w_single".isNull)
      assert(diffs.count() == 0, s"station $id diverges")
    }
  }

  test("daily aggregation keyed by station") {
    val hourly = Wind.disaggregate(stacked, "equal",
        partitionCols = Seq("station_id"))
    val d = Aggregations.dailyFromHourly(hourly,
      partitionCols = Seq("station_id"))
    assert(d.count() == 3 * 120)
    val perStation = d.groupBy($"station_id").count().collect()
    assert(perStation.forall(_.getLong(1) == 120))
  }
}
