package graft.api

import graft.TestSpark
import graft.stats.StationStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StationSessionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val G = new java.io.File("src/test/resources/golden").getAbsolutePath
  val station = Station("t1", "fixture", 8.86, 51.0, 1.0)

  lazy val daily = spark.read.option("header", "true")
    .option("inferSchema", "true").csv(s"$G/daily.csv.gz")
    .withColumn("date", to_date($"date")).cache()
  lazy val hourlyObs = spark.read.option("header", "true")
    .option("inferSchema", "true").csv(s"$G/hourly_obs.csv.gz")
    .withColumn("timestamp", to_timestamp($"timestamp")).cache()
  lazy val refStats = StationStats.readJson(s"$G/station_stats.json")

  lazy val session = new StationSession(spark, station, daily,
    Some(hourlyObs), refStats)

  test("temperature disaggregation through the facade") {
    val t = session.disaggregateTemperature("sine_min_max",
      "sun_loc_shift")
    assert(t.count() == daily.count() * 24)
    assert(t.where($"temp".isNull).count() == 0)
  }

  test("humidity month_hour_precip_mean uses the stats lookup") {
    val h = session.disaggregateHumidity("month_hour_precip_mean")
    val bounds = h.agg(min($"hum"), max($"hum")).head()
    assert(bounds.getDouble(0) >= 0 && bounds.getDouble(1) <= 100)
  }

  test("wind cosine via stats params") {
    val w = session.disaggregateWind("cosine")
    assert(w.count() == daily.count() * 24)
  }

  test("radiation via mean course from stats") {
    val g = session.disaggregateRadiation("mean_course")
    assert(g.where($"glob" < 0).count() == 0)
  }

  test("cascade precipitation conserves mass via the facade") {
    val p = session.disaggregatePrecipitation("cascade")
    val back = p.groupBy(to_date($"timestamp").as("date"))
      .agg(sum($"precip").as("s"))
    val joined = daily.select($"date", $"precip").join(back, "date")
      .where($"precip".isNotNull)
      .where(abs($"precip" - $"s") > 1e-6)
    assert(joined.count() == 0)
  }

  test("calibrate() computes stats close to the reference's") {
    val calibrated = session.calibrate()
    val s = calibrated.stats
    assert(math.abs(s.hum.a0.get - refStats.hum.a0.get) < 1e-6)
    assert(math.abs(s.hum.a1.get - refStats.hum.a1.get) < 1e-6)
    val Left(c) = s.precip.stats.get.head : @unchecked
    val Left(r) = refStats.precip.stats.get.head : @unchecked
    assert(c.threshold.zip(r.threshold)
      .forall { case (a, b) => math.abs(a - b) < 1e-9 })
    val cp = c.p01.toSeq.flatMap(_.toSeq)
    val rp = r.p01.toSeq.flatMap(_.toSeq)
    assert(cp.zip(rp).forall { case (a, b) =>
      (a.isNaN && b.isNaN) || math.abs(a - b) < 1e-9 })
    // max_delta matches reference-computed monthly shifts
    s.temp.maxDelta.get.foreach { case (m, v) =>
      assert(math.abs(v - refStats.temp.maxDelta.get(m)) < 1e-6,
        s"month $m: $v vs ${refStats.temp.maxDelta.get(m)}")
    }
  }

  test("interpolate scatters daily values and fills linearly") {
    val out = session.interpolate(Map("tmin" -> 7, "tmax" -> 14))
    assert(out.count() == daily.count() * 24)
    // at the scatter hours the original values survive
    val at7 = out.where(hour($"timestamp") === 7)
      .withColumn("date", to_date($"timestamp"))
      .join(daily.select($"date", $"tmin"), "date")
      .where(abs($"v" - $"tmin") > 1e-9)
    assert(at7.count() == 0)
  }
}
