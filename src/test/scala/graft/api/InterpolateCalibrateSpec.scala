package graft.api

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class InterpolateCalibrateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val G = new java.io.File("src/test/resources/golden").getAbsolutePath
  val station = Station("t1", "fixture", 8.86, 51.0, 1.0)

  lazy val daily = spark.read.option("header", "true")
    .option("inferSchema", "true").csv(s"$G/daily.csv.gz")
    .withColumn("date", to_date($"date"))
    .join(spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$G/daily_ssd.csv.gz").withColumn("date", to_date($"date")),
      "date").cache()
  lazy val hourlyObs = spark.read.option("header", "true")
    .option("inferSchema", "true").csv(s"$G/hourly_obs.csv.gz")
    .withColumn("timestamp", to_timestamp($"timestamp")).cache()

  lazy val session = new StationSession(spark, station, daily,
    Some(hourlyObs))

  test("cubic interpolation passes through knots and fills smoothly") {
    val out = session.interpolate(Map("tmin" -> 7, "tmax" -> 14),
      method = "cubic")
    val at7 = out.where(hour($"timestamp") === 7)
      .withColumn("date", to_date($"timestamp"))
      .join(daily.select($"date", $"tmin"), "date")
      .where(abs($"v" - $"tmin") > 1e-6)
    assert(at7.count() == 0)
    // between knots values are finite and inside a generous envelope
    val mid = out.where(hour($"timestamp") === 10 && $"v".isNotNull)
    assert(mid.count() > 300)
    val bounds = mid.agg(min($"v"), max($"v")).head()
    assert(bounds.getDouble(0) > 200 && bounds.getDouble(1) < 330)
  }

  test("linear interpolation with both-direction limit fills the head") {
    val out = session.interpolate(Map("tmin" -> 7, "tmax" -> 14),
      method = "linear")
    // hours before the first knot (00:00-06:00 on day 1) backfill
    val head = out.orderBy($"timestamp").limit(7).where($"v".isNull)
    assert(head.count() == 0)
  }

  test("calibrateRadiation monthly fits per-month Bristow-Campbell") {
    val cal = session.calibrateRadiation("monthly")
    val bc = cal.stats.glob.bristcamp
    assert(bc.size == 12)
    // params moved off the defaults and are plausible
    assert(bc.values.exists { case (a, c) =>
      math.abs(a - 0.75) > 1e-6 || math.abs(c - 2.4) > 1e-6 })
    bc.values.foreach { case (a, c) =>
      assert(!a.isNaN && !c.isNaN)
    }
    // angstroem fitted too (daily_ssd present)
    assert(cal.stats.glob.angstroem.values.exists { case (a, b) =>
      math.abs(a - 0.25) > 1e-6 || math.abs(b - 0.75) > 1e-6 })
  }
}
