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

  test("slinear (time-weighted) == linear on the uniform hourly grid") {
    // pandas 'slinear'/'index' weight by time distance; on the hourly
    // grid row distance == time distance, so the two methods coincide
    val lin = session.interpolate(Map("tmin" -> 7, "tmax" -> 14),
      method = "linear").orderBy($"timestamp").collect()
    val sli = session.interpolate(Map("tmin" -> 7, "tmax" -> 14),
      method = "slinear").orderBy($"timestamp").collect()
    assert(lin.length == sli.length)
    lin.zip(sli).foreach { case (a, b) =>
      assert(a.isNullAt(1) == b.isNullAt(1) &&
        (a.isNullAt(1) || math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-9))
    }
  }

  test("nearest interpolation snaps to the time-nearer knot, ties down") {
    val out = session.interpolate(Map("tmin" -> 7, "tmax" -> 14),
      method = "nearest")
    // hour 10 sits 3 h after the 07:00 tmin knot, 4 h before 14:00 tmax
    val at10 = out.where(hour($"timestamp") === 10)
      .withColumn("date", to_date($"timestamp"))
      .join(daily.select($"date", $"tmin"), "date")
      .where($"v".isNotNull && abs($"v" - $"tmin") > 1e-9)
    assert(at10.count() == 0)
    // hour 18 is 4 h after 14:00 tmax, 13 h before next-day 07:00 tmin
    val at18 = out.where(hour($"timestamp") === 18)
      .withColumn("date", to_date($"timestamp"))
      .join(daily.select($"date", $"tmax"), "date")
      .where($"v".isNotNull && abs($"v" - $"tmax") > 1e-9)
    assert(at18.count() == 0)
    // no extrapolation: hours before the first knot stay null
    assert(out.orderBy($"timestamp").limit(7)
      .where($"v".isNotNull).count() == 0)
  }

  test("zero holds previous knot; pad forward-fills past the last") {
    val z = session.interpolate(Map("tmin" -> 7, "tmax" -> 14),
      method = "zero")
    val at10 = z.where(hour($"timestamp") === 10)
      .withColumn("date", to_date($"timestamp"))
      .join(daily.select($"date", $"tmin"), "date")
      .where($"v".isNotNull && abs($"v" - $"tmin") > 1e-9)
    assert(at10.count() == 0)
    val p = session.interpolate(Map("tmin" -> 7, "tmax" -> 14),
      method = "pad")
    // pad extends beyond the final 14:00 knot to the end of that day
    val lastDay = daily.agg(max($"date")).head().getDate(0)
    val tail = p.where(to_date($"timestamp") === lastDay &&
      hour($"timestamp") > 14)
    assert(tail.where($"v".isNull).count() == 0)
  }

  test("akima spline passes through knots, stays bounded") {
    val out = session.interpolate(Map("tmin" -> 7, "tmax" -> 14),
      method = "akima")
    val at14 = out.where(hour($"timestamp") === 14)
      .withColumn("date", to_date($"timestamp"))
      .join(daily.select($"date", $"tmax"), "date")
      .where($"v".isNotNull && abs($"v" - $"tmax") > 1e-6)
    assert(at14.count() == 0)
    val mid = out.where(hour($"timestamp") === 10 && $"v".isNotNull)
    assert(mid.count() > 300)
    val bounds = mid.agg(min($"v"), max($"v")).head()
    assert(bounds.getDouble(0) > 150 && bounds.getDouble(1) < 400)
  }

  test("pchip stays inside each day's [tmin, tmax]; quadratic hits knots") {
    val p = session.interpolate(Map("tmin" -> 7, "tmax" -> 14),
      method = "pchip")
    // pchip never overshoots: between the 07:00 tmin and 14:00 tmax
    // knots every value lies within that day's knot range
    val between = p.where(hour($"timestamp") > 7 &&
        hour($"timestamp") < 14 && $"v".isNotNull)
      .withColumn("date", to_date($"timestamp"))
      .join(daily.select($"date", $"tmin", $"tmax"), "date")
      .where($"v" < least($"tmin", $"tmax") - 1e-9 ||
        $"v" > greatest($"tmin", $"tmax") + 1e-9)
    assert(between.count() == 0)
    val q = session.interpolate(Map("tmin" -> 7, "tmax" -> 14),
      method = "quadratic")
    val at14 = q.where(hour($"timestamp") === 14)
      .withColumn("date", to_date($"timestamp"))
      .join(daily.select($"date", $"tmax"), "date")
      .where($"v".isNotNull && abs($"v" - $"tmax") > 1e-6)
    assert(at14.count() == 0)
    // spline/polynomial map their order onto the interpolants
    val s2 = session.interpolate(Map("tmin" -> 7, "tmax" -> 14),
      method = "spline", order = 2).orderBy($"timestamp").collect()
    val q2 = q.orderBy($"timestamp").collect()
    s2.zip(q2).foreach { case (a, b) =>
      assert(a.isNullAt(1) == b.isNullAt(1) &&
        (a.isNullAt(1) || math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-12))
    }
    intercept[IllegalArgumentException] {
      session.interpolate(Map("tmin" -> 7), method = "spline", order = 5)
    }
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
