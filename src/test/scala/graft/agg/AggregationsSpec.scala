package graft.agg

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggregationsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def hourly = {
    val rows = for {
      d <- 1 to 3; h <- 0 until 24
    } yield (f"2016-01-0$d $h%02d:00:00", 270.0 + d + h * 0.5,
      if (h % 6 == 0) 1.0 else 0.0, 60.0 + h, 3.0 + (h % 4))
    rows.toDF("s", "temp", "precip", "hum", "wind")
      .select(to_timestamp($"s").as("timestamp"), $"temp", $"precip",
        $"hum", $"wind")
  }

  test("dailyFromHourly aggregates per variable semantics") {
    val d = Aggregations.dailyFromHourly(hourly).orderBy($"date").collect()
    assert(d.length == 3)
    val r = d(0)
    assert(r.getAs[Double]("tmin") == 271.0)
    assert(r.getAs[Double]("tmax") == 271.0 + 23 * 0.5)
    assert(r.getAs[Double]("precip") == 4.0)
    assert(math.abs(r.getAs[Double]("temp") - (271.0 + 23 * 0.5 / 2)) < 1e-9)
    assert(r.getAs[Double]("hum_min") == 60.0 &&
      r.getAs[Double]("hum_max") == 83.0)
  }

  test("meanDailyCourseByMonth normalized is in [0,1] with min 0 max 1") {
    val mc = Aggregations.meanDailyCourseByMonth(hourly, "temp",
      normalize = true)
    val vals = mc.select($"temp").collect().map(_.getDouble(0))
    assert(vals.length == 24)
    assert(math.abs(vals.min) < 1e-12 && math.abs(vals.max - 1.0) < 1e-12)
  }

  test("monthHourPrecipMean keys by wet flag") {
    // make day 2 dry
    val h2 = hourly.withColumn("precip",
      when(dayofmonth($"timestamp") === 2, 0.0).otherwise($"precip"))
    val m = Aggregations.monthHourPrecipMean(h2)
    val wet = m.where($"wet" === true).count()
    val dry = m.where($"wet" === false).count()
    assert(wet == 24 && dry == 24)
  }

  test("hourOfDailyMax finds the argmax hour") {
    val got = Aggregations.hourOfDailyMax(hourly, "temp")
      .orderBy($"date").collect().map(_.getAs[Int]("hour_of_max"))
    assert(got.toSeq == Seq(23, 23, 23))
  }

  test("hourOfDailyMax ties break to the first occurrence (pandas idxmax)") {
    // constant temp all day -> every hour ties; idxmax picks hour 0
    val flat = hourly.withColumn("temp",
      when(dayofmonth($"timestamp") === 2, 280.0).otherwise($"temp"))
    val got = Aggregations.hourOfDailyMax(flat, "temp")
      .orderBy($"date").collect().map(_.getAs[Int]("hour_of_max"))
    assert(got.toSeq == Seq(23, 0, 23))
  }

  test("linregress recovers an exact linear relationship") {
    val df = (1 to 50).map(i => (i.toDouble, 2.5 * i + 7.0))
      .toDF("x", "y")
    val (a1, a0, r) = Aggregations.linregress(df, "x", "y")
    assert(math.abs(a1 - 2.5) < 1e-9)
    assert(math.abs(a0 - 7.0) < 1e-9)
    assert(math.abs(r - 1.0) < 1e-9)
  }

  test("linregressByGroup == independent per-group linregress") {
    val df = (1 to 50).flatMap { i =>
      Seq(("g1", i.toDouble, 2.5 * i + 7.0 + (i % 3) * 0.1),
        ("g2", i.toDouble, -1.2 * i + 3.0 + (i % 5) * 0.2))
    }.toDF("g", "x", "y")
    val got = Aggregations.linregressByGroup(df, "x", "y", Seq("g"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("a1"), r.getAs[Double]("a0"), r.getAs[Double]("r")))
      .toMap
    assert(got.keySet == Set("g1", "g2"))
    for (g <- Seq("g1", "g2")) {
      val (a1, a0, r) =
        Aggregations.linregress(df.where($"g" === g), "x", "y")
      val (ga1, ga0, gr) = got(g)
      assert(math.abs(ga1 - a1) < 1e-12 && math.abs(ga0 - a0) < 1e-12 &&
        math.abs(gr - r) < 1e-12, s"group $g diverges")
    }
  }

  test("wetPercentile matches numpy linear interpolation") {
    val df = Seq(0.0, 0.0, 1.0, 2.0, 3.0, 4.0).toDF("precip")
    // wet values [1,2,3,4], p50 -> 2.5; p90 -> 3.7
    assert(math.abs(Aggregations.wetPercentile(df, "precip", 50) - 2.5) < 1e-9)
    assert(math.abs(Aggregations.wetPercentile(df, "precip", 90) - 3.7) < 1e-9)
  }
}
