package graft.core

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def dailyFixture = Seq(
    ("2016-01-01", 24.0), ("2016-01-02", 0.0), ("2016-01-03", 12.0))
    .toDF("date_s", "precip")
    .select(to_date($"date_s").as("date"), $"precip")

  test("hourlyIndex emits 24 stamps per present day only") {
    val idx = TimeSeries.hourlyIndex(dailyFixture).collect()
    assert(idx.length == 72)
    val hours = TimeSeries.hourlyIndex(dailyFixture)
      .groupBy(to_date($"timestamp").as("d")).count().collect()
    assert(hours.forall(_.getLong(1) == 24))
  }

  test("distributeEqually divide=true preserves daily mass") {
    val hourly = TimeSeries.distributeEqually(dailyFixture, "date",
      Seq("precip"), divide = true)
    val back = hourly.groupBy(to_date($"timestamp").as("date"))
      .agg(sum($"precip").as("s")).orderBy($"date").collect()
    assert(back.map(_.getDouble(1)).toSeq == Seq(24.0, 0.0, 12.0))
    // each hourly value = daily/24
    val first = hourly.where(to_date($"timestamp") === "2016-01-01")
      .select($"precip").collect()
    assert(first.forall(_.getDouble(0) == 1.0))
  }

  test("subLevelIndex level 9 gives 512 steps/day; fmin 288") {
    val one = dailyFixture.limit(1)
    assert(TimeSeries.subLevelIndex(one, 9).count() == 512)
    assert(TimeSeries.fminIndex(one).count() == 288)
  }

  test("reindexDailyComplete fills missing days with nulls") {
    val sparse = Seq(("2016-01-01", 1.0), ("2016-01-04", 4.0))
      .toDF("date_s", "v").select(to_date($"date_s").as("date"), $"v")
    val full = TimeSeries.reindexDailyComplete(sparse).orderBy($"date")
    val rows = full.collect()
    assert(rows.length == 4)
    assert(rows(1).isNullAt(1) && rows(2).isNullAt(1))
  }

  test("gaps finds the one irregular step") {
    val ts = Seq("2016-01-01 00:00:00", "2016-01-01 01:00:00",
      "2016-01-01 03:00:00", "2016-01-01 04:00:00")
      .toDF("s").select(to_timestamp($"s").as("ts"))
    val g = TimeSeries.gaps(ts, "ts", 3600L).collect()
    assert(g.length == 1)
    assert(g(0).getAs[Long]("gap_seconds") == 7200L)
  }

  test("dropIncompleteDays trims to whole shifted days") {
    // hourly 2016-01-01 05:00 .. 2016-01-03 17:00, shift=6 =>
    // keep 2016-01-01 06:00 .. 2016-01-03 05:00 (48 rows)
    val hrs = spark.range(0, 61)
      .select((to_timestamp(lit("2016-01-01 05:00:00")) +
        expr("make_interval(0,0,0,0,CAST(id AS INT),0,0)")).as("ts"))
    val kept = TimeSeries.dropIncompleteDays(hrs, "ts", shift = 6)
    assert(kept.count() == 48)
    val mm = kept.agg(min($"ts").cast("string"), max($"ts").cast("string"))
      .collect()(0)
    assert(mm.getString(0) == "2016-01-01 06:00:00")
    assert(mm.getString(1) == "2016-01-03 05:00:00")
  }

  test("interpolateLinear matches pandas semantics on a simple series") {
    // pandas: s.interpolate('linear', limit=2):
    //   [1, nan, nan, nan, 5] -> [1, 2, 3, nan, 5]  (limit cuts 3rd fill)
    val df = Seq(
      ("2016-01-01 00:00:00", Some(1.0)), ("2016-01-01 01:00:00", None),
      ("2016-01-01 02:00:00", None), ("2016-01-01 03:00:00", None),
      ("2016-01-01 04:00:00", Some(5.0)))
      .toDF("s", "v").select(to_timestamp($"s").as("ts"), $"v")
    val out = TimeSeries.interpolateLinear(df, "ts", "v", limit = 2)
      .orderBy($"ts").select($"v").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(1.0), Some(2.0), Some(3.0), None, Some(5.0)))
  }

  test("seasonalSubset keeps only requested months") {
    val n = TimeSeries.seasonalSubset(dailyFixture, "date", Seq(2)).count()
    assert(n == 0)
    val y = TimeSeries.seasonalSubset(dailyFixture, "date", Seq(1)).count()
    assert(y == 3)
  }
}
