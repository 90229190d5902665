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

  test("asofJoinBackward: <= semantics, tolerance, partitions") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      ("a", ts("2024-01-01 00:00:30"), 1L),
      ("a", ts("2024-01-01 00:02:00"), 2L),  // == right stamp: visible
      ("a", ts("2024-01-01 00:00:05"), 3L),  // before any right: null
      ("b", ts("2024-01-01 00:02:30"), 4L))  // partition b
      .toDF("st", "ts", "lid")
    val right = Seq(
      ("a", ts("2024-01-01 00:00:10"), 10.0),
      ("a", ts("2024-01-01 00:02:00"), 20.0),
      ("b", ts("2024-01-01 00:01:00"), 30.0))
      .toDF("st", "ts", "v")
    val out = TimeSeries.asofJoinBackward(left, right, "ts", Seq("v"),
        partitionCols = Seq("st"))
      .orderBy($"lid").collect()
      .map(r => (r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.toSeq == Seq((1L, Some(10.0)), (2L, Some(20.0)),
      (3L, None), (4L, Some(30.0))))
    // tolerance: 30s window nulls matches older than that
    val tol = TimeSeries.asofJoinBackward(left, right, "ts", Seq("v"),
        partitionCols = Seq("st"),
        toleranceMicros = Some(30L * 1000000L))
      .orderBy($"lid").collect()
      .map(r => (r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(tol.toSeq == Seq((1L, Some(10.0)), (2L, Some(20.0)),
      (3L, None), (4L, None)))
  }

  test("asofJoin forward and nearest: semantics, ties, tolerance") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      ("a", ts("2024-01-01 00:00:30"), 1L), // between 10s and 2:00
      ("a", ts("2024-01-01 00:02:00"), 2L), // == right stamp
      ("a", ts("2024-01-01 00:03:00"), 3L), // after all right: fwd null
      ("a", ts("2024-01-01 00:01:05"), 4L)) // equidistant-ish
      .toDF("st", "ts", "lid")
    val right = Seq(
      ("a", ts("2024-01-01 00:00:10"), 10.0),
      ("a", ts("2024-01-01 00:02:00"), 20.0))
      .toDF("st", "ts", "v")
    def run(dir: String, tol: Option[Long] = None) =
      TimeSeries.asofJoin(left, right, "ts", Seq("v"), dir,
        partitionCols = Seq("st"), toleranceMicros = tol)
        .orderBy($"lid").collect()
        .map(r => (r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(run("forward") == Seq(1L -> Some(20.0), 2L -> Some(20.0),
      3L -> None, 4L -> Some(20.0)))
    // nearest: lid1 is 20s from 00:10 vs 90s from 2:00 -> backward;
    // lid4 is 55s back vs 55s fwd -> tie resolves backward
    assert(run("nearest") == Seq(1L -> Some(10.0), 2L -> Some(20.0),
      3L -> Some(20.0), 4L -> Some(10.0)))
    // tolerance nulls the chosen match without falling back
    assert(run("nearest", Some(30L * 1000000L)) ==
      Seq(1L -> Some(10.0), 2L -> Some(20.0), 3L -> None, 4L -> None))
    // matches pandas merge_asof: exhaustive check vs brute force
    val bf = left.as("l").join(right.as("r"), Seq("st"), "left")
      .groupBy($"lid").agg(
        min(struct(abs(unix_micros($"l.ts") - unix_micros($"r.ts")),
          unix_micros($"r.ts"), $"v")).as("m"))
      .select($"lid", $"m.v").orderBy($"lid").collect()
      .map(r => (r.getLong(0), Some(r.getDouble(1)))).toSeq
    // (tie at lid4: brute force min-struct picks the EARLIER right ts
    //  = backward, same as the operator)
    assert(run("nearest") == bf)
  }

  test("asofJoin: null value in the matched row stays null (pandas)") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((ts("2024-01-01 01:45:00"), 1L)).toDF("ts", "lid")
    val right = Seq(
      (ts("2024-01-01 00:50:00"), Some(7.0)),
      (ts("2024-01-01 01:40:00"), None)) // matched row, null value
      .toDF("ts", "v")
    // backward matches the 01:40 row -> v must be null, NOT 7.0
    // back-filled from 00:50
    val b = TimeSeries.asofJoin(left, right, "ts", Seq("v"), "backward")
      .select($"v").head()
    assert(b.isNullAt(0))
    // with a 10s tolerance the matched row (5s away) is in range and
    // still emits its own null
    val t = TimeSeries.asofJoin(left, right, "ts", Seq("v"), "backward",
      toleranceMicros = Some(10L * 1000000L)).select($"v").head()
    assert(t.isNullAt(0))
    // nearest judges distance on the matched (null-valued) row too
    val n = TimeSeries.asofJoin(left, right, "ts", Seq("v"), "nearest")
      .select($"v").head()
    assert(n.isNullAt(0))
    // reserved temp names are rejected instead of silently clobbered
    intercept[IllegalArgumentException] {
      TimeSeries.asofJoin(left.withColumn("m__", lit(1)), right, "ts",
        Seq("v"), "nearest")
    }
  }

  test("ewma matches the adjust=False recurrence, per key") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      ("a", ts("2024-01-01 00:00:00"), Some(2.0)),
      ("a", ts("2024-01-01 01:00:00"), Some(4.0)),
      ("a", ts("2024-01-01 02:00:00"), None), // carries state
      ("a", ts("2024-01-01 03:00:00"), Some(8.0)),
      ("b", ts("2024-01-01 00:00:00"), None), // leading null -> null
      ("b", ts("2024-01-01 01:00:00"), Some(5.0)))
      .toDF("st", "ts", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      TimeSeries.ewma(d, "ts", "v", alpha = 0.5, Seq("st"))
        .orderBy($"st", $"ts").select($"ewma").collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
        .toSeq
    // a: 2; 0.5*2+0.5*4=3; null keeps 3; 0.5*3+0.5*8=5.5
    val expected = Seq(Some(2.0), Some(3.0), Some(3.0), Some(5.5),
      None, Some(5.0))
    assert(run(df) == expected)
    // partitioning-invariant (hash repartition + in-partition sort)
    assert(run(df.repartition(7)) == expected)
    assert(run(df.coalesce(1)) == expected)
  }

  test("sessionize splits on inactivity gaps per key") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      ("u1", ts("2024-01-01 00:00:00")),
      ("u1", ts("2024-01-01 00:10:00")), // 10 min -> same session
      ("u1", ts("2024-01-01 01:00:00")), // 50 min -> new session
      ("u1", ts("2024-01-01 01:30:00")), // exactly the gap -> same
      ("u2", ts("2024-01-01 00:00:00"))) // own key space
      .toDF("user", "ts")
    val out = TimeSeries.sessionize(df, "ts", Seq("user"),
        gapSeconds = 1800L)
      .orderBy($"user", $"ts").select($"session_id").collect()
      .map(_.getLong(0))
    assert(out.toSeq == Seq(0L, 0L, 1L, 1L, 0L))
  }

  test("rollingTimeAgg: trailing time window, inclusive edges") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1.0),
      ("a", ts("2024-01-01 00:30:00"), 2.0),
      ("a", ts("2024-01-01 01:00:00"), 4.0),  // 1h window: includes 00:00
      ("a", ts("2024-01-01 02:30:00"), 8.0),  // nothing within 1h
      ("b", ts("2024-01-01 00:45:00"), 16.0)) // other partition
      .toDF("st", "ts", "v")
    val out = graft.agg.Aggregations.rollingTimeAgg(df, "ts", "v",
        windowSeconds = 3600L, partitionCols = Seq("st"))
      .orderBy($"st", $"ts")
      .select($"roll_count", $"roll_sum", $"roll_mean", $"roll_min",
        $"roll_max")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 1.0, 1.0, 1.0, 1.0),
      (2L, 3.0, 1.5, 1.0, 2.0),
      (3L, 7.0, 7.0 / 3, 1.0, 4.0),
      (1L, 8.0, 8.0, 8.0, 8.0),
      (1L, 16.0, 16.0, 16.0, 16.0)))
  }

  test("resampleByDuration buckets on epoch-aligned steps") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (ts("2024-01-01 00:10:00"), 1.0), (ts("2024-01-01 02:59:59"), 2.0),
      (ts("2024-01-01 03:00:00"), 4.0), (ts("2024-01-01 05:00:00"), 8.0))
      .toDF("ts", "v")
    val out = graft.agg.Aggregations.resampleByDuration(df, "ts",
        3 * 3600L, Seq(sum($"v").as("s"), count(lit(1)).as("n")))
      .orderBy($"bucket").collect()
      .map(r => (r.getTimestamp(0).toString, r.getDouble(1), r.getLong(2)))
    assert(out.toSeq == Seq(("2024-01-01 00:00:00.0", 3.0, 2L),
      ("2024-01-01 03:00:00.0", 12.0, 2L)))
  }
}
