package graft.disagg

import graft.core.TimeSeries
import graft.meteo.Meteo
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Humidity disaggregation — the reference's six methods
  * (melodist/humidity.py:28-120) as expression pipelines over the hourly
  * explode-join, plus optional daily-mean preservation and the final
  * 0–100 clip. Lookup tables join via broadcast.
  */
object Humidity {

  /** `daily`: (date, hum, tmin, tmax, hum_min, hum_max, precip — as needed
    * per method). `hourlyTemp`: (timestamp, temp) for the temp-dependent
    * methods. Returns (partitionCols…, timestamp, hum).
    *
    * Methods: equal | minimal | dewpoint_regression |
    * linear_dewpoint_variation (kr=6|12) | min_max | month_hour_precip_mean
    * (requires `monthHourPrecipMean` (month, hour, wet, mean_hum)).
    */
  def disaggregate(daily: DataFrame, method: String = "equal",
      hourlyTemp: DataFrame = null, a0: Double = Double.NaN,
      a1: Double = Double.NaN, kr: Int = 0,
      monthHourPrecipMean: DataFrame = null,
      preserveDailyMean: Boolean = false,
      partitionCols: Seq[String] = Nil): DataFrame = {
    if (partitionCols.isEmpty)
      graft.core.ScaleGuard.unpartitionedWindow(daily,
        "Humidity.disaggregate")
    val pcols = partitionCols.map(col)
    val joinKeys = partitionCols :+ "date"

    def withTemp(df: DataFrame): DataFrame = {
      require(hourlyTemp != null, s"method $method needs hourly temp")
      df.join(hourlyTemp.select((pcols :+ col("timestamp") :+
        col("temp").as("temp_hourly")): _*), partitionCols :+ "timestamp")
    }

    val disagg: DataFrame = method match {
      case "equal" =>
        TimeSeries.explodeDays(daily, "date", 24, 3600L * 1000000L)
          .withColumn("hum_disagg", col("hum"))

      case "minimal" | "dewpoint_regression" | "linear_dewpoint_variation" =>
        val (pa0, pa1) =
          if (method == "minimal") (0.0, 1.0) else (a0, a1)
        require(!pa0.isNaN && !pa1.isNaN, "a0/a1 must be specified")
        val base = TimeSeries
          .explodeDays(daily.withColumn("tdew_daily",
            lit(pa0) + lit(pa1) * col("tmin")), "date", 24, 3600L * 1000000L)
        val withTdew =
          if (method != "linear_dewpoint_variation") {
            base.withColumn("tdew", col("tdew_daily"))
          } else {
            require(kr == 6 || kr == 12, "kr must be 6 or 12")
            // eq. (21)/(20) of Debele et al. (2007), sign-corrected as in
            // the reference (humidity.py:76-86); next-day tdew via date+1
            // join, last day copies itself
            val next = daily.select((pcols :+
              date_sub(col("date"), 1).as("date") :+
              (lit(pa0) + lit(pa1) * col("tmin")).as("tdew_next_")): _*)
            val bounds = daily.groupBy(pcols: _*)
              .agg(max(col("date")).as("last_date_"))
            val withB = if (partitionCols.isEmpty)
              base.crossJoin(broadcast(bounds))
            else base.join(broadcast(bounds), partitionCols)
            val hh = hour(col("timestamp"))
            withB.join(next, joinKeys, "left")
              .withColumn("tdew_next",
                when(col("date") === col("last_date_"),
                  coalesce(col("tdew_next_"), col("tdew_daily")))
                .otherwise(col("tdew_next_")))
              .withColumn("tdew_delta",
                sin((hh + 1) * (math.Pi / kr) - 3.0 * math.Pi / 4.0) * 0.5)
              .withColumn("tdew",
                col("tdew_daily") + hh / lit(24.0) *
                  (col("tdew_next") - col("tdew_daily")) + col("tdew_delta"))
              .drop("tdew_next_", "last_date_")
          }
        withTemp(withTdew).withColumn("hum_disagg",
          lit(100.0) * Meteo.saturationVaporPressure(col("tdew")) /
            Meteo.saturationVaporPressure(col("temp_hourly")))

      case "min_max" =>
        require(daily.columns.contains("hum_min") &&
          daily.columns.contains("hum_max"),
          "min_max needs hum_min/hum_max daily columns")
        withTemp(TimeSeries.explodeDays(daily, "date", 24, 3600L * 1000000L))
          .withColumn("hum_disagg",
            col("hum_max") + (col("temp_hourly") - col("tmin")) /
              (col("tmax") - col("tmin")) *
              (col("hum_min") - col("hum_max")))

      case "month_hour_precip_mean" =>
        require(monthHourPrecipMean != null)
        val hourly = TimeSeries
          .explodeDays(daily, "date", 24, 3600L * 1000000L)
          .withColumn("wet", coalesce(col("precip") > 0, lit(false)))
          .withColumn("month", month(col("timestamp")))
          .withColumn("hour", hour(col("timestamp")))
        hourly.join(broadcast(monthHourPrecipMean),
            Seq("month", "hour", "wet"), "left")
          .withColumn("hum_disagg", col("mean_hum"))

      case other => throw new IllegalArgumentException(other)
    }

    val preserved =
      if (!preserveDailyMean) disagg
      else {
        // bias = distribute_equally(daily disagg mean - observed daily
        // mean), NaN bias -> 0 (humidity.py:112-118)
        val dailyMean = disagg
          .groupBy((pcols :+ to_date(col("timestamp")).as("date")): _*)
          .agg(avg(col("hum_disagg")).as("disagg_mean"))
        val obs = daily.select((pcols :+ col("date") :+
          col("hum").as("obs_mean")): _*)
        val bias = dailyMean.join(obs, joinKeys, "left")
          .select((pcols :+ col("date") :+
            (col("disagg_mean") - col("obs_mean")).as("bias")): _*)
        disagg.withColumn("date", to_date(col("timestamp")))
          .join(bias, joinKeys, "left")
          .withColumn("hum_disagg",
            col("hum_disagg") - coalesce(col("bias"), lit(0.0)))
      }

    preserved.select((pcols :+ col("timestamp") :+
      least(lit(100.0), greatest(lit(0.0), col("hum_disagg"))).as("hum")): _*)
  }

  /** calculate_dewpoint_regression (humidity.py:123-130): regress daily
    * mean dewpoint on daily tmin. Returns (a1, a0). */
  def dewpointRegression(hourlyObs: DataFrame,
      tsCol: String = "timestamp"): (Double, Double) = {
    val daily = hourlyObs
      .withColumn("tdew",
        Meteo.dewpointTemperature(col("temp"), col("hum")))
      .groupBy(to_date(col(tsCol)).as("date"))
      .agg(avg(col("tdew")).as("tdew"), min(col("temp")).as("tmin"))
    val (a1, a0, _) =
      graft.agg.Aggregations.linregress(daily, "tmin", "tdew")
    (a1, a0)
  }

  /** Per-station dewpoint regression, fully distributed (closed-form
    * grouped moments — no collect). Returns (stationCols..., a1, a0). */
  def dewpointRegressionByStation(hourlyObs: DataFrame,
      stationCols: Seq[String], tsCol: String = "timestamp"): DataFrame = {
    val keys = stationCols.map(col) :+ to_date(col(tsCol)).as("date")
    val daily = hourlyObs
      .withColumn("tdew",
        Meteo.dewpointTemperature(col("temp"), col("hum")))
      .groupBy(keys: _*)
      .agg(avg(col("tdew")).as("tdew"), min(col("temp")).as("tmin"))
    graft.agg.Aggregations
      .linregressByGroup(daily, "tmin", "tdew", stationCols)
      .select(stationCols.map(col) :+ col("a1") :+ col("a0"): _*)
  }
}
