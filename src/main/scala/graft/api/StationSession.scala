package graft.api

import graft.agg.Aggregations
import graft.cascade.Cascade
import graft.core.TimeSeries
import graft.disagg.{Humidity, Precipitation, Radiation, Temperature, Wind}
import graft.meteo.Meteo
import graft.stats._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Station metadata (reference Station, melodist/station.py:27-71) —
  * immutable; timezone is the UTC offset in hours. */
final case class Station(id: String, name: String, lon: Double,
    lat: Double, timezone: Double)

/** Facade mirroring the reference's Station.disaggregate_* /
  * StationStatistics.calc_* ergonomics (melodist/station.py:249-437,
  * stationstatistics.py:75-192) — but immutable and lazy: every method
  * returns a new DataFrame, nothing mutates shared state, so plans
  * compose and Catalyst sees the whole pipeline.
  *
  * `dailyData` columns: date, tmean(+alias temp), tmin, tmax, precip,
  * glob, hum, hum_min, hum_max, wind, ssd — any subset. Multi-station
  * frames: add a station_id column and pass partitionCols. */
final class StationSession(
    val spark: SparkSession,
    val station: Station,
    val dailyData: DataFrame,
    val hourlyObs: Option[DataFrame] = None,
    val stats: StationStats = StationStats.default,
    val partitionCols: Seq[String] = Nil) {

  /** daily frame with sunrise/sunnoon/sunset/daylength attached
    * (Station.calc_sun_times, station.py:172-179). */
  lazy val dailyWithSun: DataFrame =
    Meteo.withSunTimes(dailyData, "date", station.lon, station.lat,
      station.timezone)

  private def meanCourseDf(mc: Map[(Int, Int), Double]): DataFrame = {
    import spark.implicits._
    mc.toSeq.map { case ((m, h), v) => (m, h, v) }
      .toDF("month", "hour", "value")
  }

  private def mhpmDf(entries: Seq[(Int, Int, Boolean, Double)])
      : DataFrame = {
    import spark.implicits._
    entries.toDF("month", "hour", "wet", "mean_hum")
  }

  // -------------------------------------------------------------- disagg

  def disaggregateTemperature(method: String = "sine_min_max",
      minMaxTime: String = "fix", modNighttime: Boolean = false)
      : DataFrame =
    Temperature.disaggregate(dailyWithSun, method, minMaxTime,
      modNighttime,
      maxDelta = stats.temp.maxDelta.getOrElse(Map.empty),
      meanCourse = stats.temp.meanCourse.map(meanCourseDf).orNull,
      partitionCols = partitionCols)

  def disaggregateHumidity(method: String = "equal",
      preserveDailyMean: Boolean = false,
      hourlyTemp: DataFrame = null): DataFrame = {
    val needsTemp = Set("minimal", "dewpoint_regression",
      "linear_dewpoint_variation", "min_max")
    val temp = if (!needsTemp(method)) hourlyTemp
      else Option(hourlyTemp).getOrElse(disaggregateTemperature())
    Humidity.disaggregate(dailyData, method, hourlyTemp = temp,
      a0 = stats.hum.a0.getOrElse(Double.NaN),
      a1 = stats.hum.a1.getOrElse(Double.NaN),
      kr = stats.hum.kr.getOrElse(0),
      monthHourPrecipMean =
        stats.hum.monthHourPrecipMean.map(mhpmDf).orNull,
      preserveDailyMean = preserveDailyMean,
      partitionCols = partitionCols)
  }

  def disaggregateWind(method: String = "equal", seed: Long = 42L)
      : DataFrame =
    Wind.disaggregate(dailyData, method,
      a = stats.wind.a.getOrElse(Double.NaN),
      b = stats.wind.b.getOrElse(Double.NaN),
      tShift = stats.wind.tShift.getOrElse(Double.NaN),
      seed = seed, partitionCols = partitionCols)

  /** hourly clear-sky potential radiation on this station's grid */
  def potentialRadiation(): DataFrame =
    TimeSeries.hourlyIndex(dailyData)
      .select(col("timestamp"),
        Meteo.potentialRadiation(col("timestamp"), station.lon,
          station.lat, station.timezone).as("pot_rad"))

  def disaggregateRadiation(method: String = "pot_rad"): DataFrame = {
    val angstrA = stats.glob.angstroem.values.headOption.map(_._1)
      .getOrElse(0.25)
    val angstrB = stats.glob.angstroem.values.headOption.map(_._2)
      .getOrElse(0.5)
    val bcA = stats.glob.bristcamp.values.headOption.map(_._1)
      .getOrElse(0.75)
    val bcC = stats.glob.bristcamp.values.headOption.map(_._2)
      .getOrElse(2.4)
    Radiation.disaggregate(dailyWithSun, method,
      potRad = if (method == "mean_course") null else potentialRadiation(),
      meanCourse = stats.glob.meanCourse.map(meanCourseDf).orNull,
      angstrA = angstrA, angstrB = angstrB, bristcampA = bcA,
      bristcampC = bcC, partitionCols = partitionCols)
  }

  /** Seasonal cascade orchestration (station.py:305-354): one cascade per
    * (months, stats) season, results unioned. */
  def disaggregatePrecipitation(method: String = "equal",
      masterHourly: DataFrame = null, zerodiv: String = "uniform",
      shift: Int = 0, seed: Long = 42L): DataFrame = method match {
    case "equal" => Precipitation.equal(dailyData, partitionCols)
    case "masterstation" =>
      Precipitation.masterStation(dailyData, masterHourly, zerodiv,
        partitionCols)
    case "cascade" =>
      val months = stats.precip.months.getOrElse(Seq(1 to 12))
      val cascStats = stats.precip.stats.getOrElse(
        Seq(Left(graft.cascade.CascadeStatistics.sampleData())))
      months.zip(cascStats).map { case (ms, st) =>
        val seasonal = TimeSeries.seasonalSubset(dailyData, "date", ms)
        Cascade.disaggregate(seasonal, st, hourly = true,
          shift = shift, seed = seed, partitionCols = partitionCols)
      }.reduce(_ unionByName _)
    case other => throw new IllegalArgumentException(other)
  }

  /** Station.interpolate (station.py:403-437): scatter daily columns to
    * their hours, reindex to the hourly grid, interpolate.
    *
    * `method` mirrors the pandas `Series.interpolate(method=...)` surface
    * the reference delegates to:
    *  - "linear": window-based, pandas row-spacing + the
    *    limit_direction='both' default;
    *  - "nearest" / "zero" / "pad": window-based (see TimeSeries);
    *  - "cubic" / "akima" / "quadratic" / "pchip" /
    *    "spline"(order) / "polynomial"(order): knots collected to the
    *    driver — calibration-scale — fitted as a piecewise polynomial
    *    and evaluated as a broadcast closure. Cubic boundary
    *    conditions differ slightly from scipy's (natural vs
    *    not-a-knot); Akima follows the standard Akima (1970) scheme
    *    like scipy's Akima1DInterpolator; pchip uses the
    *    Fritsch–Carlson rules scipy uses; quadratic is the C1
    *    interpolating construction (reproduces exact quadratics);
    *    spline/polynomial map order 2/3 onto those interpolants
    *    (pandas' 'spline' smooths — divergence documented). */
  def interpolate(columnHours: Map[String, Int], method: String = "linear",
      limit: Int = 24, order: Int = 3): DataFrame = {
    val scattered = columnHours.map { case (c, h) =>
      dailyData.select(
        (col("date").cast("timestamp") +
          expr(s"INTERVAL $h HOURS")).as("timestamp"),
        col(c).as("v"))
    }.reduce(_ unionByName _)
    val grid = TimeSeries.hourlyIndex(dailyData)
    val joined = grid.join(scattered, Seq("timestamp"), "left")
    method match {
      case "linear" =>
        TimeSeries.interpolateLinear(joined, "timestamp", "v", limit,
          partitionCols, byRow = true, limitDirection = "both")
      case "slinear" | "index" | "values" =>
        // pandas: these weight by the index (time) distance, where
        // 'linear' is row-spaced
        TimeSeries.interpolateLinear(joined, "timestamp", "v", limit,
          partitionCols, byRow = false, limitDirection = "both")
      case "nearest" =>
        TimeSeries.interpolateNearest(joined, "timestamp", "v", limit,
          partitionCols)
      case "zero" =>
        TimeSeries.interpolateZero(joined, "timestamp", "v", limit,
          partitionCols)
      case "pad" | "ffill" =>
        TimeSeries.fillForward(joined, "timestamp", "v", limit,
          partitionCols)
      case "cubic" | "akima" | "quadratic" | "pchip" | "spline" |
           "polynomial" =>
        val knots = joined.where(col("v").isNotNull)
          .select(unix_timestamp(col("timestamp")).as("x"), col("v"))
          .orderBy(col("x")).collect()
        val xs = knots.map(_.getLong(0).toDouble)
        val ys = knots.map(_.getDouble(1))
        // 'spline'/'polynomial' take the pandas order= argument; the
        // interpolating (not smoothing) variant, as documented
        val effective = method match {
          case "spline" | "polynomial" => order match {
            case 2 => "quadratic"
            case 3 => "cubic"
            case o => throw new IllegalArgumentException(
              s"$method order=$o unsupported (2 or 3)")
          }
          case m => m
        }
        require(xs.length >= (if (effective == "akima") 5 else 3),
          s"$effective interpolation needs more knots")
        // ship knots + ascending piecewise coefficients, evaluate with
        // Horner on executors (PolynomialSplineFunction isn't
        // serializable)
        val (knotsArr, coefs) = effective match {
          case "quadratic" => graft.stats.Splines.quadratic(xs, ys)
          case "pchip" => graft.stats.Splines.pchip(xs, ys)
          case _ =>
            val spline = (if (effective == "cubic")
                new org.apache.commons.math3.analysis.interpolation
                  .SplineInterpolator()
              else
                new org.apache.commons.math3.analysis.interpolation
                  .AkimaSplineInterpolator()).interpolate(xs, ys)
            (spline.getKnots, spline.getPolynomials.map(_.getCoefficients))
        }
        val bc = spark.sparkContext.broadcast((knotsArr, coefs))
        val evalUdf = udf { (ts: Long) =>
          val (kn, cs) = bc.value
          val x = ts.toDouble
          if (x < kn.head || x > kn.last) None
          else {
            var i = java.util.Arrays.binarySearch(kn, x)
            if (i < 0) i = -i - 2
            if (i >= cs.length) i = cs.length - 1
            val d = x - kn(i)
            val c = cs(i)
            var acc = 0.0
            var j = c.length - 1
            while (j >= 0) { acc = acc * d + c(j); j -= 1 }
            Some(acc)
          }
        }
        joined.withColumn("v",
          when(col("v").isNotNull, col("v"))
            .otherwise(evalUdf(unix_timestamp(col("timestamp")))))
      case other => throw new IllegalArgumentException(other)
    }
  }

  // ------------------------------------------------------------ calc_*

  /** StationStatistics.calc_* orchestrators — requires hourlyObs.
    * Returns a new StationSession carrying the calibrated stats. */
  def calibrate(precipMonths: Seq[Seq[Int]] = Seq(1 to 12),
      avgStats: Boolean = true, percentile: Double = 50): StationSession = {
    val obs = hourlyObs.getOrElse(throw new IllegalStateException(
      "calibrate() needs hourlyObs"))
    val cols = obs.columns.toSet

    val tempStats = if (cols("temp")) {
      val maxDelta = Temperature.shiftByData(obs, station.lon,
        station.lat, station.timezone)
      val mc = Aggregations.meanDailyCourseByMonth(obs, "temp",
        normalize = true).collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      TempStats(Some(maxDelta), Some(mc))
    } else stats.temp

    val humStats = if (cols("temp") && cols("hum")) {
      val (a1, a0) = Humidity.dewpointRegression(obs)
      val mhpm = Aggregations.monthHourPrecipMean(obs).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getBoolean(2),
          r.getDouble(3)))
      HumStats(Some(a0), Some(a1), Some(12), Some(mhpm.toSeq))
    } else stats.hum

    val windStats = if (cols("wind")) {
      val (a, b, t) = Fitting.fitCosineWind(
        obs.select(col("timestamp"), col("wind")))
      WindStats(Some(a), Some(b), Some(t))
    } else stats.wind

    val globStats = if (cols("glob")) {
      val mc = Aggregations.meanDailyCourseByMonth(obs, "glob")
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      stats.glob.copy(meanCourse = Some(mc))
    } else stats.glob

    val precipStats = if (cols("precip")) {
      val built = Cascade.buildCasc(
        obs.select(col("timestamp"), col("precip")),
        monthsSeasons = precipMonths, avgStats = avgStats,
        percentile = percentile)
      PrecipStats(Some(precipMonths), Some(built))
    } else stats.precip

    new StationSession(spark, station, dailyData, hourlyObs,
      StationStats(tempStats, windStats, precipStats, humStats,
        globStats), partitionCols)
  }

  def withStats(s: StationStats): StationSession =
    new StationSession(spark, station, dailyData, hourlyObs, s,
      partitionCols)

  /** calc_radiation_stats with month-range fitting
    * (stationstatistics.py:137-192): Angstroem (a,b) when daily ssd is
    * present, Bristow-Campbell (a,c) when tmin/tmax are —
    * how = all | seasonal | monthly controls the month grouping. */
  def calibrateRadiation(how: String = "all"): StationSession = {
    val obs = hourlyObs.getOrElse(throw new IllegalStateException(
      "calibrateRadiation() needs hourlyObs"))
    require(obs.columns.contains("glob"), "needs hourly glob")
    val monthRanges: Seq[Seq[Int]] = how match {
      case "all" => Seq(1 to 12)
      case "seasonal" =>
        Seq(Seq(3, 4, 5), Seq(6, 7, 8), Seq(9, 10, 11), Seq(12, 1, 2))
      case "monthly" => (1 to 12).map(Seq(_))
      case other => throw new IllegalArgumentException(other)
    }
    val potDaily = potentialRadiation()
      .groupBy(to_date(col("timestamp")).as("date"))
      .agg(avg(col("pot_rad")).as("pot"))
    val obsDaily = obs.groupBy(to_date(col("timestamp")).as("date"))
      .agg(avg(col("glob")).as("obs"))
    val base = dailyWithSun.join(potDaily, "date").join(obsDaily, "date")

    val dcols = dailyData.columns.toSet
    var angstroem = stats.glob.angstroem
    var bristcamp = stats.glob.bristcamp
    monthRanges.foreach { months =>
      val sub = base.where(month(col("date")).isin(months: _*))
      if (dcols("ssd")) {
        val (a, b) = Fitting.fitAngstroem(sub.select(col("ssd"),
          col("daylength"), col("pot"), col("obs")))
        months.foreach(m => angstroem = angstroem.updated(m, (a, b)))
      }
      if (dcols("tmin") && dcols("tmax")) {
        val (a, c) = Fitting.fitBristowCampbell(sub.select(col("date"),
          col("tmin"), col("tmax"), col("pot"), col("obs")))
        months.foreach(m => bristcamp = bristcamp.updated(m, (a, c)))
      }
    }
    withStats(stats.copy(glob = stats.glob.copy(
      angstroem = angstroem, bristcamp = bristcamp)))
  }
}
