package graft.meteo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar meteorological expressions as pure Catalyst `Column` math — no
  * UDFs, all whole-stage-codegen'd, so they vectorize for free and push
  * through any partitioning at 100 TB.
  *
  * Formulas follow the published methods used by the reference
  * (kristianfoerster/melodist): Sonntag (1990) vapor pressure
  * (melodist/util/util.py:70-134), Bourges (1985) declination + Spencer
  * (1971) equation of time for sun times (util/util.py:160-246), and
  * Liston & Elder (2006) potential radiation with Paltridge & Platt (1976)
  * eccentricity (melodist/radiation.py:104-204), Angstroem (1924)
  * (radiation.py:283-311), Bristow & Campbell (1984)
  * (radiation.py:207-248).
  */
object Meteo {

  // ---------------------------------------------------------------- vapor

  /** Vapor pressure in hPa after Sonntag (1990); water/ice branch at
    * 273.15 K. `hum` in percent (pass lit(100) for saturation). */
  def vaporPressure(temp: Column, hum: Column): Column = {
    val tC = temp - 273.15
    val water = lit(6.112) * exp(lit(17.62) * tC / (lit(243.12) + tC))
    val ice = lit(6.112) * exp(lit(22.46) * tC / (lit(272.62) + tC))
    when(temp >= 273.15, water).otherwise(ice) * hum / 100.0
  }

  def saturationVaporPressure(temp: Column): Column =
    vaporPressure(temp, lit(100.0))

  /** Dewpoint temperature in K — inverse of `vaporPressure`. */
  def dewpointTemperature(temp: Column, hum: Column): Column = {
    val vp = vaporPressure(temp, hum)
    val lnRatio = log(vp / 6.112)
    val water = lit(243.12) * lnRatio / (lit(17.62) - lnRatio)
    val ice = lit(272.62) * lnRatio / (lit(22.46) - lnRatio)
    when(temp >= 273.15, water).otherwise(ice) + 273.15
  }

  // ------------------------------------------------------------ sun times

  /** Bourges (1985) solar declination (rad) from day-of-year. */
  def declination(doy: Column): Column = {
    val dayAngle = radians((lit(360.0) / 365.25) * (doy - 79.346))
    radians(lit(0.3723)
      + lit(23.2567) * sin(dayAngle) - lit(0.7580) * cos(dayAngle)
      + lit(0.1149) * sin(dayAngle * 2) + lit(0.3656) * cos(dayAngle * 2)
      - lit(0.1712) * sin(dayAngle * 3) + lit(0.0201) * cos(dayAngle * 3))
  }

  /** Spencer (1971) equation of time (hours) from day-of-year. */
  def equationOfTime(doy: Column): Column = {
    val a = (doy - 1) * (2 * math.Pi / 365.0)
    (lit(12.0) / math.Pi) * (lit(0.000075)
      + lit(0.001868) * cos(a) - lit(0.032077) * sin(a)
      - lit(0.014615) * cos(a * 2) - lit(0.040849) * sin(a * 2))
  }

  /** Adds sunrise/sunnoon/sunset/daylength (decimal hours) columns for the
    * date column, incl. midnight-sun / polar-night clamps and the
    * wrap-around adjustments, in the reference's exact order
    * (util/util.py:211-239: clamps -> daylength -> wrap). */
  def withSunTimes(daily: DataFrame, dateCol: String, lon: Double,
      lat: Double, timezone: Double): DataFrame = {
    val doy = dayofyear(col(dateCol))
    val dec = declination(doy)
    val eqT = equationOfTime(doy)
    val deltaLatTime = (lon - timezone * 15.0) * 24.0 / 360.0
    val arg = -tan(lit(math.toRadians(lat))) * tan(dec)
    val omega = acos(arg) // NaN outside [-1, 1]; overridden below
    val sunnoon = lit(12.0) - deltaLatTime - eqT
    val sunrise0 = lit(12.0) * (lit(1.0) - omega / math.Pi) - deltaLatTime - eqT
    val sunset0 = lit(12.0) * (lit(1.0) + omega / math.Pi) - deltaLatTime - eqT
    val sunrise1 = when(arg < -1, sunnoon - 12)
      .when(arg > 1, sunnoon).otherwise(sunrise0)
    val sunset1 = when(arg < -1, sunnoon + 12)
      .when(arg > 1, sunnoon).otherwise(sunset0)
    val daylength = sunset1 - sunrise1
    daily
      .withColumn("sunrise", when(sunrise1 < 0, sunrise1 + 24)
        .otherwise(sunrise1))
      .withColumn("sunnoon", sunnoon)
      .withColumn("sunset", when(sunset1 > 24, sunset1 - 24)
        .otherwise(sunset1))
      .withColumn("daylength", daylength)
  }

  // ---------------------------------------------- potential radiation

  /** Clear-sky potential shortwave radiation (W/m²) for a timestamp
    * column, Liston & Elder (2006) with Paltridge & Platt (1976)
    * eccentricity. Returns (direct, diffuse) column pair. */
  def potentialRadiationSplit(ts: Column, lon: Double, lat: Double,
      timezone: Double, terrainSlope: Double = 0.0,
      terrainSlopeAzimuth: Double = 0.0, cloudFraction: Double = 0.0)
      : (Column, Column) = {
    val solarConstant = 1367.0
    val daysPerYear = 365.25
    val tropicOfCancer = math.toRadians(23.43697)
    val solstice = 173.0

    val doy = dayofyear(ts)
    val solarDecline =
      cos((doy - solstice) * (2.0 * math.Pi / daysPerYear)) * tropicOfCancer
    val deltaLatTime = (lon - timezone * 15.0) * 24.0 / 360.0
    val hourAngle =
      ((hour(ts) + minute(ts) / lit(60.0) + deltaLatTime) / 12.0 - 1.0) *
        math.Pi
    val cosZenith0 = sin(solarDecline) * math.sin(math.toRadians(lat)) +
      cos(solarDecline) * math.cos(math.toRadians(lat)) * cos(hourAngle)
    val cosZenith = greatest(cosZenith0, lit(0.0))
    val zenith = acos(cosZenith)

    val transDirect = (cosZenith * 0.2 + 0.6) * (1.0 - cloudFraction)
    val transDiffuse = (cosZenith * 0.1 + 0.3) * cloudFraction

    val beta = doy * (2.0 * math.Pi / daysPerYear)
    val radiusRatio = lit(1.00011) +
      lit(0.034221) * cos(beta) + lit(0.00128) * sin(beta) +
      lit(0.000719) * cos(beta * 2.0) + lit(0.000077) * sin(beta * 2.0)
    val sTimesR = radiusRatio * solarConstant

    val mu = asin(cos(solarDecline) * sin(hourAngle) / sin(zenith))
    val cosi = cosZenith * math.cos(terrainSlope) +
      sin(zenith) * cos(mu - terrainSlopeAzimuth) * math.sin(terrainSlope)

    val direct = greatest(sTimesR * transDirect * cosi, lit(0.0))
    val diffuse = sTimesR * transDiffuse * cosZenith
    (direct, diffuse)
  }

  /** Total potential radiation (direct + diffuse). */
  def potentialRadiation(ts: Column, lon: Double, lat: Double,
      timezone: Double, terrainSlope: Double = 0.0,
      terrainSlopeAzimuth: Double = 0.0, cloudFraction: Double = 0.0)
      : Column = {
    val (direct, diffuse) = potentialRadiationSplit(ts, lon, lat, timezone,
      terrainSlope, terrainSlopeAzimuth, cloudFraction)
    direct + diffuse
  }

  // ------------------------------------------------- daily radiation models

  /** Angstroem (1924): daily global radiation from sunshine duration. */
  def angstroem(ssd: Column, dayLength: Column, potRadDaily: Column,
      a: Column, b: Column): Column =
    (a + b * ssd / dayLength) * potRadDaily

  /** Bristow & Campbell (1984) daily radiation from the diurnal
    * temperature range. DataFrame-level (needs next-day tmin + monthly mean
    * ΔT). Adds column `r0`. A and C may be scalar or monthly (1-12 keyed);
    * monthly params join via broadcast.
    *
    * Scale note: the single unpartitioned window mirrors the reference's
    * per-station series; for multi-station data partition by station_id
    * (pass partitionCols).
    */
  def bristowCampbell(daily: DataFrame, dateCol: String, tminCol: String,
      tmaxCol: String, potRadDailyCol: String,
      a: Either[Double, Map[Int, Double]],
      c: Either[Double, Map[Int, Double]],
      partitionCols: Seq[String] = Nil): DataFrame = {
    // reference reindexes to a complete calendar before shifting so
    // tmin_nextday is the true next CALENDAR day (radiation.py:227-231):
    // equivalent to a join on date+1. Only the very last day self-fills;
    // days preceding an interior gap keep null (pandas NaN).
    val nextTmin = daily.select((partitionCols.map(col) :+
      (date_sub(col(dateCol), 1)).as(dateCol) :+
      col(tminCol).as("tmin_nextday_")): _*)
    val maxDate = daily
      .groupBy(partitionCols.map(col): _*)
      .agg(max(col(dateCol)).as("max_date_"))
    val withMax =
      if (partitionCols.isEmpty) daily.crossJoin(broadcast(maxDate))
      else daily.join(broadcast(maxDate), partitionCols)
    val joined = withMax.join(nextTmin, partitionCols :+ dateCol, "left")
      .withColumn("tmin_nextday",
        when(col(dateCol) === col("max_date_"),
          coalesce(col("tmin_nextday_"), col(tminCol)))
        .otherwise(col("tmin_nextday_")))
      .drop("tmin_nextday_", "max_date_")
    val dT = col(tmaxCol) - (col(tminCol) + col("tmin_nextday")) / 2
    val withDT = joined.withColumn("dT", dT)
      .withColumn("month_", month(col(dateCol)))
    val dTmAvg = withDT.groupBy((partitionCols.map(col) :+ col("month_")): _*)
      .agg(avg(col("dT")).as("dT_m_avg"))
    val withB = withDT
      .join(broadcast(dTmAvg), partitionCols :+ "month_")
      .withColumn("B", lit(0.036) * exp(lit(-0.154) * col("dT_m_avg")))
    def param(p: Either[Double, Map[Int, Double]]): Column = p match {
      case Left(v) => lit(v)
      case Right(m) =>
        m.foldLeft(lit(Double.NaN)) { case (acc, (mo, v)) =>
          when(col("month_") === mo, v).otherwise(acc)
        }
    }
    withB
      .withColumn("transmissivity",
        param(a) * (lit(1.0) - exp(-col("B") * pow(col("dT"), param(c)))))
      .withColumn("r0", col("transmissivity") * col(potRadDailyCol))
      .drop("month_", "dT_m_avg", "B", "transmissivity", "tmin_nextday", "dT")
  }
}
