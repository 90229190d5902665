package graft.queries

import graft.QueryRegistry.register
import graft.core.Tables.table
import graft.agg.Aggregations
import graft.meteo.Meteo
import org.apache.spark.sql.functions._

/** Meteorological scalar expressions + calibration aggregations mapped onto
  * the driver tables (SURVEY.md §2.2, §2.5). Inputs are deterministic
  * derivations of table columns so DuckDB can oracle them. */
object MeteoQueriesImpl {

  // derived met inputs over events: temp in K, hum in %
  private val tempExpr = col("value") % 50 + 250.0
  private val humExpr = col("value") % 70 + 30.0
  private val duckTemp = "(value % 50 + 250.0)"
  private val duckHum = "(value % 70 + 30.0)"

  def init(): Unit = {

    register("q30_vapor_pressure",
      s"""SELECT event_id,
         |  ROUND(CASE WHEN $duckTemp >= 273.15
         |    THEN 6.112 * EXP(17.62 * ($duckTemp - 273.15) / (243.12 + $duckTemp - 273.15))
         |    ELSE 6.112 * EXP(22.46 * ($duckTemp - 273.15) / (272.62 + $duckTemp - 273.15))
         |    END * $duckHum / 100.0, 6) AS vp
         |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      table(s, dir, "events")
        .select(col("event_id"),
          round(Meteo.vaporPressure(tempExpr, humExpr), 6).as("vp"))
        .orderBy(col("event_id"))
    }

    register("q31_dewpoint",
      s"""WITH v AS (SELECT event_id,
         |  CASE WHEN $duckTemp >= 273.15
         |    THEN 6.112 * EXP(17.62 * ($duckTemp - 273.15) / (243.12 + $duckTemp - 273.15))
         |    ELSE 6.112 * EXP(22.46 * ($duckTemp - 273.15) / (272.62 + $duckTemp - 273.15))
         |    END * $duckHum / 100.0 AS vp,
         |  $duckTemp AS t FROM events)
         |SELECT event_id,
         |  ROUND(CASE WHEN t >= 273.15
         |    THEN 243.12 * LN(vp / 6.112) / (17.62 - LN(vp / 6.112))
         |    ELSE 272.62 * LN(vp / 6.112) / (22.46 - LN(vp / 6.112))
         |    END + 273.15, 6) AS tdew
         |FROM v ORDER BY event_id""".stripMargin) { (s, dir) =>
      table(s, dir, "events")
        .select(col("event_id"),
          round(Meteo.dewpointTemperature(tempExpr, humExpr), 6).as("tdew"))
        .orderBy(col("event_id"))
    }

    register("q32_sun_times",
      """WITH days AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders),
        |c AS (SELECT d, DAYOFYEAR(d) AS doy FROM days),
        |t0 AS (SELECT d,
        |  RADIANS((360.0/365.25) * (doy - 79.346)) AS da,
        |  (doy - 1) * (2*PI()/365.0) AS das
        |  FROM c),
        |u AS (SELECT d,
        |  RADIANS(0.3723
        |    + 23.2567 * SIN(da) - 0.7580 * COS(da)
        |    + 0.1149 * SIN(da * 2) + 0.3656 * COS(da * 2)
        |    - 0.1712 * SIN(da * 3) + 0.0201 * COS(da * 3)) AS decl,
        |  (12.0/PI()) * (0.000075
        |    + 0.001868 * COS(das) - 0.032077 * SIN(das)
        |    - 0.014615 * COS(das * 2) - 0.040849 * SIN(das * 2)) AS eqt
        |  FROM t0),
        |v AS (SELECT d, decl, eqt,
        |  -TAN(RADIANS(51.0)) * TAN(decl) AS arg,
        |  12.0 - (8.86 - 15.0)*24.0/360.0 - eqt AS sunnoon FROM u),
        |w AS (SELECT d, sunnoon, arg,
        |  CASE WHEN arg < -1 THEN sunnoon - 12 WHEN arg > 1 THEN sunnoon
        |    ELSE 12.0*(1.0 - ACOS(arg)/PI()) - (8.86-15.0)*24.0/360.0 - eqt END AS sr,
        |  CASE WHEN arg < -1 THEN sunnoon + 12 WHEN arg > 1 THEN sunnoon
        |    ELSE 12.0*(1.0 + ACOS(arg)/PI()) - (8.86-15.0)*24.0/360.0 - eqt END AS ss
        |  FROM v)
        |SELECT STRFTIME(d, '%Y-%m-%d') AS day,
        |  ROUND(CASE WHEN sr < 0 THEN sr + 24 ELSE sr END, 6) AS sunrise,
        |  ROUND(sunnoon, 6) AS sunnoon,
        |  ROUND(CASE WHEN ss > 24 THEN ss - 24 ELSE ss END, 6) AS sunset,
        |  ROUND(ss - sr, 6) AS daylength
        |FROM w ORDER BY 1""".stripMargin) { (s, dir) =>
      val days = table(s, dir, "orders")
        .select(col("o_orderdate").cast("date").as("date")).distinct()
      Meteo.withSunTimes(days, "date", 8.86, 51.0, 1.0)
        .select(date_format(col("date"), "yyyy-MM-dd").as("day"),
          round(col("sunrise"), 6).as("sunrise"),
          round(col("sunnoon"), 6).as("sunnoon"),
          round(col("sunset"), 6).as("sunset"),
          round(col("daylength"), 6).as("daylength"))
        .orderBy(col("day"))
    }

    register("q33_potential_radiation",
      """WITH h AS (SELECT DISTINCT DATE_TRUNC('hour', ts) AS t FROM events),
        |c AS (SELECT t, DAYOFYEAR(t) AS doy,
        |  EXTRACT(hour FROM t) AS hr FROM h),
        |a AS (SELECT t,
        |  COS((doy - 173.0) * (2.0*PI()/365.25)) * RADIANS(23.43697) AS decl,
        |  ((hr + 0.0/60.0 + (8.86 - 15.0)*24.0/360.0) / 12.0 - 1.0) * PI() AS ha,
        |  doy * (2.0*PI()/365.25) AS beta
        |  FROM c),
        |b AS (SELECT t,
        |  GREATEST(SIN(decl)*SIN(RADIANS(51.0))
        |    + COS(decl)*COS(RADIANS(51.0))*COS(ha), 0.0) AS cz,
        |  1367.0 * (1.00011 + 0.034221*COS(beta) + 0.00128*SIN(beta)
        |    + 0.000719*COS(2.0*beta) + 0.000077*SIN(2.0*beta)) AS sr
        |  FROM a)
        |SELECT STRFTIME(t, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |  ROUND(GREATEST(sr * ((0.6 + 0.2*cz) * 1.0) * cz, 0.0), 6) AS pot_rad
        |FROM b ORDER BY 1""".stripMargin) { (s, dir) =>
      table(s, dir, "events")
        .select(date_trunc("hour", col("ts")).as("t")).distinct()
        .select(date_format(col("t"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
          round(Meteo.potentialRadiation(col("t"), 8.86, 51.0, 1.0), 6)
            .as("pot_rad"))
        .orderBy(col("ts_str"))
    }

    register("q34_angstroem",
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |  CAST(COUNT(*) % 12 AS DOUBLE) AS ssd FROM orders GROUP BY 1)
        |SELECT STRFTIME(d, '%Y-%m-%d') AS day,
        |  ROUND((0.25 + 0.5 * ssd / 12.0) * 250.0, 6) AS glob_day
        |FROM daily ORDER BY 1""".stripMargin) { (s, dir) =>
      val daily = table(s, dir, "orders")
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg((count(lit(1)) % 12).cast("double").as("ssd"))
      daily.select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        round(Meteo.angstroem(col("ssd"), lit(12.0), lit(250.0), lit(0.25),
          lit(0.5)), 6).as("glob_day"))
        .orderBy(col("day"))
    }

    // Bristow-Campbell over an events-derived daily frame (contiguous days).
    register("q35_bristow_campbell",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    270.0 + MIN(value) % 20 AS tmin, 285.0 + MAX(value) % 15 AS tmax
        |  FROM events GROUP BY 1),
        |shifted AS (
        |  SELECT d, tmin, tmax,
        |    COALESCE(LEAD(tmin) OVER (ORDER BY d), tmin) AS tmin_nextday
        |  FROM daily),
        |dt AS (SELECT d, tmax - (tmin + tmin_nextday)/2.0 AS dT,
        |    EXTRACT(month FROM d) AS m FROM shifted),
        |mavg AS (SELECT m, SUM(CAST(ROUND(dT * 1e6) AS BIGINT))/COUNT(*)/1e6
        |    AS dTm FROM dt GROUP BY m)
        |SELECT STRFTIME(d, '%Y-%m-%d') AS day,
        |  ROUND(0.75 * (1.0 - EXP(-(0.036 * EXP(-0.154 * dTm))
        |    * POW(dT, 2.4))) * 220.0, 6) AS r0
        |FROM dt JOIN mavg USING (m) ORDER BY 1""".stripMargin) { (s, dir) =>
      val daily = table(s, dir, "events")
        .groupBy(col("ts").cast("date").as("date"))
        .agg((min(col("value")) % 20 + 270.0).as("tmin"),
          (max(col("value")) % 15 + 285.0).as("tmax"))
        .withColumn("pot", lit(220.0))
      // exact-match detail: monthly mean of dT goes through integer micros
      // in the oracle; do the same here by overriding the avg — we instead
      // recompute dT identically and use micros in the groupBy below.
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("date"))
      val shifted = daily.withColumn("tmin_nextday",
        coalesce(lead(col("tmin"), 1).over(w), col("tmin")))
      val dt = shifted.withColumn("dT",
        col("tmax") - (col("tmin") + col("tmin_nextday")) / 2.0)
        .withColumn("m", month(col("date")))
      val mavg = dt.groupBy(col("m"))
        .agg((sum(round(col("dT") * 1e6).cast("long")) / count(lit(1)) / 1e6)
          .as("dTm"))
      dt.join(broadcast(mavg), "m")
        .select(date_format(col("date"), "yyyy-MM-dd").as("day"),
          round(lit(0.75) * (lit(1.0) -
            exp(-(lit(0.036) * exp(lit(-0.154) * col("dTm"))) *
              pow(col("dT"), 2.4))) * 220.0, 6).as("r0"))
        .orderBy(col("day"))
    }

    register("q36_mean_course_by_month",
      """WITH course AS (
        |  SELECT EXTRACT(month FROM ts) AS month, EXTRACT(hour FROM ts) AS hour,
        |    SUM(CAST(ROUND(value * 1e6) AS BIGINT)) / COUNT(value) / 1e6 AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT month, hour,
        |  ROUND((v - MIN(v) OVER (PARTITION BY month))
        |    / (MAX(v) OVER (PARTITION BY month)
        |       - MIN(v) OVER (PARTITION BY month)), 6) AS v
        |FROM course ORDER BY month, hour""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val course = table(s, dir, "events")
        .groupBy(month(col("ts")).cast("long").as("month"),
          hour(col("ts")).cast("long").as("hour"))
        .agg((sum(round(col("value") * 1e6).cast("long")) /
          count(col("value")) / 1e6).as("v0"))
      val w = Window.partitionBy(col("month"))
      course.select(col("month"), col("hour"),
        round((col("v0") - min(col("v0")).over(w)) /
          (max(col("v0")).over(w) - min(col("v0")).over(w)), 6).as("v"))
        .orderBy(col("month"), col("hour"))
    }

    register("q37_month_hour_precip_mean",
      """WITH ev AS (SELECT ts, value AS hum,
        |    CASE WHEN event_type = 'error' THEN value ELSE 0.0 END AS precip
        |  FROM events),
        |wet_days AS (SELECT CAST(ts AS DATE) AS d,
        |    SUM(CAST(ROUND(precip * 1e6) AS BIGINT)) > 0 AS wet
        |  FROM ev GROUP BY 1)
        |SELECT EXTRACT(month FROM ts) AS month, EXTRACT(hour FROM ts) AS hour,
        |  wet,
        |  SUM(CAST(ROUND(hum * 1e6) AS BIGINT)) / COUNT(hum) / 1e6 AS mean_hum
        |FROM ev JOIN wet_days ON CAST(ts AS DATE) = d
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val ev = table(s, dir, "events")
        .select(col("ts"), col("value").as("hum"),
          when(col("event_type") === "error", col("value")).otherwise(0.0)
            .as("precip"))
      val wetDays = ev.groupBy(col("ts").cast("date").as("date"))
        .agg((sum(round(col("precip") * 1e6).cast("long")) > 0).as("wet"))
      ev.withColumn("date", col("ts").cast("date"))
        .join(wetDays, "date")
        .groupBy(month(col("ts")).cast("long").as("month"),
          hour(col("ts")).cast("long").as("hour"), col("wet"))
        .agg((sum(round(col("hum") * 1e6).cast("long")) /
          count(col("hum")) / 1e6).as("mean_hum"))
        .orderBy(col("month"), col("hour"), col("wet"))
    }

    // hour of daily max (temperature.py:280-282); ties resolved as
    // "largest hour among max-value rows" in both engines.
    register("q38_hour_of_daily_max",
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d, MAX(value) AS mv
        |  FROM events GROUP BY 1)
        |SELECT STRFTIME(d, '%Y-%m-%d') AS day,
        |  MAX(EXTRACT(hour FROM ts)) AS hour_of_max
        |FROM events JOIN daily ON CAST(ts AS DATE) = d AND value = mv
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // two hash aggregates + a join: max(struct) would plan as
      // non-codegen SortAggregate with two extra sorts
      val ev = table(s, dir, "events")
        .select(col("ts").cast("date").as("date"),
          hour(col("ts")).cast("long").as("h"), col("value"))
      val daily = ev.groupBy(col("date")).agg(max(col("value")).as("mv"))
      ev.join(daily, "date")
        .where(col("value") === col("mv"))
        .groupBy(col("date"))
        .agg(max(col("h")).as("hour_of_max"))
        .select(date_format(col("date"), "yyyy-MM-dd").as("day"),
          col("hour_of_max"))
        .orderBy(col("day"))
    }

    // closed-form linregress from aggregates (util/util.py:137-157 without
    // scipy): daily (min value -> x, max value -> y) pairs.
    register("q39_linregress",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, MIN(value) AS x, MAX(value) AS y
        |  FROM events GROUP BY 1)
        |SELECT ROUND(COVAR_POP(x, y) / VAR_POP(x), 4) AS a1,
        |  ROUND(AVG(y) - COVAR_POP(x, y) / VAR_POP(x) * AVG(x), 4) AS a0,
        |  ROUND(COVAR_POP(x, y) / SQRT(VAR_POP(x) * VAR_POP(y)), 4) AS r
        |FROM daily""".stripMargin) { (s, dir) =>
      val daily = table(s, dir, "events")
        .groupBy(col("ts").cast("date").as("d"))
        .agg(min(col("value")).as("x"), max(col("value")).as("y"))
      daily.agg(
        round(covar_pop(col("x"), col("y")) / var_pop(col("x")), 4).as("a1"),
        round(avg(col("y")) - covar_pop(col("x"), col("y")) /
          var_pop(col("x")) * avg(col("x")), 4).as("a0"),
        round(covar_pop(col("x"), col("y")) /
          sqrt(var_pop(col("x")) * var_pop(col("y"))), 4).as("r"))
    }
  }
}
