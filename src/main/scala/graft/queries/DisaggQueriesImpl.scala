package graft.queries

import graft.QueryRegistry.{register, registerRowsOnly}
import graft.core.Tables.table
import graft.core.TimeSeries
import graft.disagg.{Humidity, Precipitation, Temperature, Wind}
import graft.meteo.Meteo
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Disaggregation operators (SURVEY.md §2.8) as driver-checkable queries
  * over events-derived daily meteorology. The oracles re-state each
  * operator in DuckDB SQL with ulp-identical operation ordering. */
object DisaggQueriesImpl {

  /** events-derived daily met frame (contiguous days, deterministic). */
  private def dailyMet(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")
      .groupBy(col("ts").cast("date").as("date"))
      .agg((min(col("value")) % 20 + 270.0).as("tmin"),
        (max(col("value")) % 15 + 285.0).as("tmax"),
        (min(col("value")) % 30 + 40.0).as("hum_min"),
        (max(col("value")) % 25 + 70.0).as("hum_max"),
        (sum(round(col("value") * 1e6).cast("long")) / count(lit(1)) / 1e6 /
          100.0 + 2.0).as("wind"))
      .withColumn("temp", (col("tmin") + col("tmax")) / 2.0)

  private val duckDailyMet =
    """daily AS (
      |  SELECT CAST(ts AS DATE) AS d,
      |    MIN(value) % 20 + 270.0 AS tmin,
      |    MAX(value) % 15 + 285.0 AS tmax,
      |    MIN(value) % 30 + 40.0 AS hum_min,
      |    MAX(value) % 25 + 70.0 AS hum_max,
      |    SUM(CAST(ROUND(value * 1e6) AS BIGINT)) / COUNT(*) / 1e6 / 100.0
      |      + 2.0 AS wind,
      |    (MIN(value) % 20 + 270.0 + MAX(value) % 15 + 285.0) / 2.0 AS temp
      |  FROM events GROUP BY 1)""".stripMargin

  private val duckHours =
    """hourly AS (
      |  SELECT *, CAST(EXTRACT(hour FROM h) AS INT) AS hr FROM (
      |    SELECT *, UNNEST(GENERATE_SERIES(CAST(d AS TIMESTAMP),
      |      CAST(d AS TIMESTAMP) + INTERVAL 23 HOUR, INTERVAL 1 HOUR)) AS h
      |    FROM locs))""".stripMargin

  /** synthetic hourly temperature: linear tmin->tmax over the day */
  private def synthHourlyTemp(daily: DataFrame): DataFrame =
    TimeSeries.explodeDays(daily.select(col("date"), col("tmin"),
        col("tmax")), "date", 24, 3600L * 1000000L)
      .select(col("timestamp"),
        (col("tmin") + (col("tmax") - col("tmin")) *
          hour(col("timestamp")) / 23.0).as("temp"))

  private val duckSynthTemp =
    "tmin + (tmax - tmin) * hr / 23.0"

  def init(): Unit = {

    register("q40_temp_sine_min_max",
      s"""WITH $duckDailyMet,
         |locs AS (
         |  SELECT d, tmin, tmax,
         |    COALESCE(LEAD(tmin) OVER (ORDER BY d), tmin) AS min_val_next,
         |    COALESCE(LAG(tmax) OVER (ORDER BY d), tmax) AS max_val_before
         |  FROM daily),
         |$duckHours,
         |vals AS (
         |  SELECT h, hr,
         |    CASE WHEN hr < 14 THEN tmin ELSE min_val_next END AS minv,
         |    CASE WHEN hr < 7 THEN max_val_before ELSE tmax END AS maxv
         |  FROM hourly)
         |SELECT STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS ts_str,
         |  ROUND(minv + (maxv - minv) / 2.0
         |    + ((maxv - minv) / 2.0) * COS((hr - 14) * (2 * PI() / 24)), 6)
         |    AS temp
         |FROM vals ORDER BY 1""".stripMargin) { (s, dir) =>
      Temperature.disaggregate(dailyMet(s, dir), "sine_min_max", "fix")
        .select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss")
          .as("ts_str"), round(col("temp"), 6).as("temp"))
        .orderBy(col("ts_str"))
    }

    register("q41_hum_min_max",
      s"""WITH $duckDailyMet,
         |locs AS (SELECT d, tmin, tmax, hum_min, hum_max FROM daily),
         |$duckHours
         |SELECT STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS ts_str,
         |  ROUND(LEAST(100.0, GREATEST(0.0,
         |    hum_max + (($duckSynthTemp) - tmin) / (tmax - tmin)
         |      * (hum_min - hum_max))), 6) AS hum
         |FROM hourly ORDER BY 1""".stripMargin) { (s, dir) =>
      val daily = dailyMet(s, dir)
      Humidity.disaggregate(daily, "min_max",
          hourlyTemp = synthHourlyTemp(daily))
        .select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss")
          .as("ts_str"), round(col("hum"), 6).as("hum"))
        .orderBy(col("ts_str"))
    }

    register("q42_hum_dewpoint_regression", {
      def es(t: String) =
        s"""(CASE WHEN ($t) >= 273.15
           |  THEN 6.112 * EXP(17.62 * (($t) - 273.15) / (243.12 + ($t) - 273.15))
           |  ELSE 6.112 * EXP(22.46 * (($t) - 273.15) / (272.62 + ($t) - 273.15))
           |  END * 100.0 / 100.0)""".stripMargin
      s"""WITH $duckDailyMet,
         |locs AS (SELECT d, tmin, tmax,
         |  -10.0 + 1.05 * tmin AS tdew FROM daily),
         |$duckHours
         |SELECT STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS ts_str,
         |  ROUND(LEAST(100.0, GREATEST(0.0,
         |    100.0 * ${es("tdew")} / ${es(duckSynthTemp)})), 6) AS hum
         |FROM hourly ORDER BY 1""".stripMargin
    }) { (s, dir) =>
      val daily = dailyMet(s, dir)
      Humidity.disaggregate(daily, "dewpoint_regression",
          hourlyTemp = synthHourlyTemp(daily), a0 = -10.0, a1 = 1.05)
        .select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss")
          .as("ts_str"), round(col("hum"), 6).as("hum"))
        .orderBy(col("ts_str"))
    }

    register("q43_wind_cosine",
      s"""WITH $duckDailyMet,
         |locs AS (SELECT d, wind FROM daily),
         |$duckHours
         |SELECT STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS ts_str,
         |  ROUND(1.0 * wind * COS((hr - 14.0) * (PI() / 12.0))
         |    + 0.8 * wind, 6) AS wind
         |FROM hourly ORDER BY 1""".stripMargin) { (s, dir) =>
      Wind.disaggregate(dailyMet(s, dir), "cosine", a = 1.0, b = 0.8,
          tShift = 14.0)
        .select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss")
          .as("ts_str"), round(col("wind"), 6).as("wind"))
        .orderBy(col("ts_str"))
    }

    register("q44_precip_equal",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    SUM(CAST(ROUND(CASE WHEN event_type = 'error' THEN value
        |      ELSE 0.0 END * 1e6) AS BIGINT)) / 1e6 AS precip
        |  FROM events GROUP BY 1),
        |locs AS (SELECT d, precip FROM daily),
        |hourly AS (
        |  SELECT *, UNNEST(GENERATE_SERIES(CAST(d AS TIMESTAMP),
        |    CAST(d AS TIMESTAMP) + INTERVAL 23 HOUR, INTERVAL 1 HOUR)) AS h
        |  FROM locs)
        |SELECT STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |  ROUND(precip / 24.0, 6) AS precip
        |FROM hourly ORDER BY 1""".stripMargin) { (s, dir) =>
      val daily = table(s, dir, "events")
        .groupBy(col("ts").cast("date").as("date"))
        .agg((sum(round(when(col("event_type") === "error", col("value"))
          .otherwise(0.0) * 1e6).cast("long")) / 1e6).as("precip"))
      Precipitation.equal(daily)
        .select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss")
          .as("ts_str"), round(col("precip"), 6).as("precip"))
        .orderBy(col("ts_str"))
    }

    register("q45_precip_masterstation",
      """WITH local_daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    SUM(CAST(ROUND(CASE WHEN event_type = 'click' THEN value
        |      ELSE 0.0 END * 1e6) AS BIGINT)) / 1e6 AS precip
        |  FROM events GROUP BY 1),
        |master_h AS (
        |  SELECT DATE_TRUNC('hour', ts) AS h,
        |    SUM(CAST(ROUND(value * 1e6) AS BIGINT)) / 1e6 AS mp
        |  FROM events GROUP BY 1),
        |master_d AS (
        |  SELECT CAST(h AS DATE) AS d,
        |    SUM(CAST(ROUND(mp * 1e6) AS BIGINT)) / 1e6 AS md
        |  FROM master_h GROUP BY 1)
        |SELECT STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |  ROUND(CASE WHEN md <> 0.0 THEN mp / md * precip
        |    ELSE precip / 24.0 END, 6) AS precip
        |FROM master_h
        |JOIN master_d ON CAST(h AS DATE) = master_d.d
        |JOIN local_daily ON CAST(h AS DATE) = local_daily.d
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val ev = table(s, dir, "events")
      val localDaily = ev
        .groupBy(col("ts").cast("date").as("date"))
        .agg((sum(round(when(col("event_type") === "click", col("value"))
          .otherwise(0.0) * 1e6).cast("long")) / 1e6).as("precip"))
      val masterHourly = ev
        .groupBy(date_trunc("hour", col("ts")).as("timestamp"))
        .agg((sum(round(col("value") * 1e6).cast("long")) / 1e6)
          .as("precip"))
      Precipitation.masterStation(localDaily, masterHourly)
        .select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss")
          .as("ts_str"), round(col("precip"), 6).as("precip"))
        .orderBy(col("ts_str"))
    }

    // radiation pot_rad scaling with exact-integer daily pot means; the
    // hourly pot formula matches q33 / Meteo.potentialRadiation.
    register("q46_radiation_pot_rad",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    SUM(CAST(ROUND(value * 1e6) AS BIGINT)) / COUNT(*) / 1e6 * 2.0
        |      AS "glob"
        |  FROM events GROUP BY 1),
        |locs AS (SELECT d, "glob" FROM daily),
        |hourly AS (
        |  SELECT *, CAST(EXTRACT(hour FROM h) AS INT) AS hr FROM (
        |    SELECT *, UNNEST(GENERATE_SERIES(CAST(d AS TIMESTAMP),
        |      CAST(d AS TIMESTAMP) + INTERVAL 23 HOUR, INTERVAL 1 HOUR)) AS h
        |    FROM locs)),
        |pot AS (
        |  SELECT d, h, "glob",
        |    GREATEST(1367.0 * (1.00011
        |        + 0.034221*COS(DAYOFYEAR(h) * (2.0*PI()/365.25))
        |        + 0.00128*SIN(DAYOFYEAR(h) * (2.0*PI()/365.25))
        |        + 0.000719*COS(DAYOFYEAR(h) * (2.0*PI()/365.25) * 2.0)
        |        + 0.000077*SIN(DAYOFYEAR(h) * (2.0*PI()/365.25) * 2.0))
        |      * ((0.6 + 0.2*GREATEST(
        |          SIN(COS((DAYOFYEAR(h) - 173.0) * (2.0*PI()/365.25))
        |              * RADIANS(23.43697)) * SIN(RADIANS(51.0))
        |          + COS(COS((DAYOFYEAR(h) - 173.0) * (2.0*PI()/365.25))
        |              * RADIANS(23.43697)) * COS(RADIANS(51.0))
        |          * COS(((hr + 0.0/60.0 + (8.86 - 15.0)*24.0/360.0) / 12.0
        |                 - 1.0) * PI()), 0.0)) * 1.0)
        |      * GREATEST(
        |          SIN(COS((DAYOFYEAR(h) - 173.0) * (2.0*PI()/365.25))
        |              * RADIANS(23.43697)) * SIN(RADIANS(51.0))
        |          + COS(COS((DAYOFYEAR(h) - 173.0) * (2.0*PI()/365.25))
        |              * RADIANS(23.43697)) * COS(RADIANS(51.0))
        |          * COS(((hr + 0.0/60.0 + (8.86 - 15.0)*24.0/360.0) / 12.0
        |                 - 1.0) * PI()), 0.0), 0.0) AS pr
        |  FROM hourly),
        |potd AS (
        |  SELECT d, SUM(CAST(ROUND(pr * 1e6) AS BIGINT)) / 24.0 / 1e6
        |    AS prd
        |  FROM pot GROUP BY d)
        |SELECT STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |  ROUND(CASE WHEN pr / prd * "glob" < 1e-2 THEN 0.0
        |    ELSE pr / prd * "glob" END, 6) AS "glob"
        |FROM pot JOIN potd USING (d) ORDER BY 1""".stripMargin) { (s, dir) =>
      val daily = table(s, dir, "events")
        .groupBy(col("ts").cast("date").as("date"))
        .agg((sum(round(col("value") * 1e6).cast("long")) / count(lit(1)) /
          1e6 * 2.0).as("glob"))
      val pot = TimeSeries.hourlyIndex(daily)
        .select(col("timestamp"),
          Meteo.potentialRadiation(col("timestamp"), 8.86, 51.0, 1.0)
            .as("pr"))
      val potDaily = pot
        .groupBy(col("timestamp").cast("date").as("date"))
        .agg((sum(round(col("pr") * 1e6).cast("long")) / 24.0 / 1e6)
          .as("prd"))
      pot.withColumn("date", col("timestamp").cast("date"))
        .join(potDaily, "date").join(daily, "date")
        .withColumn("g", col("pr") / col("prd") * col("glob"))
        .select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss")
          .as("ts_str"),
          round(when(col("g") < 1e-2, 0.0).otherwise(col("g")), 6)
            .as("glob"))
        .orderBy(col("ts_str"))
    }

    // stochastic / overlay paths: correctness held by golden + invariant
    // specs, driver records rows-only.
    registerRowsOnly("q47_wind_random") { (s, dir) =>
      Wind.disaggregate(dailyMet(s, dir), "random", seed = 42L)
        .select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss")
          .as("ts_str"), round(col("wind"), 6).as("wind"))
        .orderBy(col("ts_str"))
    }

    // q47's stochastic path hash-proven: the same w̄·(-ln U)^0.3 engine
    // with the ONE pluggable piece — the uniform draw — swapped from
    // xxhash64 to md5 so DuckDB recomputes every draw nibble-for-nibble
    // (the q97/q98 cascade-twin pattern). POW/LN at 6-dp rounding
    // round-trips between the engines (q43 already proves COS does).
    register("q99_wind_random_md5",
      s"""WITH $duckDailyMet,
         |locs AS (SELECT d, wind FROM daily),
         |$duckHours,
         |u AS (SELECT h, wind,
         |  ((${OracleDraw.hex8(
             "MD5(CONCAT('42', '|', STRFTIME(h, '%Y-%m-%d %H:%M:%S')))")})
         |    + 1.0) / 4294967298.0 AS u
         |  FROM hourly)
         |SELECT STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS ts_str,
         |  ROUND(wind * POW(-LN(u), 0.3), 6) AS wind
         |FROM u ORDER BY 1""".stripMargin) { (s, dir) =>
      Wind.disaggregate(dailyMet(s, dir), "random", seed = 42L,
          draw = OracleDraw.md5Draw)
        .select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss")
          .as("ts_str"), round(col("wind"), 6).as("wind"))
        .orderBy(col("ts_str"))
    }

    // polar overlay (temperature.py:178-240) at lat 75: deterministic, so
    // oracle-checkable — the SQL restates sun times (q32 algebra, lon 20),
    // the fix locFrame (q40 algebra), the sine curve, the polar/transition
    // flags, and the row-spaced limit-23 interpolation (q20 algebra).
    register("q48_temp_polar",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    MIN(value) % 20 + 270.0 AS tmin,
        |    MAX(value) % 15 + 285.0 AS tmax
        |  FROM events GROUP BY 1),
        |sun AS (
        |  SELECT d, tmin, tmax,
        |    RADIANS((360.0/365.25) * (DAYOFYEAR(d) - 79.346)) AS da,
        |    (DAYOFYEAR(d) - 1) * (2*PI()/365.0) AS das
        |  FROM daily),
        |u AS (
        |  SELECT d, tmin, tmax,
        |    RADIANS(0.3723 + 23.2567*SIN(da) - 0.7580*COS(da)
        |      + 0.1149*SIN(da*2) + 0.3656*COS(da*2)
        |      - 0.1712*SIN(da*3) + 0.0201*COS(da*3)) AS decl,
        |    (12.0/PI()) * (0.000075 + 0.001868*COS(das) - 0.032077*SIN(das)
        |      - 0.014615*COS(das*2) - 0.040849*SIN(das*2)) AS eqt
        |  FROM sun),
        |v AS (
        |  SELECT d, tmin, tmax,
        |    -TAN(RADIANS(75.0)) * TAN(decl) AS arg,
        |    12.0 - (20.0 - 15.0)*24.0/360.0 - eqt AS sunnoon, eqt
        |  FROM u),
        |dl AS (
        |  SELECT d, tmin, tmax,
        |    (CASE WHEN arg < -1 THEN sunnoon + 12 WHEN arg > 1 THEN sunnoon
        |      ELSE 12.0*(1.0 + ACOS(arg)/PI()) - (20.0-15.0)*24.0/360.0 - eqt
        |      END)
        |    - (CASE WHEN arg < -1 THEN sunnoon - 12 WHEN arg > 1 THEN sunnoon
        |      ELSE 12.0*(1.0 - ACOS(arg)/PI()) - (20.0-15.0)*24.0/360.0 - eqt
        |      END) AS daylength
        |  FROM v),
        |locs AS (
        |  SELECT d, tmin, tmax, daylength,
        |    COALESCE(LEAD(tmin) OVER (ORDER BY d), tmin) AS min_val_next,
        |    COALESCE(LAG(tmax) OVER (ORDER BY d), tmax) AS max_val_before,
        |    COALESCE(LAG(tmin) OVER (ORDER BY d), tmin) AS min_val_before
        |  FROM dl),
        |flags AS (
        |  SELECT *,
        |    daylength < 3.0 AS polar,
        |    COALESCE((min_val_before + max_val_before)/2.0
        |      <= (tmin + tmax)/2.0, FALSE) AS warming
        |  FROM locs),
        |flags2 AS (
        |  SELECT *,
        |    (NOT polar) AND COALESCE(LAG(polar) OVER (ORDER BY d), FALSE)
        |      AS polar_to_normal,
        |    (NOT polar) AND COALESCE(LEAD(polar) OVER (ORDER BY d), FALSE)
        |      AS normal_to_polar
        |  FROM flags),
        |hourly AS (
        |  SELECT *, CAST(EXTRACT(hour FROM h) AS INT) AS hr FROM (
        |    SELECT *, UNNEST(GENERATE_SERIES(CAST(d AS TIMESTAMP),
        |      CAST(d AS TIMESTAMP) + INTERVAL 23 HOUR, INTERVAL 1 HOUR)) AS h
        |    FROM flags2)),
        |curve AS (
        |  SELECT h, hr, polar, warming, polar_to_normal, normal_to_polar,
        |    tmin, tmax,
        |    (CASE WHEN hr < 14 THEN tmin ELSE min_val_next END)
        |      + ((CASE WHEN hr < 7 THEN max_val_before ELSE tmax END)
        |         - (CASE WHEN hr < 14 THEN tmin ELSE min_val_next END)) / 2.0
        |      + (((CASE WHEN hr < 7 THEN max_val_before ELSE tmax END)
        |         - (CASE WHEN hr < 14 THEN tmin ELSE min_val_next END)) / 2.0)
        |        * COS((hr - 14) * (2 * PI() / 24)) AS temp_curve,
        |    (polar OR polar_to_normal OR normal_to_polar) AS in_subset
        |  FROM hourly),
        |sub AS (
        |  SELECT h,
        |    CASE WHEN polar THEN
        |        CASE WHEN hr = 6 THEN CASE WHEN warming THEN tmin ELSE tmax END
        |             WHEN hr = 18 THEN CASE WHEN warming THEN tmax ELSE tmin END
        |             END
        |      WHEN polar_to_normal THEN
        |        CASE WHEN hr < 7 THEN NULL WHEN hr = 7 THEN tmin
        |          ELSE temp_curve END
        |      WHEN normal_to_polar THEN
        |        CASE WHEN hr > 14 THEN NULL ELSE temp_curve END
        |    END AS v,
        |    ROW_NUMBER() OVER (ORDER BY h) AS rn
        |  FROM curve WHERE in_subset),
        |subw AS (
        |  SELECT h, v, rn,
        |    LAST_VALUE(v IGNORE NULLS) OVER wp AS pv,
        |    LAST_VALUE(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
        |      OVER wp AS prn,
        |    FIRST_VALUE(v IGNORE NULLS) OVER wn AS nv,
        |    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
        |      OVER wn AS nrn
        |  FROM sub
        |  WINDOW wp AS (ORDER BY h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wn AS (ORDER BY h
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |interp AS (
        |  SELECT h,
        |    CASE WHEN v IS NOT NULL THEN v
        |      WHEN pv IS NOT NULL AND nv IS NOT NULL AND rn - prn <= 23
        |        THEN pv + (nv - pv) * (CAST(rn - prn AS DOUBLE) / (nrn - prn))
        |      WHEN pv IS NOT NULL AND nv IS NULL AND rn - prn <= 23 THEN pv
        |    END AS vi
        |  FROM subw)
        |SELECT STRFTIME(curve.h, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |  ROUND(CASE WHEN in_subset THEN vi ELSE temp_curve END, 6) AS temp
        |FROM curve LEFT JOIN interp ON curve.h = interp.h
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val daily = Meteo.withSunTimes(dailyMet(s, dir), "date", 20.0, 75.0,
        1.0)
      Temperature.disaggregate(daily, "sine_min_max", "fix")
        .select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss")
          .as("ts_str"), round(col("temp"), 6).as("temp"))
        .orderBy(col("ts_str"))
    }
  }
}
