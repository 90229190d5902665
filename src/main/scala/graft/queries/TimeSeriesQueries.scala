package graft.queries

import graft.QueryRegistry.{register, registerRowsOnly}
import graft.core.Tables.table
import graft.core.TimeSeries
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series primitives mapped onto the driver's `events`/`orders` tables:
  * index generation, equal distribution, resample-style daily aggregation,
  * windows (lag/lead/ffill/cumsum/pairwise), gap detection, calendars
  * (SURVEY.md §2.3, §2.5, §2.6).
  */
object TimeSeriesQueries {
  import TimestampHelpers._

  def init(): Unit = {

    // util.daily_from_hourly (melodist/util/util.py:374-414): one groupBy
    // with variable-aware aggregates.
    register("q10_daily_from_hourly",
      """SELECT STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |  SUM(CAST(ROUND(value * 1e6) AS BIGINT)) / COUNT(value) / 1e6 AS v_mean,
        |  MIN(value) AS v_min,
        |  MAX(value) AS v_max,
        |  SUM(CAST(ROUND(value * 1e6) AS BIGINT)) / 1e6 AS v_sum,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      table(s, dir, "events")
        .groupBy(date_format(col("ts").cast("date"), "yyyy-MM-dd").as("day"))
        .agg(avgMicros(col("value")).as("v_mean"),
          min(col("value")).as("v_min"),
          max(col("value")).as("v_max"),
          sumMicros(col("value")).as("v_sum"),
          count(lit(1)).as("n"))
        .orderBy(col("day"))
    }

    // util.hourly_index (util/util.py:26-43): 24 stamps per present day.
    register("q11_hourly_index",
      """SELECT STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS ts_str
        |FROM (SELECT UNNEST(GENERATE_SERIES(CAST(d AS TIMESTAMP),
        |        CAST(d AS TIMESTAMP) + INTERVAL 23 HOUR, INTERVAL 1 HOUR)) AS h
        |      FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d
        |            FROM orders WHERE o_orderdate < TIMESTAMP '1995-03-01'))
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val daily = table(s, dir, "orders")
        .where(col("o_orderdate") < lit("1995-03-01").cast("timestamp"))
        .select(col("o_orderdate").cast("date").as("date")).distinct()
      TimeSeries.hourlyIndex(daily)
        .select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss")
          .as("ts_str"))
        .orderBy(col("ts_str"))
    }

    // util.distribute_equally divide=True (util/util.py:46-67).
    register("q12_distribute_equally",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    SUM(CAST(ROUND(value * 1e6) AS BIGINT)) / 1e6 AS v
        |  FROM events GROUP BY 1)
        |SELECT STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |  ROUND(v / 24, 6) AS v_hourly
        |FROM (SELECT d, v, UNNEST(GENERATE_SERIES(CAST(d AS TIMESTAMP),
        |        CAST(d AS TIMESTAMP) + INTERVAL 23 HOUR, INTERVAL 1 HOUR)) AS h
        |      FROM daily)
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val daily = table(s, dir, "events")
        .groupBy(col("ts").cast("date").as("date"))
        .agg(sumMicros(col("value")).as("v"))
      TimeSeries.distributeEqually(daily, "date", Seq("v"), divide = true)
        .select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss")
          .as("ts_str"),
          round(col("v"), 6).as("v_hourly"))
        .orderBy(col("ts_str"))
    }

    // gap detection (util/util.py:249-297) over the daily orders calendar.
    register("q13_gap_detection",
      """WITH days AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT STRFTIME(prev_d, '%Y-%m-%d') AS gap_start,
        |  STRFTIME(d, '%Y-%m-%d') AS gap_end, gap_seconds
        |FROM (SELECT d, LAG(d) OVER (ORDER BY d) AS prev_d,
        |        CAST(EPOCH(CAST(d AS TIMESTAMP)) AS BIGINT)
        |          - CAST(EPOCH(CAST(LAG(d) OVER (ORDER BY d) AS TIMESTAMP)) AS BIGINT)
        |          AS gap_seconds
        |      FROM days)
        |WHERE prev_d IS NOT NULL AND gap_seconds <> 86400
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val days = table(s, dir, "orders")
        .select(col("o_orderdate").cast("date").as("d")).distinct()
      TimeSeries.gaps(days, "d", 86400L)
        .select(date_format(col("gap_start"), "yyyy-MM-dd").as("gap_start"),
          date_format(col("gap_end"), "yyyy-MM-dd").as("gap_end"),
          col("gap_seconds"))
        .orderBy(col("gap_start"))
    }

    // drop_incomplete_days (util/util.py:300-352) on the hour-truncated
    // events series (shift=6: day runs 06:00..05:00).
    register("q14_drop_incomplete_days",
      """WITH hrs AS (SELECT DISTINCT DATE_TRUNC('hour', ts) AS h FROM events),
        |bounds AS (SELECT
        |    MIN(CASE WHEN EXTRACT(hour FROM h) = 6 THEN h END) AS first_ok,
        |    MAX(CASE WHEN EXTRACT(hour FROM h) = 5 THEN h END) AS last_ok
        |  FROM hrs)
        |SELECT COUNT(*) AS n_rows,
        |  STRFTIME(MIN(h), '%Y-%m-%d %H:%M:%S') AS first_ts,
        |  STRFTIME(MAX(h), '%Y-%m-%d %H:%M:%S') AS last_ts
        |FROM hrs, bounds WHERE h >= first_ok AND h <= last_ok""".stripMargin) {
      (s, dir) =>
      val hrs = table(s, dir, "events")
        .select(date_trunc("hour", col("ts")).as("h")).distinct()
      TimeSeries.dropIncompleteDays(hrs, "h", shift = 6)
        .agg(count(lit(1)).as("n_rows"),
          date_format(min(col("h")), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
          date_format(max(col("h")), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
    }

    // shift(±1) prev/next-day values with edge self-fill
    // (temperature.py:115-122).
    register("q15_shift_prev_next",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, MIN(value) AS vmin, MAX(value) AS vmax
        |  FROM events GROUP BY 1)
        |SELECT STRFTIME(d, '%Y-%m-%d') AS day,
        |  COALESCE(LAG(vmax) OVER (ORDER BY d), vmax) AS vmax_prev,
        |  COALESCE(LEAD(vmin) OVER (ORDER BY d), vmin) AS vmin_next
        |FROM daily ORDER BY 1""".stripMargin) { (s, dir) =>
      val daily = table(s, dir, "events")
        .groupBy(col("ts").cast("date").as("d"))
        .agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
      val w = Window.orderBy(col("d"))
      daily.select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        coalesce(lag(col("vmax"), 1).over(w), col("vmax")).as("vmax_prev"),
        coalesce(lead(col("vmin"), 1).over(w), col("vmin")).as("vmin_next"))
        .orderBy(col("day"))
    }

    // running cumulative sum (precipitation.py:293-303 accumulation trick).
    register("q16_cumsum",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS v_micro
        |  FROM events GROUP BY 1)
        |SELECT STRFTIME(d, '%Y-%m-%d') AS day,
        |  SUM(v_micro) OVER (ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 1e6
        |    AS running_sum
        |FROM daily ORDER BY 1""".stripMargin) { (s, dir) =>
      val daily = table(s, dir, "events")
        .groupBy(col("ts").cast("date").as("d"))
        .agg(sum(round(col("value") * 1e6).cast("long")).as("v_micro"))
      val w = Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        (sum(col("v_micro")).over(w) / 1e6).as("running_sum"))
        .orderBy(col("day"))
    }

    // pairwise (i-1,i) reduction (precipitation.py:441-447): adjacent days
    // paired, parent box = sum of the two children.
    register("q17_pairwise_reduction",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS v_micro
        |  FROM events GROUP BY 1),
        |numbered AS (
        |  SELECT d, v_micro,
        |    CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY d) - 1) / 2) AS BIGINT)
        |      AS pair_id
        |  FROM daily)
        |SELECT pair_id, SUM(v_micro) / 1e6 AS pair_sum, COUNT(*) AS n_children
        |FROM numbered GROUP BY pair_id ORDER BY pair_id""".stripMargin) {
      (s, dir) =>
      val daily = table(s, dir, "events")
        .groupBy(col("ts").cast("date").as("d"))
        .agg(sum(round(col("value") * 1e6).cast("long")).as("v_micro"))
      val w = Window.orderBy(col("d"))
      daily.withColumn("pair_id",
          floor((row_number().over(w) - 1) / 2).cast("long"))
        .groupBy(col("pair_id"))
        .agg((sum(col("v_micro")) / 1e6).as("pair_sum"),
          count(lit(1)).as("n_children"))
        .orderBy(col("pair_id"))
    }

    // seasonal_subset (precipitation.py:607-628).
    register("q18_seasonal_subset",
      """SELECT EXTRACT(month FROM l_shipdate) AS m, COUNT(*) AS n,
        |  SUM(CAST(ROUND(l_quantity * 1e6) AS BIGINT)) / 1e6 AS sum_qty
        |FROM lineitem
        |WHERE EXTRACT(month FROM l_shipdate) IN (12, 1, 2)
        |GROUP BY m ORDER BY m""".stripMargin) { (s, dir) =>
      TimeSeries.seasonalSubset(table(s, dir, "lineitem"), "l_shipdate",
          Seq(12, 1, 2))
        .groupBy(month(col("l_shipdate")).cast("long").as("m"))
        .agg(count(lit(1)).as("n"), sumMicros(col("l_quantity")).as("sum_qty"))
        .orderBy(col("m"))
    }

    // reindex-to-complete-calendar (station.py:86-90): missing days are
    // materialized as null rows.
    register("q19_reindex_complete",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS date,
        |    SUM(CAST(ROUND(value * 1e6) AS BIGINT)) / 1e6 AS v
        |  FROM events WHERE EXTRACT(day FROM ts) % 3 <> 0 GROUP BY 1),
        |cal AS (
        |  SELECT UNNEST(GENERATE_SERIES(MIN(date), MAX(date),
        |    INTERVAL 1 DAY)) AS date FROM daily)
        |SELECT STRFTIME(CAST(cal.date AS DATE), '%Y-%m-%d') AS day, daily.v AS v,
        |  CASE WHEN daily.v IS NULL THEN 1 ELSE 0 END AS is_missing
        |FROM cal LEFT JOIN daily ON CAST(cal.date AS DATE) = daily.date
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val daily = table(s, dir, "events")
        .where(dayofmonth(col("ts")) % 3 =!= 0)
        .groupBy(col("ts").cast("date").as("date"))
        .agg(sumMicros(col("value")).as("v"))
      TimeSeries.reindexDailyComplete(daily)
        .select(date_format(col("date"), "yyyy-MM-dd").as("day"), col("v"),
          when(col("v").isNull, 1).otherwise(0).as("is_missing"))
        .orderBy(col("day"))
    }

    // bounded linear interpolation over nulls (station.interpolate linear,
    // station.py:403-437): the oracle restates interpolateLinear's window
    // algebra with IGNORE NULLS frames — prev/next non-null value, stamp
    // and row number, time-weighted blend, forward limit 24.
    register("q20_interpolate_linear",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    SUM(CAST(ROUND(value * 1e6) AS BIGINT)) / COUNT(value) / 1e6 AS v0
        |  FROM events GROUP BY 1),
        |masked AS (
        |  SELECT d, CASE WHEN EXTRACT(day FROM d) % 4 = 0 THEN NULL ELSE v0
        |    END AS v,
        |    ROW_NUMBER() OVER (ORDER BY d) AS rn
        |  FROM daily),
        |w AS (
        |  SELECT d, v, rn,
        |    LAST_VALUE(v IGNORE NULLS) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        |    LAST_VALUE(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
        |      OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
        |    LAST_VALUE(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
        |      OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_rn,
        |    FIRST_VALUE(v IGNORE NULLS) OVER (ORDER BY d
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        |    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
        |      OVER (ORDER BY d
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
        |  FROM masked)
        |SELECT STRFTIME(d, '%Y-%m-%d') AS day,
        |  ROUND(CASE WHEN v IS NOT NULL THEN v
        |    WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
        |      AND rn - prev_rn <= 24
        |      THEN prev_v + (next_v - prev_v) *
        |        ((EPOCH(CAST(d AS TIMESTAMP)) - EPOCH(CAST(prev_t AS TIMESTAMP)))
        |         / (EPOCH(CAST(next_t AS TIMESTAMP))
        |            - EPOCH(CAST(prev_t AS TIMESTAMP))))
        |    WHEN prev_v IS NOT NULL AND next_v IS NULL AND rn - prev_rn <= 24
        |      THEN prev_v END, 6) AS v
        |FROM w ORDER BY 1""".stripMargin) { (s, dir) =>
      val daily = table(s, dir, "events")
        .groupBy(col("ts").cast("date").as("d"))
        .agg(avgMicros(col("value")).as("v"))
        .withColumn("v", when(dayofmonth(col("d")) % 4 === 0, lit(null)
          .cast("double")).otherwise(col("v")))
      TimeSeries.interpolateLinear(daily, "d", "v", limit = 24)
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          round(col("v"), 6).as("v"))
        .orderBy(col("day"))
    }

    // nearest-knot interpolation (pandas method='nearest', scipy
    // kind='nearest' with its round-down tie): same masked series as q20.
    register("q21_interpolate_nearest",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    SUM(CAST(ROUND(value * 1e6) AS BIGINT)) / COUNT(value) / 1e6 AS v0
        |  FROM events GROUP BY 1),
        |masked AS (
        |  SELECT d, CASE WHEN EXTRACT(day FROM d) % 4 = 0 THEN NULL ELSE v0
        |    END AS v,
        |    ROW_NUMBER() OVER (ORDER BY d) AS rn
        |  FROM daily),
        |w AS (
        |  SELECT d, v, rn,
        |    LAST_VALUE(v IGNORE NULLS) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        |    LAST_VALUE(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
        |      OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
        |    LAST_VALUE(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
        |      OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_rn,
        |    FIRST_VALUE(v IGNORE NULLS) OVER (ORDER BY d
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        |    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
        |      OVER (ORDER BY d
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
        |  FROM masked)
        |SELECT STRFTIME(d, '%Y-%m-%d') AS day,
        |  ROUND(CASE WHEN v IS NOT NULL THEN v
        |    WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
        |      AND rn - prev_rn <= 24
        |      THEN CASE WHEN EPOCH(CAST(d AS TIMESTAMP))
        |          - EPOCH(CAST(prev_t AS TIMESTAMP))
        |          <= EPOCH(CAST(next_t AS TIMESTAMP))
        |          - EPOCH(CAST(d AS TIMESTAMP))
        |        THEN prev_v ELSE next_v END
        |    END, 6) AS v
        |FROM w ORDER BY 1""".stripMargin) { (s, dir) =>
      val daily = table(s, dir, "events")
        .groupBy(col("ts").cast("date").as("d"))
        .agg(avgMicros(col("value")).as("v"))
        .withColumn("v", when(dayofmonth(col("d")) % 4 === 0, lit(null)
          .cast("double")).otherwise(col("v")))
      TimeSeries.interpolateNearest(daily, "d", "v", limit = 24)
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          round(col("v"), 6).as("v"))
        .orderBy(col("day"))
    }

    // Backward as-of join (SQL ASOF JOIN / pandas merge_asof): align
    // each click with the most recent error reading. The Spark side
    // is the union + running-last window, not a range join — the
    // oracle uses DuckDB's native ASOF.
    register("q22_asof_join",
      """WITH l AS (SELECT event_id, ts FROM events
        |           WHERE event_type = 'click'),
        |r AS (SELECT ts, value AS last_err FROM events
        |      WHERE event_type = 'error')
        |SELECT l.event_id, EPOCH_US(l.ts) AS ts_us, r.last_err
        |FROM l ASOF LEFT JOIN r ON l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin) { (s, dir) =>
      val ev = table(s, dir, "events")
      val l = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("ts"))
      val r = ev.where(col("event_type") === "error")
        .select(col("ts"), col("value").as("last_err"))
      TimeSeries.asofJoinBackward(l, r, "ts", Seq("last_err"))
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("last_err"))
        .orderBy(col("event_id"))
    }

    // Forward as-of: each click joined to the NEXT error reading.
    // DuckDB's ASOF accepts any inequality; l.ts <= r.ts is forward.
    register("q24_asof_forward",
      """WITH l AS (SELECT event_id, ts FROM events
        |           WHERE event_type = 'click'),
        |r AS (SELECT ts, value AS next_err FROM events
        |      WHERE event_type = 'error')
        |SELECT l.event_id, EPOCH_US(l.ts) AS ts_us, r.next_err
        |FROM l ASOF LEFT JOIN r ON l.ts <= r.ts
        |ORDER BY l.event_id""".stripMargin) { (s, dir) =>
      val ev = table(s, dir, "events")
      val l = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("ts"))
      val r = ev.where(col("event_type") === "error")
        .select(col("ts"), col("value").as("next_err"))
      TimeSeries.asofJoin(l, r, "ts", Seq("next_err"), "forward")
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("next_err"))
        .orderBy(col("event_id"))
    }

    // Nearest as-of (ties backward): oracle composes DuckDB's
    // backward and forward ASOF and picks the closer timestamp.
    register("q25_asof_nearest",
      """WITH l AS (SELECT event_id, ts FROM events
        |           WHERE event_type = 'click'),
        |r AS (SELECT ts, value FROM events
        |      WHERE event_type = 'error'),
        |b AS (SELECT l.event_id, l.ts, r.ts AS bts, r.value AS bv
        |      FROM l ASOF LEFT JOIN r ON l.ts >= r.ts),
        |f AS (SELECT l.event_id, r.ts AS fts, r.value AS fv
        |      FROM l ASOF LEFT JOIN r ON l.ts <= r.ts)
        |SELECT b.event_id, EPOCH_US(b.ts) AS ts_us,
        |  CASE WHEN b.bts IS NOT NULL AND (f.fts IS NULL OR
        |      EPOCH_US(b.ts) - EPOCH_US(b.bts)
        |        <= EPOCH_US(f.fts) - EPOCH_US(b.ts))
        |    THEN b.bv ELSE f.fv END AS near_err
        |FROM b JOIN f ON b.event_id = f.event_id
        |ORDER BY b.event_id""".stripMargin) { (s, dir) =>
      val ev = table(s, dir, "events")
      val l = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("ts"))
      val r = ev.where(col("event_type") === "error")
        .select(col("ts"), col("value").as("near_err"))
      TimeSeries.asofJoin(l, r, "ts", Seq("near_err"), "nearest")
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("near_err"))
        .orderBy(col("event_id"))
    }

    // Trailing 1h window per event type (pandas rolling('1h')):
    // RANGE-frame window, integer-micro values for exact sums.
    register("q26_rolling_1h",
      """WITH e AS (SELECT event_id, event_type, ts,
        |    CAST(ROUND(value * 1e6) AS BIGINT) AS value_u FROM events)
        |SELECT event_id,
        |  CAST(COUNT(value_u) OVER w AS BIGINT) AS n_1h,
        |  CAST(SUM(value_u) OVER w AS BIGINT) AS sum_u_1h,
        |  CAST(MIN(value_u) OVER w AS BIGINT) AS min_u_1h,
        |  CAST(MAX(value_u) OVER w AS BIGINT) AS max_u_1h
        |FROM e
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts
        |  RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ev = table(s, dir, "events")
        .withColumn("value_u", round(col("value") * 1e6).cast("long"))
      graft.agg.Aggregations.rollingTimeAgg(ev, "ts", "value_u",
          windowSeconds = 3600L, partitionCols = Seq("event_type"))
        .select(col("event_id"), col("roll_count").as("n_1h"),
          col("roll_sum").as("sum_u_1h"),
          col("roll_min").as("min_u_1h"),
          col("roll_max").as("max_u_1h"))
        .orderBy(col("event_id"))
    }

    // Gap-based sessionization: 30-min inactivity splits sessions
    // per event type (timestamps are unique per type, so the lag
    // order is well-defined).
    register("q27_sessionize",
      """WITH g AS (SELECT event_id, event_type, ts,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |        OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts))
        |SELECT event_id,
        |  CAST(SUM(is_new) OVER (PARTITION BY event_type ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
        |    AS BIGINT) AS session_id
        |FROM g ORDER BY event_id""".stripMargin) { (s, dir) =>
      TimeSeries.sessionize(table(s, dir, "events"), "ts",
          Seq("event_type"), gapSeconds = 1800L)
        .select(col("event_id"), col("session_id"))
        .orderBy(col("event_id"))
    }

    // Session-level rollup: one row per (event_type, session) with
    // size and duration — the aggregation consumers actually read.
    register("q28_session_stats",
      """WITH g AS (SELECT event_type, ts,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |        OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts)),
        |s AS (SELECT event_type, ts,
        |    SUM(is_new) OVER (PARTITION BY event_type ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
        |      AS session_id
        |  FROM g)
        |SELECT event_type, CAST(session_id AS BIGINT) AS session_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  EPOCH_US(MIN(ts)) AS start_us,
        |  EPOCH_US(MAX(ts)) AS end_us,
        |  EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts)) AS duration_us
        |FROM s GROUP BY event_type, session_id
        |ORDER BY event_type, session_id""".stripMargin) { (s, dir) =>
      TimeSeries.sessionize(table(s, dir, "events"), "ts",
          Seq("event_type"), gapSeconds = 1800L)
        .groupBy(col("event_type"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          unix_micros(min(col("ts"))).as("start_us"),
          unix_micros(max(col("ts"))).as("end_us"),
          (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
            .as("duration_us"))
        .orderBy(col("event_type"), col("session_id"))
    }

    // EWMA per event type — a sequential recurrence verified by a
    // recursive-CTE oracle walking the same per-key row order. The
    // recurrence multiplier is written `(1 - 0.3)` in BOTH engines so
    // the IEEE value matches bit-exact ((1 - 0.3) != literal 0.7 in
    // binary); the states quantize to integer micros for the hash.
    // The source CTE is MATERIALIZED — inlined, DuckDB re-evaluates
    // the window per recursion step (15 s -> 2 s at sf0.01).
    register("q89_ewma",
      """WITH RECURSIVE s AS MATERIALIZED (
        |  SELECT event_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY ts, event_id) AS rk
        |  FROM events),
        |r AS (
        |  SELECT event_type, rk, event_id, value AS state
        |  FROM s WHERE rk = 1
        |  UNION ALL
        |  SELECT s.event_type, s.rk, s.event_id,
        |    CASE WHEN s.value IS NULL THEN r.state
        |         WHEN r.state IS NULL THEN s.value
        |         ELSE (1 - 0.3) * r.state + 0.3 * s.value END
        |  FROM r JOIN s ON s.event_type = r.event_type
        |    AND s.rk = r.rk + 1)
        |SELECT event_id, CAST(ROUND(state * 1e6) AS BIGINT)
        |  AS ewma_micro
        |FROM r ORDER BY event_id""".stripMargin) { (s, dir) =>
      // event_id tiebreak: rows sharing a ts within an event_type
      // must visit the recurrence in ONE total order in both engines
      TimeSeries.ewma(table(s, dir, "events"), "ts", "value",
          alpha = 0.3, partitionCols = Seq("event_type"),
          tieBreakCols = Seq("event_id"))
        .select(col("event_id"),
          round(col("ewma") * 1e6).cast("long").as("ewma_micro"))
        .orderBy(col("event_id"))
    }

    // Arbitrary-frequency resample (pandas resample('3H')): epoch-
    // aligned integer bucketing == TIME_BUCKET for steps dividing 24h.
    register("q23_resample_3h",
      """SELECT EPOCH_US(TIME_BUCKET(INTERVAL '3 hours', ts))
        |    AS bucket_us,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT)
        |    AS sum_u
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      graft.agg.Aggregations.resampleByDuration(
          table(s, dir, "events"), "ts", stepSeconds = 3 * 3600L,
          aggs = Seq(count(lit(1)).as("n"),
            sum(round(col("value") * 1e6).cast("long")).as("sum_u")))
        .select(unix_micros(col("bucket")).as("bucket_us"), col("n"),
          col("sum_u"))
        .orderBy(col("bucket_us"))
    }
  }
}
