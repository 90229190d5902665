package graft.queries

import graft.QueryRegistry.{register, registerRowsOnly}
import graft.core.Tables.table
import graft.cascade.{Cascade, CascadeStatistics}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cascade operator gate queries (SURVEY.md §2.5/§2.8 cascade rows):
  * the deterministic aggregation/classification core oracle-checked in
  * DuckDB (fixed threshold; the percentile path is golden-tested), the
  * stochastic disaggregation rows-only + invariant-tested. */
object CascadeQueriesImpl {

  def init(): Unit = {

    register("q49_cascade_agg_level1",
      """WITH src AS (
        |  SELECT DATE_TRUNC('hour', ts) AS h,
        |    SUM(CAST(ROUND(CASE WHEN event_type = 'error' THEN value
        |      ELSE 0.0 END * 1e6) AS BIGINT)) / 1e6 AS p
        |  FROM events GROUP BY 1),
        |seq AS (SELECT p, ROW_NUMBER() OVER (ORDER BY h) - 1 AS rn FROM src),
        |paired AS (
        |  SELECT CAST(FLOOR(rn / 2) AS BIGINT) AS pair,
        |    SUM(p) AS v,
        |    MAX(CASE WHEN rn % 2 = 0 THEN p END) AS r1,
        |    MAX(CASE WHEN rn % 2 = 1 THEN p END) AS r2
        |  FROM seq GROUP BY 1 HAVING COUNT(*) = 2),
        |cls AS (
        |  SELECT v, r1, r2,
        |    CASE WHEN v > 5.0 THEN 1 ELSE 0 END AS ba,
        |    CASE
        |      WHEN NOT (v > 0) THEN 0
        |      WHEN NOT COALESCE(LAG(v > 0) OVER (ORDER BY pair), FALSE)
        |        AND COALESCE(LEAD(v > 0) OVER (ORDER BY pair), FALSE) THEN 1
        |      WHEN COALESCE(LAG(v > 0) OVER (ORDER BY pair), FALSE)
        |        AND COALESCE(LEAD(v > 0) OVER (ORDER BY pair), FALSE) THEN 2
        |      WHEN COALESCE(LAG(v > 0) OVER (ORDER BY pair), FALSE)
        |        AND NOT COALESCE(LEAD(v > 0) OVER (ORDER BY pair), FALSE)
        |        THEN 3
        |      ELSE 4 END AS bt
        |  FROM paired)
        |SELECT ba, bt, COUNT(*) AS nb,
        |  CAST(SUM(CASE WHEN r1 <= 0 AND r2 > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n01,
        |  CAST(SUM(CASE WHEN r1 > 0 AND r2 <= 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n10,
        |  CAST(SUM(CASE WHEN r1 > 0 AND r2 > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS nxx
        |FROM cls WHERE v > 0 GROUP BY ba, bt ORDER BY ba, bt""".stripMargin) {
      (s, dir) =>
      val src = table(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg((sum(round(when(col("event_type") === "error", col("value"))
          .otherwise(0.0) * 1e6).cast("long")) / 1e6).as("p"))
      val w = Window.orderBy(col("h"))
      val seq0 = src.withColumn("rn",
        row_number().over(w).cast("long") - 1)
      val paired = seq0
        .withColumn("pair", (col("rn") / 2).cast("long"))
        .groupBy(col("pair"))
        .agg(count(lit(1)).as("nchild"), sum(col("p")).as("v"),
          max(when(col("rn") % 2 === 0, col("p"))).as("r1"),
          max(when(col("rn") % 2 === 1, col("p"))).as("r2"))
        .where(col("nchild") === 2)
      val wp = Window.orderBy(col("pair"))
      val wet = col("v") > 0
      val pw = coalesce(lag(wet, 1).over(wp), lit(false))
      val nw = coalesce(lead(wet, 1).over(wp), lit(false))
      paired
        .withColumn("ba", when(col("v") > 5.0, 1).otherwise(0))
        .withColumn("bt",
          when(!wet, 0).when(!pw && nw, 1).when(pw && nw, 2)
            .when(pw && !nw, 3).otherwise(4))
        .where(col("v") > 0)
        .groupBy(col("ba"), col("bt"))
        .agg(count(lit(1)).as("nb"),
          sum(when(col("r1") <= 0 && col("r2") > 0, 1).otherwise(0))
            .as("n01"),
          sum(when(col("r1") > 0 && col("r2") <= 0, 1).otherwise(0))
            .as("n10"),
          sum(when(col("r1") > 0 && col("r2") > 0, 1).otherwise(0))
            .as("nxx"))
        .orderBy(col("ba"), col("bt"))
    }

    registerRowsOnly("q50_precip_cascade") { (s, dir) =>
      val daily = table(s, dir, "events")
        .groupBy(col("ts").cast("date").as("date"))
        .agg((sum(round(when(col("event_type") === "error", col("value"))
          .otherwise(0.0) * 1e6).cast("long")) / 1e6).as("precip"))
      Cascade.disaggregate(daily, Left(CascadeStatistics.sampleData()),
          hourly = true, seed = 42L)
        .select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss")
          .as("ts_str"), round(col("precip"), 6).as("precip"))
        .orderBy(col("ts_str"))
    }

    registerRowsOnly("q51_precip_cascade_5min") { (s, dir) =>
      val daily = table(s, dir, "events")
        .groupBy(col("ts").cast("date").as("date"))
        .agg((sum(round(when(col("event_type") === "purchase", col("value"))
          .otherwise(0.0) * 1e6).cast("long")) / 1e6).as("precip"))
        .limit(10)
      Cascade.disaggregate(daily, Left(stats9), hourly = false, level = 9,
          seed = 42L)
        .select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss")
          .as("ts_str"), round(col("precip"), 6).as("precip"))
        .orderBy(col("ts_str"))
    }

    // The stochastic cascade, hash-proven: q50's exact pipeline through
    // the REAL disaggregate engine (same level chain, box
    // classification, broadcast stats lookup, branching, quarter->hour
    // regroup, timestamp mapping) with the ONE pluggable piece — the
    // uniform draw — swapped from xxhash64 to md5, which DuckDB can
    // recompute. The oracle unrolls all 5 levels as chained CTEs with
    // the sample statistics interpolated as literals (Double.toString
    // round-trips, so both engines compare the identical doubles
    // against the identical draws) and replays every branching decision
    // bit-exactly. q50 stays rows-only as the xxhash production twin.
    register("q97_precip_cascade_md5", cascadeMd5OracleSql()) { (s, dir) =>
      val daily = table(s, dir, "events")
        .groupBy(col("ts").cast("date").as("date"))
        .agg((sum(round(when(col("event_type") === "error", col("value"))
          .otherwise(0.0) * 1e6).cast("long")) / 1e6).as("precip"))
      Cascade.disaggregate(daily, Left(CascadeStatistics.sampleData()),
          hourly = true, seed = 42L, draw = md5Draw)
        .select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss")
          .as("ts_str"), round(col("precip"), 6).as("precip"))
        .orderBy(col("ts_str"))
    }

    // q51's 9-level 5-minute twin under the same md5 draw: 2^9 boxes
    // per day, sub-level timestamps bucketed to 288 five-minute slots
    // — the deepest branch of the engine hash-proven too. (The day
    // subset is ORDER BY date LIMIT 10 in both engines; q51's bare
    // limit(10) is selection-order-dependent, fine for rows-only but
    // not for a hash gate.)
    register("q98_precip_cascade_5min_md5",
      cascadeMd5OracleSql(stats9, nLevels = 9, eventType = "purchase",
        limitDays = 10)) { (s, dir) =>
      val daily = table(s, dir, "events")
        .groupBy(col("ts").cast("date").as("date"))
        .agg((sum(round(when(col("event_type") === "purchase",
          col("value")).otherwise(0.0) * 1e6).cast("long")) / 1e6)
          .as("precip"))
        .orderBy(col("date")).limit(10)
      Cascade.disaggregate(daily, Left(stats9), hourly = false,
          level = 9, seed = 42L, draw = md5Draw)
        .select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss")
          .as("ts_str"), round(col("precip"), 6).as("precip"))
        .orderBy(col("ts_str"))
    }
  }

  /** The 9-level statistics used by BOTH q51/q98's engine side and
    * q98's oracle literals — one definition so the engine and the
    * oracle can never drift element-by-element. */
  private val stats9 = CascadeStatistics.sampleData().copy(
    threshold = Array(0.05, 0.08, 0.12, 0.2, 0.35, 0.6, 1.0, 1.7, 2.8))

  private def md5Draw(seed: Long, cols: Seq[org.apache.spark.sql.Column])
      : org.apache.spark.sql.Column = OracleDraw.md5Draw(seed, cols)

  /** Generates the unrolled `nLevels`-deep cascade oracle with the
    * given statistics baked in as literals. `dailySql` must yield
    * (date, precip); the tail maps the deepest level's boxes to
    * timestamps. */
  private def cascadeMd5OracleSql(st: CascadeStatistics =
      CascadeStatistics.sampleData(), nLevels: Int = 5,
      eventType: String = "error", limitDays: Int = 0): String = {
    val cum = st.wxxCum
    val ctr = CascadeStatistics.wClassCenters
    def d(x: Double) = x.toString
    val statRows = (for (b <- 0 to 1; t <- 1 to 4) yield
      s"($b, $t, ${d(st.p01(b)(t - 1))}, ${d(st.p10(b)(t - 1))}, " +
        (0 until 7).map(k => d(cum(k)(b)(t - 1))).mkString(", ") + ")")
      .mkString(",\n      ")
    def hex8(m: String) = OracleDraw.hex8(m)
    val w1Case = "COALESCE(CASE " +
      (1 to 7).map(k => s"WHEN y.rndw <= s.c$k THEN ${d(ctr(k - 1))}")
        .mkString(" ") + s" END, ${d(ctr(6))})"
    val levels = (1 to nLevels).map { l =>
      val meanvol = d(st.threshold(nLevels - l))
      val sp = 42L * 31 + l
      val sw = 42L * 31 + l + 7919
      s"""w$l AS (
         |  SELECT idx, v, v > 0.0 AS wet,
         |    COALESCE(LAG(v > 0.0) OVER (ORDER BY idx), FALSE) AS pw,
         |    COALESCE(LEAD(v > 0.0) OVER (ORDER BY idx), FALSE) AS nw,
         |    MD5(CONCAT('$sp', '|', CAST(idx AS VARCHAR))) AS mp,
         |    MD5(CONCAT('$sw', '|', CAST(idx AS VARCHAR))) AS mw
         |  FROM l${l - 1}),
         |y$l AS (
         |  SELECT idx, v, wet,
         |    CASE WHEN NOT wet THEN 0 WHEN NOT pw AND nw THEN 1
         |         WHEN pw AND nw THEN 2 WHEN pw AND NOT nw THEN 3
         |         ELSE 4 END AS bt,
         |    CASE WHEN v > $meanvol THEN 1 ELSE 0 END AS ba,
         |    ((${hex8("mp")}) + 1.0) / 4294967298.0 AS rndp,
         |    ((${hex8("mw")}) + 1.0) / 4294967298.0 AS rndw
         |  FROM w$l),
         |z$l AS (
         |  SELECT y.idx, y.v, y.wet, y.rndp, s.p01, s.p10,
         |    $w1Case AS w1
         |  FROM y$l y LEFT JOIN stats s ON s.ba = y.ba AND s.bt = y.bt),
         |l$l AS (
         |  SELECT z.idx * 2 + c.pos AS idx,
         |    CASE WHEN NOT z.wet THEN 0.0
         |         WHEN z.rndp <= z.p01 THEN
         |           (CASE WHEN c.pos = 0 THEN 0.0 ELSE z.v END)
         |         WHEN z.rndp <= z.p01 + z.p10 THEN
         |           (CASE WHEN c.pos = 0 THEN z.v ELSE 0.0 END)
         |         ELSE (CASE WHEN c.pos = 0 THEN z.w1 * z.v
         |               ELSE (1.0 - z.w1) * z.v END)
         |    END AS v
         |  FROM z$l z CROSS JOIN (SELECT 0 AS pos UNION ALL SELECT 1) c)"""
        .stripMargin
    }.mkString(",\n")
    // hourly tail: 32 boxes/day -> x3 quarters -> hours (quarter // 4);
    // 5-min tail: 2^nLevels boxes/day at 42187500*2^(11-nLevels) us ->
    // 288 five-minute buckets/day (matching disaggregateImpl exactly)
    val tail = if (nLevels == 5)
      s"""q AS (
         |  SELECT idx * 3 + j.p AS q, v / 3.0 AS v
         |  FROM l5 CROSS JOIN (SELECT 0 AS p UNION ALL SELECT 1
         |    UNION ALL SELECT 2) j),
         |h AS (SELECT q // 4 AS hpos, SUM(v) AS precip_c FROM q GROUP BY 1)
         |SELECT STRFTIME(CAST(dm.date AS TIMESTAMP)
         |    + TO_HOURS(CAST(h.hpos % 24 AS BIGINT)),
         |    '%Y-%m-%d %H:%M:%S') AS ts_str,
         |  ROUND(CASE WHEN dm.missing THEN NULL ELSE h.precip_c END, 6)
         |    AS precip
         |FROM h JOIN base dm ON h.hpos // 24 = dm.idx
         |ORDER BY ts_str""".stripMargin
    else {
      val stepMicros = 42187500L * (1L << (11 - nLevels))
      val perDay = 86400L * 1000000L / stepMicros
      s"""h AS (
         |  SELECT (idx // $perDay) * 288
         |      + (idx % $perDay) * $stepMicros // 300000000 AS hpos,
         |    SUM(v) AS precip_c
         |  FROM l$nLevels GROUP BY 1)
         |SELECT STRFTIME(CAST(dm.date AS TIMESTAMP)
         |    + TO_SECONDS(CAST((h.hpos % 288) * 300 AS BIGINT)),
         |    '%Y-%m-%d %H:%M:%S') AS ts_str,
         |  ROUND(CASE WHEN dm.missing THEN NULL ELSE h.precip_c END, 6)
         |    AS precip
         |FROM h JOIN base dm ON h.hpos // 288 = dm.idx
         |ORDER BY ts_str""".stripMargin
    }
    val dailyCore =
      s"""SELECT CAST(ts AS DATE) AS date,
         |    SUM(CAST(ROUND(CASE WHEN event_type = '$eventType' THEN value
         |      ELSE 0.0 END * 1e6) AS BIGINT)) / 1e6 AS precip
         |  FROM events GROUP BY 1""".stripMargin
    val dailySql = if (limitDays > 0)
      s"SELECT * FROM ($dailyCore) ORDER BY date LIMIT $limitDays"
    else dailyCore
    s"""WITH daily AS (
       |  $dailySql),
       |base AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY date) - 1 AS idx,
       |    date, precip IS NULL AS missing, COALESCE(precip, 0.0) AS v
       |  FROM daily),
       |stats(ba, bt, p01, p10, c1, c2, c3, c4, c5, c6, c7) AS (
       |  VALUES
       |      $statRows),
       |l0 AS (SELECT idx, v FROM base),
       |$levels,
       |$tail""".stripMargin
  }
}
