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
      val stats9 = CascadeStatistics.sampleData().copy(
        threshold = Array(0.05, 0.08, 0.12, 0.2, 0.35, 0.6, 1.0, 1.7, 2.8))
      Cascade.disaggregate(daily, Left(stats9), hourly = false, level = 9,
          seed = 42L)
        .select(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss")
          .as("ts_str"), round(col("precip"), 6).as("precip"))
        .orderBy(col("ts_str"))
    }
  }
}
