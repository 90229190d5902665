package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-bucket aggregations and calibration statistics
  * (SURVEY.md §2.5; reference citations inline).
  *
  * Everything is a single `groupBy` with map-side partial aggregation —
  * the scalable shape: one shuffle on the (station, bucket) key, no
  * driver round-trips. Calibration outputs are tiny (≤ 576 rows) and are
  * meant to be broadcast-joined downstream.
  */
object Aggregations {

  /** melodist util.daily_from_hourly (util/util.py:374-414): variable-aware
    * hourly→daily aggregation. Emits only the columns whose inputs exist.
    * pandas `.sum()` skipna semantics: an all-NaN day sums to 0 —
    * mirrored with coalesce(sum, 0). */
  def dailyFromHourly(hourly: DataFrame, tsCol: String = "timestamp",
      partitionCols: Seq[String] = Nil): DataFrame = {
    val cols = hourly.columns.toSet
    val aggs = Seq.newBuilder[Column]
    if (cols("temp")) aggs ++= Seq(
      avg("temp").as("temp"), min("temp").as("tmin"), max("temp").as("tmax"))
    if (cols("precip"))
      aggs += coalesce(sum("precip"), lit(0.0)).as("precip")
    if (cols("glob")) aggs += avg("glob").as("glob")
    if (cols("hum")) aggs ++= Seq(avg("hum").as("hum"),
      min("hum").as("hum_min"), max("hum").as("hum_max"))
    if (cols("wind")) aggs += avg("wind").as("wind")
    if (cols("ssd"))
      aggs += (coalesce(sum("ssd"), lit(0.0)) / 60.0).as("ssd")
    val keys = partitionCols.map(col) :+ to_date(col(tsCol)).as("date")
    val built = aggs.result()
    hourly.groupBy(keys: _*).agg(built.head, built.tail: _*)
  }

  /** Resample to an arbitrary step (pandas `resample('3H')`-style,
    * generalizing the daily path): epoch-aligned buckets via integer
    * floor on microseconds — identical boundaries to SQL
    * `TIME_BUCKET` for any step dividing 24 h. One map-side-combined
    * groupBy; `partitionCols` keys the fleet axis. */
  def resampleByDuration(df: DataFrame, tsCol: String,
      stepSeconds: Long, aggs: Seq[Column],
      partitionCols: Seq[String] = Nil): DataFrame = {
    require(aggs.nonEmpty, "resample needs aggregates")
    val stepUs = stepSeconds * 1000000L
    val bucket = timestamp_micros(
      floor(unix_micros(col(tsCol)) / stepUs).cast("long") * stepUs)
    val keys = partitionCols.map(col) :+ bucket.as("bucket")
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Trailing time-window aggregates (pandas `rolling('1h')` with
    * closed='both'): for every row, count/sum/mean/min/max of
    * `valueCol` over [ts − windowSeconds, ts]. A RANGE-frame window on
    * the microsecond epoch — no self-join, no time-band explosion; one
    * shuffle on `partitionCols` (REQUIRED at fleet scale — an empty
    * partitioning funnels the corpus through one task's sort).
    * Equal-timestamp peers are all in-frame regardless of sort order,
    * so results are deterministic under retries/AQE. */
  def rollingTimeAgg(df: DataFrame, tsCol: String, valueCol: String,
      windowSeconds: Long, partitionCols: Seq[String] = Nil)
      : DataFrame = {
    if (partitionCols.isEmpty)
      graft.core.ScaleGuard.unpartitionedWindow(df,
        "Aggregations.rollingTimeAgg")
    val w = (if (partitionCols.isEmpty)
        Window.orderBy(unix_micros(col(tsCol)))
      else Window.partitionBy(partitionCols.map(col): _*)
        .orderBy(unix_micros(col(tsCol))))
      .rangeBetween(-windowSeconds * 1000000L, 0)
    val v = col(valueCol)
    // one select, one Window node: per-withColumn construction would
    // leave N window operators (each re-projects the order key, which
    // defeats CollapseWindow) and sort the partition N times
    df.select(col("*"),
      count(v).over(w).as("roll_count"),
      sum(v).over(w).as("roll_sum"),
      avg(v).over(w).as("roll_mean"),
      min(v).over(w).as("roll_min"),
      max(v).over(w).as("roll_max"))
  }

  /** calculate_mean_daily_course_by_month (util/util.py:417-430):
    * (month, hour) mean of `valueCol`, optionally min-max normalized
    * within each month. Long form (288 rows) — broadcast-join it. */
  def meanDailyCourseByMonth(hourly: DataFrame, valueCol: String,
      tsCol: String = "timestamp", normalize: Boolean = false,
      partitionCols: Seq[String] = Nil): DataFrame = {
    val keys = partitionCols.map(col) ++
      Seq(month(col(tsCol)).as("month"), hour(col(tsCol)).as("hour"))
    val course = hourly.groupBy(keys: _*)
      .agg(avg(col(valueCol)).as(valueCol))
    if (!normalize) course
    else {
      val w = Window.partitionBy((partitionCols :+ "month").map(col): _*)
      course
        .withColumn(valueCol,
          (col(valueCol) - min(col(valueCol)).over(w)) /
            (max(col(valueCol)).over(w) - min(col(valueCol)).over(w)))
    }
  }

  /** calculate_month_hour_precip_mean (humidity.py:133-141): mean humidity
    * keyed by (month, hour, wet-day). 576-row broadcast table. */
  def monthHourPrecipMean(hourly: DataFrame, tsCol: String = "timestamp",
      humCol: String = "hum", precipCol: String = "precip",
      partitionCols: Seq[String] = Nil): DataFrame = {
    val dayKeys = partitionCols.map(col) :+ to_date(col(tsCol)).as("date")
    val wetDays = hourly.groupBy(dayKeys: _*)
      .agg((coalesce(sum(col(precipCol)), lit(0.0)) > 0).as("wet"))
    val joined = hourly
      .withColumn("date", to_date(col(tsCol)))
      .join(wetDays, partitionCols :+ "date")
    val keys = partitionCols.map(col) ++ Seq(month(col(tsCol)).as("month"),
      hour(col(tsCol)).as("hour"), col("wet"))
    joined.groupBy(keys: _*).agg(avg(col(humCol)).as("mean_hum"))
  }

  /** Hour-of-daily-maximum (temperature.py:280-282 idxmax). pandas idxmax
    * returns the FIRST max occurrence, so ties break to the earliest hour:
    * min(struct(-value, hour)) is deterministic where max_by is not. */
  def hourOfDailyMax(hourly: DataFrame, valueCol: String,
      tsCol: String = "timestamp", partitionCols: Seq[String] = Nil)
      : DataFrame = {
    val keys = partitionCols.map(col) :+ to_date(col(tsCol)).as("date")
    // cast to double before negating: ANSI mode throws on
    // negate(IntegerType.MinValue); doubles negate safely
    hourly.where(col(valueCol).isNotNull)
      .groupBy(keys: _*)
      .agg(min(struct(negate(col(valueCol).cast("double")).as("nv"),
        hour(col(tsCol)).as("h"))).getField("h").as("hour_of_max"))
  }

  /** [[linregress]] per group, fully distributed: the same closed-form
    * moments computed by one grouped aggregation — no collect at all.
    * Returns (groupCols..., a1, a0, r), one row per group. */
  def linregressByGroup(df: DataFrame, xCol: String, yCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val x = col(xCol); val y = col(yCol)
    val a1 = col("cxy") / col("vx")
    df.where(x.isNotNull && y.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(avg(x).as("mx"), avg(y).as("my"),
        covar_pop(x, y).as("cxy"), var_pop(x).as("vx"),
        var_pop(y).as("vy"))
      .select(groupCols.map(col) :+ a1.as("a1") :+
        (col("my") - a1 * col("mx")).as("a0") :+
        (col("cxy") / sqrt(col("vx") * col("vy"))).as("r"): _*)
  }

  /** Exact closed-form simple linear regression y = a1*x + a0 from one
    * aggregate pass (replaces scipy.stats.linregress in
    * util/util.py:137-157). Returns (a1, a0, r). Null pairs dropped. */
  def linregress(df: DataFrame, xCol: String, yCol: String)
      : (Double, Double, Double) = {
    val row = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .agg(
        count(lit(1)).as("n"),
        avg(col(xCol)).as("mx"), avg(col(yCol)).as("my"),
        covar_pop(col(xCol), col(yCol)).as("cxy"),
        var_pop(col(xCol)).as("vx"), var_pop(col(yCol)).as("vy"))
      .collect()(0)
    val cxy = row.getAs[Double]("cxy")
    val vx = row.getAs[Double]("vx")
    val vy = row.getAs[Double]("vy")
    val a1 = cxy / vx
    val a0 = row.getAs[Double]("my") - a1 * row.getAs[Double]("mx")
    val r = cxy / math.sqrt(vx * vy)
    (a1, a0, r)
  }

  /** Monthly percentile of wet-step precipitation intensities
    * (precipitation.py:469-472 np.percentile, linear interpolation —
    * matches Spark's `percentile` exactly). */
  def wetPercentile(df: DataFrame, precipCol: String, p: Double): Double =
    df.where(col(precipCol) > 0)
      .agg(percentile(col(precipCol), lit(p / 100.0)).as("p"))
      .collect()(0).getAs[Double]("p")
}
