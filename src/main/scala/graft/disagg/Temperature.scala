package graft.disagg

import graft.core.TimeSeries
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temperature disaggregation — all method/min_max_time flags of the
  * reference (melodist/temperature.py:28-264), Spark-first:
  * daily prep = date joins + windows, hourly expansion = sequence/explode
  * join, curves = codegen'd when-chains. One narrow shuffle per daily
  * window; partition by station for scale (pass partitionCols).
  *
  * Methods: sine_min_max ('sine' is an alias), sine_mean,
  * mean_course_min_max, mean_course_mean.
  * min_max_time: fix (7h/14h), sun_loc (round(sunrise), round(sunnoon)+2),
  * sun_loc_shift (round(sunnoon + monthly max_delta), fallback +2 when
  * min_loc > max_loc).
  * Polar days (daylength < 3 h) get the reference's flat/NaN-interpolated
  * overlay (temperature.py:178-240).
  *
  * Rounding note: pandas Series.round is half-to-even => `bround`.
  */
object Temperature {

  val HoursPerDay = 24
  val DefaultShiftHours = 2
  val DaylengthThreshold = 3.0
  val MinLocPolar = 6
  val MaxLocPolar = 18

  /** monthly param lookup as a when-chain over month(date) */
  private def monthly(m: Map[Int, Double], monthCol: Column): Column =
    m.foldLeft(lit(Double.NaN)) { case (acc, (mo, v)) =>
      when(monthCol === mo, v).otherwise(acc)
    }

  /** Daily prep frame (reference locdf, temperature.py:72-122):
    * min_loc/max_loc + prev/cur/next tmin/tmax with calendar-faithful
    * shifts (self-fill only on the literal first/last day).
    * `daily` needs: date, tmin, tmax (+ temp for sine_mean) and sunrise/
    * sunnoon/daylength columns when min_max_time != fix. */
  def locFrame(daily: DataFrame, minMaxTime: String,
      maxDelta: Map[Int, Double] = Map.empty,
      partitionCols: Seq[String] = Nil): DataFrame = {
    val locs = minMaxTime match {
      case "fix" =>
        daily.withColumn("min_loc", lit(7)).withColumn("max_loc", lit(14))
      case "sun_loc" =>
        daily.withColumn("min_loc", bround(col("sunrise")).cast("int"))
          .withColumn("max_loc",
            (bround(col("sunnoon")) + DefaultShiftHours).cast("int"))
      case "sun_loc_shift" =>
        val shifted =
          bround(col("sunnoon") + monthly(maxDelta, month(col("date"))))
        val base = daily
          .withColumn("min_loc", bround(col("sunrise")).cast("int"))
          .withColumn("max_loc", shifted.cast("int"))
        base.withColumn("max_loc",
          when(col("min_loc") > col("max_loc"),
            (bround(col("sunnoon")) + DefaultShiftHours).cast("int"))
            .otherwise(col("max_loc")))
      case other => throw new IllegalArgumentException(other)
    }
    // The daily frame is tiny relative to the hourly plan built on it
    // (≤ stations × days rows) but feeds FIVE consumers — the bounds
    // aggregate, both shift-join sides, and (downstream) the hourly
    // explode and the polar flags. Without a barrier Catalyst re-plans
    // the whole upstream daily aggregation per consumer; one lazy
    // localCheckpoint computes it once.
    val locsM = locs.localCheckpoint(false)
    // calendar-faithful prev/next day values (pandas shift(±1,'D')):
    // one join per direction — tmin and tmax ride the same side row
    def shiftJoin(offset: Int, minAs: String, maxAs: String)
        : DataFrame => DataFrame = { df =>
      val side = locsM.select((partitionCols.map(col) :+
        date_sub(col("date"), offset).as("date") :+
        col("tmin").as(minAs) :+ col("tmax").as(maxAs)): _*)
      df.join(side, partitionCols :+ "date", "left")
    }
    val bounds = locsM.groupBy(partitionCols.map(col): _*)
      .agg(min(col("date")).as("first_date_"), max(col("date")).as("last_date_"))
    val withBounds =
      if (partitionCols.isEmpty) locsM.crossJoin(broadcast(bounds))
      else locsM.join(broadcast(bounds), partitionCols)
    val joined = Seq(
      shiftJoin(1, "min_val_next_", "max_val_next_"),
      shiftJoin(-1, "min_val_before_", "max_val_before_")
    ).foldLeft(withBounds) { (df, f) => f(df) }
    joined
      .withColumn("min_val_next", when(col("date") === col("last_date_"),
        coalesce(col("min_val_next_"), col("tmin")))
        .otherwise(col("min_val_next_")))
      .withColumn("max_val_next", when(col("date") === col("last_date_"),
        coalesce(col("max_val_next_"), col("tmax")))
        .otherwise(col("max_val_next_")))
      .withColumn("min_val_before", when(col("date") === col("first_date_"),
        coalesce(col("min_val_before_"), col("tmin")))
        .otherwise(col("min_val_before_")))
      .withColumn("max_val_before", when(col("date") === col("first_date_"),
        coalesce(col("max_val_before_"), col("tmax")))
        .otherwise(col("max_val_before_")))
      .drop("min_val_next_", "max_val_next_", "min_val_before_",
        "max_val_before_", "first_date_", "last_date_")
  }

  /** Full disaggregation. Returns hourly (partitionCols…, timestamp, temp).
    *
    * For sine methods `daily` must carry date,tmin,tmax (+temp for
    * sine_mean) and, unless min_max_time=fix, sunrise/sunnoon; daylength is
    * required for the polar overlay (pass lit 12h daylength column to
    * disable). For mean_course methods, `meanCourse` is the long-form
    * (month, hour, value) matrix (normalized for min_max, raw for mean).
    */
  def disaggregate(daily: DataFrame, method: String = "sine_min_max",
      minMaxTime: String = "fix", modNighttime: Boolean = false,
      maxDelta: Map[Int, Double] = Map.empty,
      meanCourse: DataFrame = null,
      partitionCols: Seq[String] = Nil): DataFrame = {
    if (partitionCols.isEmpty)
      graft.core.ScaleGuard.unpartitionedWindow(daily,
        "Temperature.disaggregate")
    method match {
      case "sine_min_max" | "sine" | "sine_mean" =>
        sine(daily, method, minMaxTime, modNighttime, maxDelta,
          partitionCols)
      case "mean_course_min_max" | "mean_course_mean" =>
        meanCourseMethod(daily, method, meanCourse, partitionCols)
      case other => throw new IllegalArgumentException(other)
    }
  }

  private def hourlyExpand(daily: DataFrame, partitionCols: Seq[String])
      : DataFrame =
    TimeSeries.explodeDays(daily, "date", 24, 3600L * 1000000L)
      .withColumn("hour", hour(col("timestamp")))

  private def sine(daily: DataFrame, method: String, minMaxTime: String,
      modNighttime: Boolean, maxDelta: Map[Int, Double],
      partitionCols: Seq[String]): DataFrame = {
    val loc = locFrame(daily, minMaxTime, maxDelta, partitionCols)
    val hourly = hourlyExpand(loc, partitionCols)

    val h = col("hour")
    val minVal = when(h < col("max_loc"), col("tmin"))
      .otherwise(col("min_val_next"))
    val maxVal = when(h < col("min_loc"), col("max_val_before"))
      .otherwise(col("tmax"))

    val curve = if (method == "sine_mean") {
      val dtr = col("tmax") - col("tmin")
      col("temp") + dtr / 2.0 *
        cos((h - col("max_loc")) * (2.0 * math.Pi / HoursPerDay))
    } else {
      val deltaVal = maxVal - minVal
      val vTrans = minVal + deltaVal / 2.0
      if (!modNighttime)
        vTrans + (deltaVal / 2.0) *
          cos((h - col("max_loc")) * (2.0 * math.Pi / HoursPerDay))
      else {
        val spanNight = lit(HoursPerDay) - (col("max_loc") - col("min_loc"))
        val spanDay = col("max_loc") - col("min_loc")
        when(h <= col("min_loc"),
          vTrans + deltaVal / 2.0 * cos(lit(math.Pi) / spanNight *
            (lit(HoursPerDay) - col("max_loc") + h)))
        .when(h < col("max_loc"),
          vTrans + deltaVal / 2.0 * cos(lit(1.25 * math.Pi) +
            lit(0.75 * math.Pi) / spanDay * (h - col("min_loc"))))
        .otherwise(
          vTrans + deltaVal / 2.0 * cos(lit(math.Pi) / spanNight *
            (h - col("max_loc"))))
      }
    }
    val base = hourly.withColumn("temp_disagg", curve)

    if (!hourly.columns.contains("daylength")) finish(base, partitionCols)
    else finish(polarOverlay(base, loc, partitionCols), partitionCols)
  }

  private def finish(df: DataFrame, partitionCols: Seq[String]): DataFrame =
    df.select((partitionCols.map(col) :+ col("timestamp") :+
      col("temp_disagg").as("temp")): _*)

  /** Polar-night overlay (temperature.py:178-240): on days with daylength
    * < 3 h replace the curve with tmin/tmax pinned at 6 h/18 h (ordered by
    * the warming/cooling trend), NaN elsewhere; stitch transition days by
    * erasing the curve before min_loc (first normal day) / after max_loc
    * (last normal day); linearly interpolate the combined series
    * (row-spaced, limit 23) and write it back over those stamps. */
  private def polarOverlay(hourlyCurve: DataFrame, loc: DataFrame,
      partitionCols: Seq[String]): DataFrame = {
    val pcols = partitionCols.map(col)
    val wDay = if (partitionCols.isEmpty) Window.orderBy(col("date"))
      else Window.partitionBy(pcols: _*).orderBy(col("date"))

    val flags0 = loc.select((pcols ++ Seq(col("date"), col("min_loc"),
      col("max_loc"), col("tmin"), col("tmax"), col("min_val_before"),
      col("max_val_before"), col("daylength"))): _*)
      .withColumn("polar", col("daylength") < DaylengthThreshold)
    // warming trend: avg(prev-day min/max) <= avg(cur); pandas NaN
    // comparisons are False => "getting colder" when prev missing
    val warming = ((col("min_val_before") + col("max_val_before")) / 2.0 <=
      (col("tmin") + col("tmax")) / 2.0)
    val flags = flags0
      .withColumn("warming", coalesce(warming, lit(false)))
      .withColumn("prev_polar", lag(col("polar"), 1).over(wDay))
      .withColumn("next_polar", lead(col("polar"), 1).over(wDay))
      // first normal day after a polar block (pandas diff()==False pick)
      .withColumn("polar_to_normal",
        !col("polar") && coalesce(col("prev_polar"), lit(false)))
      // last normal day before a polar block (normal_to_polar - 1 day)
      .withColumn("normal_to_polar",
        !col("polar") && coalesce(col("next_polar"), lit(false)))

    val joined = hourlyCurve.drop("min_loc", "max_loc")
      .join(flags.select((pcols ++ Seq(col("date"), col("polar"),
        col("warming"), col("polar_to_normal"), col("normal_to_polar"),
        col("min_loc"), col("max_loc"))): _*), partitionCols :+ "date")

    val h = col("hour")
    // value within the to-be-interpolated subset
    val subsetVal =
      when(col("polar"),
        when(h === MinLocPolar, when(col("warming"), col("tmin"))
          .otherwise(col("tmax")))
        .when(h === MaxLocPolar, when(col("warming"), col("tmax"))
          .otherwise(col("tmin")))
        .otherwise(lit(null).cast("double")))
      .when(col("polar_to_normal"),
        when(h < col("min_loc"), lit(null).cast("double"))
          .when(h === col("min_loc"), col("tmin"))
          .otherwise(col("temp_disagg")))
      .when(col("normal_to_polar"),
        when(h > col("max_loc"), lit(null).cast("double"))
          .otherwise(col("temp_disagg")))

    val inSubset = col("polar") || col("polar_to_normal") ||
      col("normal_to_polar")
    val subset = joined.where(inSubset)
      .withColumn("v", subsetVal)
    val interp = TimeSeries.interpolateLinear(subset, "timestamp", "v",
      limit = 23, partitionCols = partitionCols, byRow = true)
      .select((pcols :+ col("timestamp") :+ col("v").as("v_interp")): _*)

    joined.join(interp, partitionCols :+ "timestamp", "left")
      .withColumn("temp_disagg",
        when(inSubset, col("v_interp")).otherwise(col("temp_disagg")))
  }

  private def meanCourseMethod(daily: DataFrame, method: String,
      meanCourse: DataFrame, partitionCols: Seq[String]): DataFrame = {
    require(meanCourse != null, "meanCourse matrix required")
    val valueCol = meanCourse.columns
      .filterNot(c => c == "month" || c == "hour").head
    val hourly = hourlyExpand(daily, partitionCols)
      .withColumn("month", month(col("timestamp")))
    val out = if (method == "mean_course_min_max") {
      val mc = meanCourse.select(col("month"), col("hour"),
        col(valueCol).as("normval"))
      hourly.join(broadcast(mc), Seq("month", "hour"), "left")
        .withColumn("temp_disagg",
          col("normval") * (col("tmax") - col("tmin")) + col("tmin"))
    } else {
      // zero-mean the course PER MONTH (pandas df.mean() is per column
      // = per month; temperature.py:254-256)
      val monthMean = meanCourse.groupBy(col("month"))
        .agg(avg(col(valueCol)).as("mmean"))
      val mc = meanCourse.join(monthMean, "month")
        .select(col("month"), col("hour"),
          (col(valueCol) - col("mmean")).as("mc0"))
      hourly.join(broadcast(mc), Seq("month", "hour"), "left")
        .withColumn("temp_disagg",
          col("temp") + (col("tmax") - col("tmin")) * col("mc0"))
    }
    finish(out, partitionCols)
  }

  /** get_shift_by_data (temperature.py:267-287): monthly mean of
    * (hour-of-daily-Tmax − sunnoon). pandas idxmax takes the FIRST
    * occurrence of the max => min hour among max rows. */
  def shiftByData(hourlyTemp: DataFrame, lon: Double, lat: Double,
      timezone: Double, tsCol: String = "timestamp",
      tempCol: String = "temp", partitionCols: Seq[String] = Nil)
      : Map[Int, Double] = {
    val keys = partitionCols.map(col) :+ to_date(col(tsCol)).as("date")
    val idxmax = hourlyTemp.where(col(tempCol).isNotNull)
      .groupBy(keys: _*)
      .agg(min(struct(negate(col(tempCol)).as("negv"),
        hour(col(tsCol)).as("h"))).getField("h").as("hour_of_max"))
    val st = graft.meteo.Meteo.withSunTimes(idxmax, "date", lon, lat,
      timezone)
    st.withColumn("delta", col("hour_of_max") - col("sunnoon"))
      .groupBy(month(col("date")).as("m")).agg(avg(col("delta")).as("d"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
  }
}
