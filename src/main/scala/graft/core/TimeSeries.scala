package graft.core

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, types}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Calendar / index-generation and replication primitives.
  *
  * Reference semantics (kristianfoerster/melodist):
  *  - `util.hourly_index` (melodist/util/util.py:26-43): hourly stamps
  *    00..23 for every day PRESENT in the daily frame.
  *  - `util.distribute_equally` (melodist/util/util.py:46-67): replicate a
  *    daily value onto its 24 hours, optionally /24 (mass-preserving).
  *  - `precipitation.sub_level_index` (melodist/precipitation.py:705-737):
  *    sub-daily grid at 42187500µs * 2^(11-level) steps (512 steps/day at
  *    level 9).
  *  - `precipitation.fmin_index` (melodist/precipitation.py:740-767): 5-min
  *    grid (288 steps/day) restricted to days present.
  *
  * Scale design: all builders are `sequence`+`explode` column expressions —
  * narrow, codegen'd, no shuffle, and they parallelize over whatever
  * partitioning the daily frame already has (e.g. hash on `station_id`
  * for a multi-station 100 TB layout).
  */
object TimeSeries {

  /** Hourly timestamps covering each day present in `daily` (24 rows/day). */
  def hourlyIndex(daily: DataFrame, dateCol: String = "date"): DataFrame =
    explodeDays(daily.select(dateCol), dateCol, 24, 3600L * 1000000L)
      .select("timestamp")

  /** Per-day sub-grid: `steps` rows per day at `stepMicros` spacing,
    * carrying all other columns of `daily` unchanged.
    *
    * ASSUMES a FIXED-OFFSET session timezone (the engine pins
    * `spark.sql.session.timeZone=UTC` everywhere, matching the
    * reference's naive-local-time model): under a DST timezone a
    * 23/25-hour civil day would make the fixed-physical-spacing grid
    * spill into the next day (duplicate stamps) or skip a local hour,
    * and `distributeEqually(divide=true)` would double-assign mass to
    * the duplicated stamp. Keep the session TZ fixed-offset when
    * using the day-grid builders. */
  def explodeDays(daily: DataFrame, dateCol: String, steps: Int,
      stepMicros: Long): DataFrame = {
    val start = col(dateCol).cast("timestamp")
    val end = start + expr(s"INTERVAL ${stepMicros * (steps - 1)} MICROSECOND")
    daily.withColumn("timestamp",
      explode(sequence(start, end, expr(s"INTERVAL $stepMicros MICROSECOND"))))
  }

  /** melodist distribute_equally: each daily value replicated to its 24
    * hourly slots; `divide=true` divides by 24 (mass-preserving). */
  def distributeEqually(daily: DataFrame, dateCol: String,
      valueCols: Seq[String], divide: Boolean): DataFrame = {
    val hourly = explodeDays(daily, dateCol, 24, 3600L * 1000000L)
    val projected = valueCols.foldLeft(hourly) { (df, c) =>
      if (divide) df.withColumn(c, col(c) / 24.0) else df
    }
    projected.select(col("timestamp") +: valueCols.map(col): _*)
  }

  /** distributeEqually keeping extra key columns (multi-station layout). */
  def distributeEquallyPartitioned(daily: DataFrame, dateCol: String,
      valueCol: String, divide: Boolean,
      partitionCols: Seq[String] = Nil): DataFrame = {
    val hourly = explodeDays(daily, dateCol, 24, 3600L * 1000000L)
    val v = if (divide) col(valueCol) / 24.0 else col(valueCol)
    hourly.select((partitionCols.map(col) :+ col("timestamp") :+
      v.as(valueCol)): _*)
  }

  /** Cascade sub-level grid: step = 42187500µs * 2^(11-level)
    * (precipitation.py:705-737); level 9 => 168.75 s => 512 steps/day. */
  def subLevelIndex(daily: DataFrame, level: Int,
      dateCol: String = "date"): DataFrame = {
    val stepMicros = 42187500L * (1L << (11 - level))
    val steps = (86400L * 1000000L / stepMicros).toInt
    explodeDays(daily.select(dateCol), dateCol, steps, stepMicros)
      .select("timestamp")
  }

  /** 5-minute grid (288 steps/day) for days present. */
  def fminIndex(daily: DataFrame, dateCol: String = "date"): DataFrame =
    explodeDays(daily.select(dateCol), dateCol, 288, 300L * 1000000L)
      .select("timestamp")

  /** Reindex a daily frame to a gap-free calendar between its min and max
    * date — missing days become null rows (melodist/station.py:86-90). */
  def reindexDailyComplete(daily: DataFrame, dateCol: String = "date")
      : DataFrame = {
    val cal = daily
      .agg(min(col(dateCol)).as("d0"), max(col(dateCol)).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"),
        expr("INTERVAL 1 DAY"))).as(dateCol))
    cal.join(daily, Seq(dateCol), "left")
  }

  /** Gap detection: rows whose distance to the previous timestamp differs
    * from `stepSeconds` (melodist/util/util.py:249-297, re-expressed as a
    * one-pass window). Returns (gap_start=prev ts, gap_end=ts, gap_seconds).
    * `partitionCols` should carry station_id at scale. */
  def gaps(df: DataFrame, tsCol: String, stepSeconds: Long,
      partitionCols: Seq[String] = Nil): DataFrame = {
    val w = if (partitionCols.isEmpty) Window.orderBy(col(tsCol))
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(col(tsCol))
    df.select(partitionCols.map(col) :+ col(tsCol): _*)
      .withColumn("prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("gap_seconds",
        col(tsCol).cast("timestamp").cast("long") -
          col("prev_ts").cast("timestamp").cast("long"))
      .where(col("prev_ts").isNotNull && col("gap_seconds") =!= stepSeconds)
      .select(partitionCols.map(col) ++ Seq(col("prev_ts").as("gap_start"),
        col(tsCol).as("gap_end"), col("gap_seconds")): _*)
  }

  /** melodist util.drop_incomplete_days (util/util.py:300-352): keep rows
    * from the first `hour==shift, minute==0` stamp through the last
    * `hour==(shift-1+24)%24, minute==0` stamp, so only whole
    * [shift, shift+24) days remain. Python row-loop re-expressed as two
    * conditional aggregates. HOURLY-SERIES semantics, faithful to the
    * reference (its docstring: "this methodology only applies to hourly
    * time series", and its tail loop requires minute==0 exactly like
    * this one): on a sub-hourly grid the tail truncates to the last
    * :00 stamp — by design, not an off-by-one. */
  def dropIncompleteDays(df: DataFrame, tsCol: String, shift: Int = 0)
      : DataFrame = {
    val lastHour = ((shift - 1) % 24 + 24) % 24
    val bounds = df.agg(
      min(when(hour(col(tsCol)) === shift && minute(col(tsCol)) === 0,
        col(tsCol))).as("first_ok"),
      max(when(hour(col(tsCol)) === lastHour && minute(col(tsCol)) === 0,
        col(tsCol))).as("last_ok"))
    df.join(broadcast(bounds),
      col(tsCol) >= col("first_ok") && col(tsCol) <= col("last_ok"))
      .drop("first_ok", "last_ok")
  }

  /** Seasonal subset: rows whose month is in `months`
    * (melodist/precipitation.py:607-628 — one filter, no concat). */
  def seasonalSubset(df: DataFrame, timeCol: String, months: Seq[Int])
      : DataFrame =
    df.where(month(col(timeCol)).isin(months: _*))

  /** As-of join (SQL `ASOF JOIN`; pandas `merge_asof`): align each
    * left row with the nearest right row in the requested
    * `direction` — "backward" (most recent right.ts <= left.ts),
    * "forward" (earliest right.ts >= left.ts), or "nearest" (closer
    * of the two; ties resolve backward, matching pandas).
    *
    * NOT a range join: both sides union into ONE frame and running
    * `last`/`first(ignoreNulls)` windows carry right values onto left
    * rows — one shuffle on (partitionCols, ts), no quadratic
    * time-band explosion, and `partitionCols` keeps the sort
    * per-station at fleet scale. At equal timestamps the right row is
    * visible in either direction (<= / >= semantics).
    * `toleranceMicros` nulls matches farther than the window (for
    * "nearest": the closer side is chosen first, THEN tolerance
    * applies — no fallback to the farther side, matching pandas).
    * The matched row's values are emitted AS THEY ARE — a null value
    * in the matched right row stays null (pandas semantics), it is
    * never back-filled from an older non-null row. */
  def asofJoin(left: DataFrame, right: DataFrame, tsCol: String,
      valueCols: Seq[String], direction: String = "backward",
      partitionCols: Seq[String] = Nil,
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"unknown direction $direction")
    val leftCols = left.columns
    val reserved = Seq("is_left__", "m__", "m___b", "m___f")
    require(!(leftCols ++ valueCols).exists(reserved.contains),
      s"reserved column names: ${reserved.mkString(", ")}")
    require(!valueCols.exists(leftCols.contains),
      s"left already has ${valueCols.filter(leftCols.contains)}")
    if (partitionCols.isEmpty) {
      ScaleGuard.unpartitionedWindow(left, "TimeSeries.asofJoin")
      ScaleGuard.unpartitionedWindow(right, "TimeSeries.asofJoin")
    }
    // The matched row travels as ONE struct (its ts + its values), so
    // tolerance/distance and the emitted values always come from the
    // SAME right row — a null value in the matched row stays null
    // (pandas merge_asof semantics), never back-filled from an older
    // non-null row.
    val mType = types.StructType(
      types.StructField("rts__", left.schema(tsCol).dataType) +:
        valueCols.map(c => types.StructField(c, right.schema(c).dataType)))
    val lTagged = left
      .withColumn("is_left__", lit(1))
      .withColumn("m__", lit(null).cast(mType))
    val rTagged = right
      .select((partitionCols :+ tsCol).map(col) ++
        valueCols.map(col): _*)
      .withColumn("is_left__", lit(0))
      .withColumn("m__", struct(col(tsCol).as("rts__") +:
        valueCols.map(col): _*))
      .drop(valueCols: _*)
    val unioned = lTagged.unionByName(rTagged,
      allowMissingColumns = true)
    // Backward scans need equal-ts right rows sorted BEFORE left rows
    // (so the preceding window sees them); forward scans need them
    // AFTER. Both windows hash-partition identically, so "nearest"
    // costs one extra sort, not an extra shuffle.
    def scan(back: Boolean): Column = {
      val order =
        if (back) Seq(col(tsCol), col("is_left__"))
        else Seq(col(tsCol), col("is_left__").desc)
      val w0 = if (partitionCols.isEmpty) Window.orderBy(order: _*)
        else Window.partitionBy(partitionCols.map(col): _*)
          .orderBy(order: _*)
      val w = if (back)
        w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      if (back) last(col("m__"), ignoreNulls = true).over(w)
      else first(col("m__"), ignoreNulls = true).over(w)
    }
    def dist(m: Column) =
      abs(unix_micros(col(tsCol)) - unix_micros(m.getField("rts__")))
    def inTol(m: Column) = toleranceMicros match {
      case Some(t) => m.isNotNull && dist(m) <= t
      case None => m.isNotNull
    }
    val out = direction match {
      case "backward" | "forward" =>
        val filled = unioned.withColumn("m__",
          scan(direction == "backward"))
        valueCols.foldLeft(filled) { (d, c) =>
          d.withColumn(c,
            when(inTol(col("m__")), col("m__").getField(c))) }
      case "nearest" =>
        val filled = unioned
          .withColumn("m___b", scan(back = true))
          .withColumn("m___f", scan(back = false))
        val b = col("m___b"); val f = col("m___f")
        val useBack = b.isNotNull && (f.isNull || dist(b) <= dist(f))
        valueCols.foldLeft(filled) { (d, c) =>
          d.withColumn(c,
            when(useBack && inTol(b), b.getField(c))
              .when(!useBack && inTol(f), f.getField(c)))
        }
    }
    out.where(col("is_left__") === 1)
      .select(leftCols.map(col) ++ valueCols.map(col): _*)
  }

  /** Gap-based sessionization: assign a session id per `keyCols` that
    * increments whenever the gap to the previous event exceeds
    * `gapSeconds` (the standard event-stream sessionize; Structured
    * Streaming's session_window for batch). One lag + one running sum
    * over the same (key, ts) sort — a single shuffle on `keyCols`,
    * which keys the scale axis. Session ids are 0-based and stable:
    * they depend only on the data order, not the partitioning. */
  def sessionize(df: DataFrame, tsCol: String, keyCols: Seq[String],
      gapSeconds: Long): DataFrame = {
    require(keyCols.nonEmpty, "sessionize needs key columns")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(unix_micros(col(tsCol)))
    val gap = unix_micros(col(tsCol)) -
      lag(unix_micros(col(tsCol)), 1).over(w)
    val isNew = when(gap.isNull || gap > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)) - 1)
  }

  /** Exponentially weighted moving average (pandas
    * `ewm(alpha=α, adjust=False, ignore_na=True).mean()`): per key,
    * y₀ = x₀ and yₜ = (1−α)·yₜ₋₁ + α·xₜ. Null values carry the
    * previous state (and emit it); leading nulls emit null. NOTE the
    * `ignore_na=True` in the parity claim: pandas' DEFAULT
    * (ignore_na=False) decays the weight of the pre-gap state by the
    * number of skipped nulls — for [1, null, 2] at α=0.5 pandas
    * default gives 1.667 where this (and ignore_na=True) gives 1.5.
    * The q89 oracle replays this recurrence exactly.
    *
    * A genuine sequential recurrence — a RANGE/ROWS window would need
    * exponentially growing weights — so this is the secondary-sort
    * pattern: hash-repartition by key, sortWithinPartitions(key, ts),
    * ONE mapPartitions pass carrying running state across each key's
    * contiguous run. One shuffle total; state is one double; a
    * partition streams its rows, so arbitrarily long series per key
    * fit. Deterministic under AQE/retries (hash partition + in-
    * partition sort, no rand) — PROVIDED the sort key is total:
    * rows of one key sharing a timestamp are visited in an arbitrary,
    * partitioning-dependent order, and the recurrence propagates that
    * choice to every later row. Pass `tieBreakCols` (a unique row id)
    * whenever duplicate timestamps per key are possible. */
  def ewma(df: DataFrame, tsCol: String, valueCol: String,
      alpha: Double, partitionCols: Seq[String],
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    require(partitionCols.nonEmpty,
      "ewma needs partition keys — a keyless global recurrence cannot " +
        "be distributed; add a series id")
    val vIdx = df.columns.indexOf(valueCol)
    require(vIdx >= 0, "missing column")
    def x(r: Row): Double = if (r.isNullAt(vIdx)) Double.NaN
      else r.getAs[Number](vIdx).doubleValue()
    def emit(s: Double): Seq[Any] =
      Seq(if (s.isNaN) null else (s: java.lang.Double))
    SequentialScan.perKey[Double](df, partitionCols,
      tsCol +: tieBreakCols,
      Seq(types.StructField("ewma", DoubleType))) { r =>
      val s = x(r); (s, emit(s))
    } { (st, r) =>
      val xv = x(r)
      val s2 = if (xv.isNaN) st
        else if (st.isNaN) xv
        else (1 - alpha) * st + alpha * xv
      (s2, emit(s2))
    }
  }

  /** Backward as-of join — see [[asofJoin]]. */
  def asofJoinBackward(left: DataFrame, right: DataFrame, tsCol: String,
      valueCols: Seq[String], partitionCols: Seq[String] = Nil,
      toleranceMicros: Option[Long] = None): DataFrame =
    asofJoin(left, right, tsCol, valueCols, "backward", partitionCols,
      toleranceMicros)

  /** Linear interpolation of nulls over time, bounded by `limit` steps
    * (pandas Series.interpolate(method='linear', limit=N) equivalent for a
    * regularly spaced series). Window-function based: previous/next non-null
    * value + timestamp, time-weighted blend.
    * pandas fills forward only (a leading null block stays null) and at the
    * tail fills with the last value only when limit allows; matching that:
    * interpolate only when BOTH neighbours exist, forward-fill when only the
    * previous exists and the row is within `limit` rows of it.
    */
  def interpolateLinear(df: DataFrame, tsCol: String, valueCol: String,
      limit: Int, partitionCols: Seq[String] = Nil,
      byRow: Boolean = false, limitDirection: String = "forward")
      : DataFrame = {
    // fail loudly on pandas' "backward" (valid there, unimplemented
    // here): silently falling into the forward branch would give the
    // EXACT OPPOSITE fill semantics with no error
    require(limitDirection == "forward" || limitDirection == "both",
      s"limitDirection '$limitDirection' not supported — use " +
        "'forward' or 'both' ('backward' is not implemented)")
    if (partitionCols.isEmpty)
      ScaleGuard.unpartitionedWindow(df, "TimeSeries.interpolateLinear")
    def base = if (partitionCols.isEmpty) Window.orderBy(col(tsCol))
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(col(tsCol))
    val wPrev = base.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = base.rowsBetween(0, Window.unboundedFollowing)
    val v = col(valueCol)
    val prevV = last(v, ignoreNulls = true).over(wPrev)
    val prevT = last(when(v.isNotNull, col(tsCol)), ignoreNulls = true)
      .over(wPrev)
    val nextV = first(v, ignoreNulls = true).over(wNext)
    val nextT = first(when(v.isNotNull, col(tsCol)), ignoreNulls = true)
      .over(wNext)
    // row distance to previous non-null (for the pandas `limit` semantics)
    val rn = row_number().over(base)
    val prevRn = last(when(v.isNotNull, rn), ignoreNulls = true).over(wPrev)
    val nextRn = first(when(v.isNotNull, rn), ignoreNulls = true).over(wNext)
    val dist = rn - prevRn
    // pandas interpolate(method='linear') is ROW-spaced (index ignored);
    // byRow=true matches that, byRow=false weights by time distance.
    val frac =
      if (byRow) (rn - prevRn).cast("double") / (nextRn - prevRn)
      else
        (col(tsCol).cast("timestamp").cast("double") -
          prevT.cast("timestamp").cast("double")) /
        (nextT.cast("timestamp").cast("double") -
          prevT.cast("timestamp").cast("double"))
    val distNext = nextRn - rn
    val interp =
      if (limitDirection == "both")
        // pandas limit_direction='both': interior gaps fill from either
        // end within `limit`; leading NaNs backfill, trailing forward-fill
        when(v.isNotNull, v)
          .when(prevV.isNotNull && nextV.isNotNull &&
            (dist <= limit || distNext <= limit),
            prevV + (nextV - prevV) * frac)
          .when(prevV.isNotNull && nextV.isNull && dist <= limit, prevV)
          .when(prevV.isNull && nextV.isNotNull && distNext <= limit,
            nextV)
      else
        when(v.isNotNull, v)
          .when(prevV.isNotNull && nextV.isNotNull && dist <= limit,
            prevV + (nextV - prevV) * frac)
          .when(prevV.isNotNull && nextV.isNull && dist <= limit, prevV)
    df.withColumn(valueCol, interp)
  }

  /** Shared scaffolding for the null-filling family: previous/next
    * non-null value, stamp and row distance around each row. */
  private def withPrevNext(df: DataFrame, tsCol: String, valueCol: String,
      partitionCols: Seq[String])(
      build: (Column, Column, Column, Column, Column, Column) => Column)
      : DataFrame = {
    if (partitionCols.isEmpty)
      ScaleGuard.unpartitionedWindow(df, "TimeSeries null-filling")
    def base = if (partitionCols.isEmpty) Window.orderBy(col(tsCol))
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(col(tsCol))
    val wPrev = base.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = base.rowsBetween(0, Window.unboundedFollowing)
    val v = col(valueCol)
    val prevV = last(v, ignoreNulls = true).over(wPrev)
    val prevT = last(when(v.isNotNull, col(tsCol)), ignoreNulls = true)
      .over(wPrev)
    val nextV = first(v, ignoreNulls = true).over(wNext)
    val nextT = first(when(v.isNotNull, col(tsCol)), ignoreNulls = true)
      .over(wNext)
    val rn = row_number().over(base)
    val prevRn = last(when(v.isNotNull, rn), ignoreNulls = true).over(wPrev)
    df.withColumn(valueCol,
      build(prevV, prevT, nextV, nextT, rn - prevRn, prevRn))
  }

  /** pandas `interpolate(method='nearest')` (scipy interp1d
    * kind='nearest'): interior nulls take the time-nearer bracketing
    * non-null value, ties rounding DOWN to the earlier knot (scipy's
    * side='left' searchsorted); leading/trailing nulls stay null —
    * scipy methods never extrapolate. `limit` bounds the row distance
    * to the previous non-null, as in pandas. */
  def interpolateNearest(df: DataFrame, tsCol: String, valueCol: String,
      limit: Int, partitionCols: Seq[String] = Nil): DataFrame =
    withPrevNext(df, tsCol, valueCol, partitionCols) {
      (prevV, prevT, nextV, nextT, dist, _) =>
        val v = col(valueCol)
        val t = col(tsCol).cast("timestamp").cast("double")
        val dPrev = t - prevT.cast("timestamp").cast("double")
        val dNext = nextT.cast("timestamp").cast("double") - t
        when(v.isNotNull, v)
          .when(prevV.isNotNull && nextV.isNotNull && dist <= limit,
            when(dPrev <= dNext, prevV).otherwise(nextV))
    }

  /** pandas `interpolate(method='zero')` (scipy kind='zero'): step
    * function holding the previous knot's value — interior nulls only,
    * no extrapolation past the last knot. */
  def interpolateZero(df: DataFrame, tsCol: String, valueCol: String,
      limit: Int, partitionCols: Seq[String] = Nil): DataFrame =
    withPrevNext(df, tsCol, valueCol, partitionCols) {
      (prevV, _, nextV, _, dist, _) =>
        val v = col(valueCol)
        when(v.isNotNull, v)
          .when(prevV.isNotNull && nextV.isNotNull && dist <= limit, prevV)
    }

  /** pandas `interpolate(method='pad')` / `fillna(method='ffill',
    * limit=N)`: forward-fill within `limit` rows of the previous
    * non-null, including past the last knot. */
  def fillForward(df: DataFrame, tsCol: String, valueCol: String,
      limit: Int, partitionCols: Seq[String] = Nil): DataFrame =
    withPrevNext(df, tsCol, valueCol, partitionCols) {
      (prevV, _, _, _, dist, _) =>
        val v = col(valueCol)
        when(v.isNotNull, v).when(prevV.isNotNull && dist <= limit, prevV)
    }
}
