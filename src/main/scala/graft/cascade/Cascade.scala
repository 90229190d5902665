package graft.cascade

import graft.core.TimeSeries
import graft.disagg.Wind.uniformHash
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Olsson (1998) microcanonical random cascade for precipitation —
  * calibration (melodist/precipitation.py:416-604, 631-702) and
  * disaggregation (precipitation.py:74-372), Spark-first.
  *
  * Disaggregation runs ≤11 chained narrow passes: per level a lag/lead
  * window classifies boxes, literal when-chains look up the calibrated
  * matrices (no joins, full codegen), `posexplode` doubles the rows.
  * Randomness is xxhash64-derived per (seed, level, box index) — stable
  * under any partitioning, retries, and AQE re-plans, unlike rand().
  *
  * Calibration is ≤11 chained halving aggregations, each ending in a tiny
  * (≤ 8+56 cell) collect; all heavy work stays distributed.
  *
  * Scale: windows order the whole per-station series — partition by
  * station via `partitionCols` for fleet-size data; box counts per level
  * stay ≤ 2048 × days which flows through narrow stages.
  */
object Cascade {
  import CascadeStatistics.BoxTypes

  /** when-chain lookup of a 2×4 matrix by (belowabove, boxtype) columns. */
  private def mat(m: Array[Array[Double]], ba: Column, bt: Column): Column = {
    var c: Column = lit(Double.NaN)
    for (b <- 0 until 2; t <- 1 to 4)
      c = when(ba === b && bt === t, m(b)(t - 1)).otherwise(c)
    c
  }

  /** box type from wet flags of neighbours (null prev/next = series edge:
    * only starting/isolated at the head, ending/isolated at the tail). */
  private def boxType(wet: Column, prevWet: Column, nextWet: Column)
      : Column = {
    val p = coalesce(prevWet, lit(false))
    val n = coalesce(nextWet, lit(false))
    when(!wet, BoxTypes.dry)
      .when(!p && n, BoxTypes.starting)
      .when(p && n, BoxTypes.enclosed)
      .when(p && !n, BoxTypes.ending)
      .otherwise(BoxTypes.isolated)
  }

  // ------------------------------------------------------------- disagg

  /** 8-row lookup table for one level's statistics: (ba, bt) ->
    * p01, p10, cumulative weight CDF. Broadcast-joined — tiny generated
    * code per level instead of 56-branch when-chains (whose janino
    * compile time dominated deep cascades). A constant-array
    * `element_at` lookup was also tried and measured ~40% SLOWER across
    * the four cascade gates (the literal trees grow each level's plan;
    * the 8-row broadcast is cheap and AQE-reused), so the join stays. */
  private def statsLookup(spark: org.apache.spark.sql.SparkSession,
      stats: CascadeStatistics): DataFrame = {
    import spark.implicits._
    val cum = stats.wxxCum
    val rows = for (b <- 0 until 2; t <- 1 to 4) yield
      (b, t, stats.p01(b)(t - 1), stats.p10(b)(t - 1),
        (0 until 7).map(k => cum(k)(b)(t - 1)))
    rows.toDF("ba", "bt", "p01", "p10", "wcum")
  }

  /** One cascade level: each box at `idx` becomes two children
    * (idx*2, idx*2+1). `stats` supplies matrices + the level threshold.
    * `draw` maps (derived seed, key columns) to a (0,1) uniform —
    * [[graft.disagg.Wind.uniformHash]] (xxhash64) in production; a
    * cross-engine hash (md5) for portable oracle twins. */
  private def disaggLevel(df: DataFrame, stats: CascadeStatistics,
      meanvol: Double, level: Int, seed: Long,
      partitionCols: Seq[String],
      draw: (Long, Seq[Column]) => Column = uniformHash): DataFrame = {
    val w = (if (partitionCols.isEmpty) Window.orderBy(col("idx"))
      else Window.partitionBy(partitionCols.map(col): _*)
        .orderBy(col("idx")))
    val v = col("v")
    val wet = v > 0.0
    val bt = boxType(wet, lag(wet, 1).over(w), lead(wet, 1).over(w))
    val ba = when(v > meanvol, 1).otherwise(0)

    val rndp = draw(seed * 31 + level,
      col("idx") +: partitionCols.map(col))
    val rndw = draw(seed * 31 + level + 7919,
      col("idx") +: partitionCols.map(col))

    val centers = CascadeStatistics.wClassCenters
    // first class whose cumulative weight covers the draw (break-on-first)
    val w1 = coalesce(
      element_at(array(centers.map(lit(_)): _*),
        try_element_at(
          filter(sequence(lit(1), lit(7)),
            k => col("rndw") <= element_at(col("wcum"), k)), lit(1))),
      lit(centers(6)))

    val staged = df
      .withColumn("bt", bt)
      .withColumn("ba", ba)
      .withColumn("rndw", rndw)
      .join(broadcast(statsLookup(df.sparkSession, stats)),
        Seq("ba", "bt"), "left")
      .withColumn("w1", w1)
      .withColumn("children",
        when(!wet, array(lit(0.0), lit(0.0)))
        .when(rndp <= col("p01"), array(lit(0.0), v))
        .when(rndp <= col("p01") + col("p10"), array(v, lit(0.0)))
        .otherwise(array(col("w1") * v, (lit(1.0) - col("w1")) * v)))

    staged
      .select((partitionCols.map(col) :+ col("idx") :+
        posexplode(col("children"))): _*)
      .select((partitionCols.map(col) :+
        (col("idx") * 2 + col("pos")).as("idx") :+ col("col").as("v")): _*)
  }

  /** Per-station lookup tables for one cascade level: a threshold table
    * (station key -> meanvol) and a statistics table (station key ×
    * (ba, bt) -> p01, p10, weight CDF). Both are #stations-scale and
    * broadcast. Keys are strings; the join casts the data-side station
    * columns to string, so any key column type works. */
  private def multiLookups(spark: SparkSession, partitionCols: Seq[String],
      entries: Seq[(Seq[String], CascadeStatistics, Double)])
      : (DataFrame, DataFrame) = {
    import scala.jdk.CollectionConverters._
    val keyFields = partitionCols.indices
      .map(i => StructField(s"__k$i", StringType))
    val thrSchema = StructType(keyFields :+
      StructField("meanvol", DoubleType))
    val thrRows = entries.map { case (k, _, thr) =>
      Row.fromSeq(k :+ thr) }
    val statSchema = StructType(keyFields ++ Seq(
      StructField("ba", IntegerType), StructField("bt", IntegerType),
      StructField("p01", DoubleType), StructField("p10", DoubleType),
      StructField("wcum", ArrayType(DoubleType))))
    val statRows = entries.flatMap { case (k, s, _) =>
      val cum = s.wxxCum
      for (b <- 0 until 2; t <- 1 to 4) yield Row.fromSeq(k ++ Seq(b, t,
        s.p01(b)(t - 1), s.p10(b)(t - 1),
        (0 until 7).map(kk => cum(kk)(b)(t - 1))))
    }
    (spark.createDataFrame(thrRows.asJava, thrSchema),
      spark.createDataFrame(statRows.asJava, statSchema))
  }

  /** One cascade level with per-station statistics: same narrow plan as
    * [[disaggLevel]], with the scalar threshold and the 8-row stats
    * lookup replaced by per-station broadcast joins. */
  private def disaggLevelMulti(df: DataFrame, thrDf: DataFrame,
      statsDf: DataFrame, level: Int, seed: Long,
      partitionCols: Seq[String],
      draw: (Long, Seq[Column]) => Column = uniformHash): DataFrame = {
    val pcols = partitionCols.map(col)
    val w = Window.partitionBy(pcols: _*).orderBy(col("idx"))
    val keys = partitionCols.indices.map(i => s"__k$i")
    val keyed = partitionCols.zipWithIndex.foldLeft(df) {
      case (d, (c, i)) => d.withColumn(s"__k$i", col(c).cast("string")) }
    val v = col("v")
    val wet = v > 0.0
    val bt = boxType(wet, lag(wet, 1).over(w), lead(wet, 1).over(w))
    val rndp = draw(seed * 31 + level, col("idx") +: pcols)
    val rndw = draw(seed * 31 + level + 7919, col("idx") +: pcols)

    val centers = CascadeStatistics.wClassCenters
    val w1 = coalesce(
      element_at(array(centers.map(lit(_)): _*),
        try_element_at(
          filter(sequence(lit(1), lit(7)),
            k => col("rndw") <= element_at(col("wcum"), k)), lit(1))),
      lit(centers(6)))

    val staged = keyed
      .join(broadcast(thrDf), keys, "left")
      .withColumn("bt", bt)
      .withColumn("ba", when(v > col("meanvol"), 1).otherwise(0))
      .withColumn("rndw", rndw)
      .join(broadcast(statsDf), keys ++ Seq("ba", "bt"), "left")
      .withColumn("w1", w1)
      .withColumn("children",
        when(!wet, array(lit(0.0), lit(0.0)))
        .when(rndp <= col("p01"), array(lit(0.0), v))
        .when(rndp <= col("p01") + col("p10"), array(v, lit(0.0)))
        .otherwise(array(col("w1") * v, (lit(1.0) - col("w1")) * v)))

    staged
      .select((pcols :+ col("idx") :+ posexplode(col("children"))): _*)
      .select((pcols :+
        (col("idx") * 2 + col("pos")).as("idx") :+ col("col").as("v")): _*)
  }

  /** Cascade disaggregation of a daily precip series.
    *
    * `daily`: (partitionCols…, date, precip). Returns hourly
    * (partitionCols…, timestamp, precip) when `hourly=true`, else 5-min.
    * `stats` is either one CascadeStatistics (threshold indexed per level)
    * or a per-level list (deepest-first, as built by buildCasc with
    * avgStats=false). Missing daily values are zeroed for the cascade and
    * restored to null afterwards (precipitation.py:96-99, 313-315);
    * `shift` lags the final series by that many steps. */
  def disaggregate(daily: DataFrame,
      stats: Either[CascadeStatistics, Seq[CascadeStatistics]],
      hourly: Boolean = true, level: Int = 9, shift: Int = 0,
      seed: Long = 42L, partitionCols: Seq[String] = Nil,
      draw: (Long, Seq[Column]) => Column = uniformHash): DataFrame = {
    val si = if (hourly) 5 else level
    if (partitionCols.isEmpty)
      graft.core.ScaleGuard.unpartitionedWindow(daily,
        "Cascade.disaggregate")
    stats match {
      case Right(l) => require(l.length == si,
        s"stats list must have $si elements")
      case _ =>
    }
    disaggregateImpl(daily, hourly, level, shift, partitionCols) {
      (cur, l, siVar) =>
        val (lvlStats, meanvol) = stats match {
          case Left(s) => (s, s.threshold(siVar))
          case Right(list) => (list(siVar), list(siVar).threshold(0))
        }
        disaggLevel(cur, lvlStats, meanvol, l, seed, partitionCols, draw)
    }
  }

  /** Cascade disaggregation with PER-STATION calibrated statistics: each
    * station's boxes branch using its own matrices and thresholds (the
    * reference calibrates stations independently — one global statistics
    * object would mix climates). Map keys are the station key values
    * rendered as strings, matched against `partitionCols` cast to string.
    * Per level the per-station parameters become two broadcast lookup
    * tables (#stations and #stations×8 rows) — the data path is identical
    * to [[disaggregate]]: narrow, fully distributed, no driver loops. */
  def disaggregatePerStation(daily: DataFrame,
      statsByStation: Map[Seq[String],
        Either[CascadeStatistics, Seq[CascadeStatistics]]],
      hourly: Boolean = true, level: Int = 9, shift: Int = 0,
      seed: Long = 42L, partitionCols: Seq[String] = Nil,
      draw: (Long, Seq[Column]) => Column = uniformHash): DataFrame = {
    require(partitionCols.nonEmpty,
      "disaggregatePerStation needs partitionCols")
    val si = if (hourly) 5 else level
    statsByStation.values.foreach {
      case Right(l) => require(l.length == si,
        s"stats list must have $si elements")
      case _ =>
    }
    // Every station in the data must be calibrated: the per-level left
    // joins would otherwise leave its probabilities null and every wet
    // box would silently split with the fixed fallback weight —
    // plausible-looking but meaningless output. One distinct+collect of
    // the key tuples (fleet-key scale, not data scale).
    val present = daily.select(partitionCols.map(col): _*).distinct()
      .collect().map(_.toSeq.map(String.valueOf): Seq[String])
    val missing = present.filterNot(statsByStation.contains)
    require(missing.isEmpty,
      s"stations without calibration stats: ${missing.take(5).mkString(", ")}" +
        (if (missing.length > 5) s" (+${missing.length - 5} more)" else ""))
    disaggregateImpl(daily, hourly, level, shift, partitionCols) {
      (cur, l, siVar) =>
        val entries = statsByStation.toSeq.map { case (k, e) =>
          val (s, thr) = e match {
            case Left(s) => (s, s.threshold(siVar))
            case Right(list) => (list(siVar), list(siVar).threshold(0))
          }
          (k, s, thr)
        }
        val (thrDf, statsDf) =
          multiLookups(cur.sparkSession, partitionCols, entries)
        disaggLevelMulti(cur, thrDf, statsDf, l, seed, partitionCols,
          draw)
    }
  }

  /** `disagg_prec_cascade(test=True)` equivalent
    * (precipitation.py:74 signature; per-level dumps at :116-121 and
    * :183-189): the per-level intermediate box values, for method
    * debugging. Returns (level -> boxes) pairs, level 1 first; each frame
    * is (partitionCols…, idx, v) with days×2^level boxes (missing daily
    * values run through the cascade as zero, exactly as in
    * [[disaggregate]]). Lazy DataFrames — collecting all levels costs one
    * scan per level, so keep it to debug runs. */
  def disaggregateDebug(daily: DataFrame,
      stats: Either[CascadeStatistics, Seq[CascadeStatistics]],
      hourly: Boolean = true, level: Int = 9, seed: Long = 42L,
      partitionCols: Seq[String] = Nil): Seq[(Int, DataFrame)] = {
    val si = if (hourly) 5 else level
    val pcols = partitionCols.map(col)
    val wDay = (if (partitionCols.isEmpty) Window.orderBy(col("date"))
      else Window.partitionBy(pcols: _*).orderBy(col("date")))
    var cur = daily
      .withColumn("idx", row_number().over(wDay).cast("long") - 1)
      .withColumn("v", coalesce(col("precip"), lit(0.0)))
      .select((pcols :+ col("idx") :+ col("v")): _*)
    var siVar = si
    val levels = Seq.newBuilder[(Int, DataFrame)]
    for (l <- 1 to si) {
      siVar -= 1
      val (lvlStats, meanvol) = stats match {
        case Left(s) => (s, s.threshold(siVar))
        case Right(list) => (list(siVar), list(siVar).threshold(0))
      }
      cur = disaggLevel(cur, lvlStats, meanvol, l, seed, partitionCols)
      if (l % 6 == 0) cur = cur.localCheckpoint(true)
      levels += (l -> cur)
    }
    levels.result()
  }

  private def disaggregateImpl(daily: DataFrame, hourly: Boolean,
      level: Int, shift: Int, partitionCols: Seq[String])
      (step: (DataFrame, Int, Int) => DataFrame): DataFrame = {
    val si = if (hourly) 5 else level
    val pcols = partitionCols.map(col)
    val wDay = (if (partitionCols.isEmpty) Window.orderBy(col("date"))
      else Window.partitionBy(pcols: _*).orderBy(col("date")))

    val base = daily
      .withColumn("missing", col("precip").isNull)
      .withColumn("idx", row_number().over(wDay).cast("long") - 1)
      .withColumn("v", coalesce(col("precip"), lit(0.0)))
      .select((pcols ++ Seq(col("date"), col("missing"), col("idx"),
        col("v"))): _*)

    var cur = base.select((pcols :+ col("idx") :+ col("v")): _*)
    var siVar = si
    for (l <- 1 to si) {
      siVar -= 1
      cur = step(cur, l, siVar)
      // keep optimizer time bounded on deep (5-min) cascades without
      // forcing extra materializations on the common hourly path
      if (l % 6 == 0) cur = cur.localCheckpoint(true)
    }

    val out: DataFrame = if (hourly) {
      // 32 × 0.75h boxes/day -> ×3 quarters -> hour = quarter div 4
      // (precipitation.py:283-305; net effect: each hour sums its 4
      // quarter-steps, mass-exact)
      val quarters = cur
        .select((pcols :+ col("idx") :+
          posexplode(array(col("v") / 3.0, col("v") / 3.0,
            col("v") / 3.0))): _*)
        .select((pcols :+ (col("idx") * 3 + col("pos")).as("q") :+
          col("col").as("v")): _*)
      quarters
        .groupBy((pcols :+ (col("q") / 4).cast("long").as("hpos")): _*)
        .agg(sum(col("v")).as("precip_c"))
    } else {
      // sub-level stamps at 42187500µs * 2^(11-level) -> 5-min buckets
      val stepMicros = 42187500L * (1L << (11 - level))
      val perDay = (86400L * 1000000L / stepMicros).toInt
      val bucketsPerDay = 288
      cur
        .withColumn("day_idx", (col("idx") / perDay).cast("long"))
        .withColumn("in_day", col("idx") % perDay)
        .withColumn("bucket",
          (col("in_day") * stepMicros / (300L * 1000000L)).cast("long"))
        .groupBy((pcols :+
          (col("day_idx") * bucketsPerDay + col("bucket")).as("hpos")): _*)
        .agg(sum(col("v")).as("precip_c"))
    }

    // map sequential positions back to timestamps of present days
    val stepsPerDay = if (hourly) 24 else 288
    val stepMicros = if (hourly) 3600L * 1000000L else 300L * 1000000L
    val dayMap = base.select((pcols ++ Seq(col("idx").as("day_idx"),
      col("date"), col("missing"))): _*)
    val withTs = out
      .withColumn("day_idx", (col("hpos") / stepsPerDay).cast("long"))
      .withColumn("step", col("hpos") % stepsPerDay)
      .join(dayMap, partitionCols :+ "day_idx")
      .withColumn("timestamp", timestamp_micros(
        unix_micros(col("date").cast("timestamp")) +
          col("step") * stepMicros))
      .withColumn("precip_c",
        when(col("missing"), lit(null).cast("double"))
          .otherwise(col("precip_c")))

    val ordered = withTs.select((pcols :+ col("timestamp") :+
      col("precip_c").as("precip")): _*)
    if (shift == 0) ordered
    else {
      val ws = (if (partitionCols.isEmpty) Window.orderBy(col("timestamp"))
        else Window.partitionBy(pcols: _*).orderBy(col("timestamp")))
      ordered.withColumn("precip", lag(col("precip"), shift).over(ws))
    }
  }

  // -------------------------------------------------------- calibration

  /** np.percentile(values, pct) with 'linear' interpolation, bit-matching
    * numpy's _lerp (a + (b-a)t for t<0.5, b - (b-a)(1-t) otherwise). */
  def numpyPercentile(sorted: Array[Double], pct: Double): Double = {
    require(sorted.nonEmpty)
    val pos = (sorted.length - 1) * (pct / 100.0)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    val t = pos - lo
    val d = sorted(hi) - sorted(lo)
    if (t >= 0.5) sorted(hi) - d * (1 - t) else sorted(lo) + d * t
  }

  /** Expression form of [[numpyPercentile]] over a pre-sorted double
    * array column. Identical double-operation order, so the result is
    * bit-identical to the scalar version. */
  private def numpyPercentileCol(sortedArr: Column, pct: Double): Column = {
    val pos = (size(sortedArr) - 1).cast("double") * lit(pct / 100.0)
    val lo = floor(pos)
    val t = pos - lo.cast("double")
    val vlo = element_at(sortedArr, lo.cast("int") + 1)
    val vhi = element_at(sortedArr, ceil(pos).cast("int") + 1)
    val d = vhi - vlo
    when(t >= 0.5, vhi - d * (lit(1.0) - t)).otherwise(vlo + d * t)
  }

  /** pairs (2j, 2j+1) by position; parent value = child sum, pandas NaN
    * propagation (a parent with any missing child is missing -> dry).
    * An odd trailing element is dropped (precipitation.py:441-447). */
  private def pairChildren(df: DataFrame, pcols: Seq[Column],
      w: WindowSpec): DataFrame = df
    .withColumn("rn", row_number().over(w).cast("long") - 1)
    .withColumn("pair", (col("rn") / 2).cast("long"))
    .groupBy((pcols :+ col("pair")): _*)
    .agg(count(lit(1)).as("nchild"),
      count(col("v")).as("nvalid"),
      sum(col("v")).as("vsum"),
      // deterministic child pick: even row = first child, odd = second
      max(when(col("rn") % 2 === 0, col("v"))).as("r1"),
      max(when(col("rn") % 2 === 1, col("v"))).as("r2"),
      max(col("ts")).as("ts"))
    .where(col("nchild") === 2)
    .withColumn("v", when(col("nvalid") === 2, col("vsum"))
      .otherwise(lit(null).cast("double")))
    .withColumn("idx", col("pair"))

  /** classifies wet parents by box type and below/above `meanvol`.
    * numpy quirk faithfully kept (precipitation.py:489-497): an interior
    * wet parent whose neighbour is NaN matches NO branch of the if-chain,
    * keeps vbtype=0, and `vbtype-1 == -1` wraps to the LAST column — so
    * NaN-adjacent parents are counted in the `isolated` column. */
  private def classifyParents(paired: DataFrame, w: WindowSpec,
      meanvol: Column): DataFrame = {
    val wetP = coalesce(col("v") > 0.0, lit(false))
    val prevIsNan = coalesce(lag(col("v").isNull, 1).over(w), lit(false))
    val nextIsNan = coalesce(lead(col("v").isNull, 1).over(w), lit(false))
    val btNormal = boxType(wetP,
      lag(wetP, 1).over(w), lead(wetP, 1).over(w))
    paired
      .withColumn("bt", when(prevIsNan || nextIsNan,
        CascadeStatistics.BoxTypes.isolated).otherwise(btNormal))
      .withColumn("ba", when(col("v") > meanvol, 1).otherwise(0))
      .where(col("v") > 0.0)
  }

  /** branch-type counters + 7-bin weight histogram aggregates. */
  private def countAggs: Seq[Column] = {
    val wlower = CascadeStatistics.wClassBounds.init
    val wupper = CascadeStatistics.wClassBounds.tail
    val wxxval = col("r1") / (col("r1") + col("r2"))
    val histAggs = (0 until 7).map { k =>
      sum(when(col("r1") > 0 && col("r2") > 0 &&
        wxxval > wlower(k) && wxxval <= wupper(k), 1L).otherwise(0L))
        .as(s"w$k")
    }
    Seq(
      count(lit(1)).as("nb"),
      sum(when(col("r1") <= 0 && col("r2") > 0, 1L).otherwise(0L)).as("n01"),
      sum(when(col("r1") > 0 && col("r2") <= 0, 1L).otherwise(0L)).as("n10"),
      sum(when(col("r1") > 0 && col("r2") > 0, 1L).otherwise(0L)).as("nxx")
    ) ++ histAggs
  }

  /** counts -> normalized probabilities (0/0 -> NaN like numpy) + NaN
    * repair, for the count rows of ONE station (or the global series). */
  private def statsFromCounts(counts: Seq[Row], meanvol: Double,
      pct: Double): CascadeStatistics = {
    val nb = Array.ofDim[Double](2, 4)
    val nbxx = Array.ofDim[Double](2, 4)
    val s = CascadeStatistics.zero(pct)
    counts.foreach { r =>
      val b = r.getAs[Int]("ba"); val t = r.getAs[Int]("bt") - 1
      nb(b)(t) = r.getAs[Long]("nb").toDouble
      s.p01(b)(t) = r.getAs[Long]("n01").toDouble
      s.p10(b)(t) = r.getAs[Long]("n10").toDouble
      s.pxx(b)(t) = r.getAs[Long]("nxx").toDouble
      nbxx(b)(t) = r.getAs[Long]("nxx").toDouble
      for (k <- 0 until 7) s.wxx(k)(b)(t) = r.getAs[Long](s"w$k").toDouble
    }
    for (b <- 0 until 2; t <- 0 until 4) {
      s.p01(b)(t) /= nb(b)(t); s.p10(b)(t) /= nb(b)(t)
      s.pxx(b)(t) /= nb(b)(t)
      for (k <- 0 until 7) s.wxx(k)(b)(t) /= nbxx(b)(t)
    }
    repair(s.copy(threshold = Array(meanvol), percentile = pct))
  }

  /** Paired + classified wet parents of ONE aggregation step with the
    * wet-volume threshold SUPPLIED rather than derived — the
    * intermediate the calibration count matrices aggregate over,
    * exposed so a streaming twin (StreamingAgg.cascadeClassifyStream)
    * can be proven equal to the batch classification, and so users can
    * inspect per-pair classes. Input shape as [[aggregateStep]]
    * (idx, v, ts). Returns one row per WET parent:
    * (idx/pair, v, r1, r2, ba, bt). */
  def classifiedPairs(df: DataFrame, meanvol: Double,
      partitionCols: Seq[String] = Nil): DataFrame = {
    if (partitionCols.isEmpty)
      graft.core.ScaleGuard.unpartitionedWindow(df,
        "Cascade.classifiedPairs")
    val pcols = partitionCols.map(col)
    val w = (if (partitionCols.isEmpty) Window.orderBy(col("idx"))
      else Window.partitionBy(pcols: _*).orderBy(col("idx")))
    classifyParents(pairChildren(df, pcols, w), w, lit(meanvol))
      .select((pcols ++ Seq(col("pair"), col("v"), col("r1"),
        col("r2"), col("ba"), col("bt"))): _*)
  }

  /** One aggregation (halving) step over a single series: pairs children,
    * classifies parents, counts branch types and weight histogram, returns
    * (statistics, parent frame for the next level). */
  def aggregateStep(df: DataFrame, pct: Double,
      partitionCols: Seq[String] = Nil)
      : (CascadeStatistics, DataFrame) = {
    if (partitionCols.isEmpty)
      graft.core.ScaleGuard.unpartitionedWindow(df,
        "Cascade.aggregateStep")
    val pcols = partitionCols.map(col)
    val w = (if (partitionCols.isEmpty) Window.orderBy(col("idx"))
      else Window.partitionBy(pcols: _*).orderBy(col("idx")))
    val paired = pairChildren(df, pcols, w)

    // np.percentile('linear') bit-exact (incl. numpy's _lerp switch at
    // t >= 0.5) — an ulp-off threshold flips boundary classifications.
    // Calibration-scale collect: wet parent count ≤ wet hours per station.
    val wetVals = paired.where(col("v") > 0).select(col("v"))
      .sort(col("v")).collect().map(_.getDouble(0))
    val meanvol = numpyPercentile(wetVals, pct)

    val classified = classifyParents(paired, w, lit(meanvol))
    val aggs = countAggs
    val counts = classified.groupBy(col("ba"), col("bt"))
      .agg(aggs.head, aggs.tail: _*).collect()

    (statsFromCounts(counts.toSeq, meanvol, pct),
      paired.select((pcols ++ Seq(col("idx"), col("v"), col("ts"))): _*))
  }

  /** Multi-station halving step: the wet-value percentile threshold and
    * the branch/weight counts are computed PER STATION, distributed (the
    * reference calibrates each station independently — a global threshold
    * would mix climates). The per-station sorted wet-value array is
    * bounded by one station's wet steps (years × 8760 at hourly), and the
    * driver receives only #stations × ≤8 count rows plus one threshold
    * row per station. Map keys are the station key values as strings. */
  def aggregateStepPerStation(df: DataFrame, pct: Double,
      partitionCols: Seq[String])
      : (Map[Seq[String], CascadeStatistics], Map[Seq[String], Long],
         DataFrame) = {
    require(partitionCols.nonEmpty,
      "aggregateStepPerStation needs partitionCols")
    val pcols = partitionCols.map(col)
    val w = Window.partitionBy(pcols: _*).orderBy(col("idx"))
    val paired = pairChildren(df, pcols, w).localCheckpoint(true)

    // ONE aggregation pass per level carries both the per-station sorted
    // wet values (threshold input; collect_list skips the nulls the
    // `when` emits for dry boxes) and the total parent-box count (the
    // build_casc level weight) — checkpointed tiny (one row/station) so
    // the collect and the broadcast join below don't re-aggregate.
    val thrAndN = paired
      .groupBy(pcols: _*)
      .agg(sort_array(collect_list(when(col("v") > 0, col("v"))))
          .as("vs"),
        count(lit(1)).as("np"))
      .select((pcols :+
        when(size(col("vs")) > 0, numpyPercentileCol(col("vs"), pct))
          .as("meanvol") :+ col("np")): _*)
      .localCheckpoint(true)

    val withThr = paired.join(
      broadcast(thrAndN.select((pcols :+ col("meanvol")): _*)),
      partitionCols, "left")
    val classified = classifyParents(withThr, w, col("meanvol"))
    val aggs = countAggs
    val counts = classified
      .groupBy((pcols ++ Seq(col("ba"), col("bt"))): _*)
      .agg(aggs.head, aggs.tail: _*).collect()

    def key(r: Row): Seq[String] =
      partitionCols.map(c => String.valueOf(r.getAs[Any](c)))
    val collected = thrAndN.collect()
    val thrByStation = collected.map { r =>
      val i = partitionCols.length
      key(r) -> (if (r.isNullAt(i)) Double.NaN else r.getDouble(i))
    }.toMap
    val nByStation = collected
      .map(r => key(r) -> r.getAs[Long]("np")).toMap
    val statsByStation = counts.groupBy(key).map { case (k, rows) =>
      // a station with no wet parents never reaches `counts`; stations in
      // thr but absent here fall through to repair()'s sample-data path
      k -> statsFromCounts(rows.toSeq,
        thrByStation.getOrElse(k, Double.NaN), pct)
    }
    (statsByStation, nByStation,
      paired.select((pcols ++ Seq(col("idx"), col("v"), col("ts"))): _*))
  }

  /** NaN fallbacks (precipitation.py:566-602): invalid branching
    * probabilities -> sample data; undefined weight bins -> 1/7. */
  private def repair(s: CascadeStatistics): CascadeStatistics = {
    def anyNaN2(m: Array[Array[Double]]) = m.exists(_.exists(_.isNaN))
    if (anyNaN2(s.p01) || anyNaN2(s.p10) || anyNaN2(s.pxx)) {
      val sd = CascadeStatistics.sampleData(s.percentile)
      sd.copy(threshold = s.threshold)
    } else if (s.wxx.exists(anyNaN2)) {
      val fixed = s.copy(wxx = s.wxx.map(_.map(_.map(v =>
        if (v.isNaN) 1.0 / 7.0 else v))))
      fixed
    } else s
  }

  /** build_casc (precipitation.py:631-702): per season, iterate the
    * halving aggregation over the levels, box-count-weight the per-level
    * statistics into one average (avgStats) or keep the per-level list.
    * `obsHourly`: (partitionCols…, timestamp, precip) at hourly (or 5-min)
    * resolution. */
  def buildCasc(obsHourly: DataFrame, hourly: Boolean = true,
      level: Int = 9, monthsSeasons: Seq[Seq[Int]] = Seq((1 to 12)),
      avgStats: Boolean = true, percentile: Double = 50,
      partitionCols: Seq[String] = Nil)
      : Seq[Either[CascadeStatistics, Seq[CascadeStatistics]]] = {
    val pcols = partitionCols.map(col)
    monthsSeasons.map { months =>
      // nulls stay null: the reference's fillna(0) writes to a copy and
      // its NaNs flow through calibration as "dry" (precipitation.py:663)
      val subset = TimeSeries
        .seasonalSubset(obsHourly, "timestamp", months)
        .withColumn("v", col("precip"))
        .withColumn("ts", col("timestamp"))
      val w = (if (partitionCols.isEmpty) Window.orderBy(col("ts"))
        else Window.partitionBy(pcols: _*).orderBy(col("ts")))
      var cur = subset
        .withColumn("idx", row_number().over(w).cast("long") - 1)
        .select((pcols ++ Seq(col("idx"), col("v"), col("ts"))): _*)

      val aggreLevel = if (hourly) 5 else level
      var total = CascadeStatistics.zero(percentile)
      val perLevel = Seq.newBuilder[CascadeStatistics]
      val thresholds = Array.ofDim[Double](aggreLevel)
      var count = 0L
      for (i <- 0 until aggreLevel) {
        val (si, parent) = aggregateStep(cur, percentile, partitionCols)
        cur = parent.localCheckpoint(true)
        thresholds(i) = si.threshold(0)
        perLevel += si
        val n = cur.count()
        total = total.plus(si.scaled(n.toDouble))
        count += n
      }
      total = total.scaled(1.0 / count)
      total = total.copy(threshold = thresholds)
      if (avgStats) Left(total)
      // deepest-first list so that disaggregate's downward walk indexes
      // list(si) after the reference's in-loop decrement
      else Right(perLevel.result())
    }
  }

  /** Per-station build_casc: like [[buildCasc]], but every station keyed
    * by `partitionCols` is calibrated INDEPENDENTLY (its own percentile
    * thresholds, branch probabilities, and weight histograms — the
    * reference calibrates one station at a time) while the cluster runs
    * one set of distributed passes per level for the whole fleet, not one
    * job per station. Returns station key (values as strings) ->
    * per-season results, consumable by [[disaggregatePerStation]].
    * A station with no wet boxes at some level (or absent from a season)
    * falls back to the reference's sample-data statistics, mirroring
    * [[repair]]'s fallback for uncalibratable series. */
  def buildCascPerStation(obsHourly: DataFrame, hourly: Boolean = true,
      level: Int = 9, monthsSeasons: Seq[Seq[Int]] = Seq((1 to 12)),
      avgStats: Boolean = true, percentile: Double = 50,
      partitionCols: Seq[String] = Nil)
      : Map[Seq[String],
          Seq[Either[CascadeStatistics, Seq[CascadeStatistics]]]] = {
    require(partitionCols.nonEmpty,
      "buildCascPerStation needs partitionCols")
    import scala.collection.mutable
    val pcols = partitionCols.map(col)
    val aggreLevel = if (hourly) 5 else level
    val allStations = mutable.LinkedHashSet[Seq[String]]()

    val perSeason = monthsSeasons.map { months =>
      val subset = TimeSeries
        .seasonalSubset(obsHourly, "timestamp", months)
        .withColumn("v", col("precip"))
        .withColumn("ts", col("timestamp"))
      val w = Window.partitionBy(pcols: _*).orderBy(col("ts"))
      var cur = subset
        .withColumn("idx", row_number().over(w).cast("long") - 1)
        .select((pcols ++ Seq(col("idx"), col("v"), col("ts"))): _*)

      val totals = mutable.Map[Seq[String], CascadeStatistics]()
      val boxCounts = mutable.Map[Seq[String], Long]()
      val thresholds = mutable.Map[Seq[String], Array[Double]]()
      val levels = mutable.Map[Seq[String], Array[CascadeStatistics]]()
      for (i <- 0 until aggreLevel) {
        val (statsMap, nByStation, parent) =
          aggregateStepPerStation(cur, percentile, partitionCols)
        cur = parent
        statsMap.foreach { case (k, si) =>
          allStations += k
          val n = nByStation.getOrElse(k, 0L)
          thresholds.getOrElseUpdate(k,
            Array.fill(aggreLevel)(Double.NaN))(i) = si.threshold(0)
          levels.getOrElseUpdate(k,
            Array.fill[CascadeStatistics](aggreLevel)(null))(i) = si
          totals(k) = totals.getOrElse(k,
            CascadeStatistics.zero(percentile)).plus(si.scaled(n.toDouble))
          boxCounts(k) = boxCounts.getOrElse(k, 0L) + n
        }
      }
      levels.keys.map { k =>
        k -> (if (avgStats) {
          Left(totals(k).scaled(1.0 / boxCounts(k))
            .copy(threshold = thresholds(k)))
        } else {
          Right(levels(k).map(s => if (s == null)
            CascadeStatistics.sampleData(percentile) else s).toSeq)
        }): (Seq[String], Either[CascadeStatistics, Seq[CascadeStatistics]])
      }.toMap
    }

    allStations.iterator.map { k =>
      k -> perSeason.map(_.getOrElse(k,
        if (avgStats) Left(CascadeStatistics.sampleData(percentile))
        else Right(Seq.fill(aggreLevel)(
          CascadeStatistics.sampleData(percentile)))))
    }.toMap
  }
}
