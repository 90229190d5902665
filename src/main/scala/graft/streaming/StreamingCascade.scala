package graft.streaming

import graft.cascade.{Cascade, CascadeStatistics}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the cascade GENERATION path
  * ([[Cascade.disaggregate]], hourly): daily precipitation arriving as
  * a stream per station is disaggregated to hourly with EXACTLY the
  * batch operator's draws and branching — stream ≡ batch bit-for-bit.
  *
  * Why it is possible with bounded state: at each cascade level a box's
  * branching looks at its ±1 neighbor's wetness. Boxes halve per level,
  * so the influence cone of one emitted day reaches at most
  * Σ_{l≥1} 2^-l < 1 day of box-span left and right, plus the RAW daily
  * wetness one day further (the level-1 position classes read the
  * neighboring daily values directly). Hence day D's hourly output is a
  * pure function of the raw daily values of days D-2..D+2 and the
  * deterministic hash draws — a 5-day sliding window, O(1) state per
  * station, regardless of series length. Day D finalizes when day D+2
  * arrives (two-day emission lag, the watermark-style price of the
  * lead dependency); the first two days of a series finalize with the
  * same truncated windows the batch operator sees at the series start,
  * so emitted rows never change when later data arrives.
  *
  * The per-window computation is a plain-Scala twin of the batch
  * level loop (same IEEE operation order, same xxhash64 draw stream via
  * Catalyst's own `XxHash64Function`, same quarter-sum order), which is
  * what StreamingCascadeSpec pins: stream rows == batch rows, exactly.
  *
  * Contract (mirrors [[StreamingAgg.gapStream]]): per station the daily
  * grid is gap-free and arrives in order across micro-batches (rows
  * inside a batch are sorted by date here); a calendar gap fails
  * loudly. Missing VALUES are fine — they run through the cascade as
  * zero and surface as null hours, exactly as in batch. Hourly path
  * (level 5), single global statistics, shift = 0. */
object StreamingCascade {

  case class DailyPrecip(station: String, date: java.sql.Date,
      precip: Option[Double])
  case class HourlyPrecip(station: String, timestamp: java.sql.Timestamp,
      precip: Option[Double])

  private[streaming] case class BufDay(idx: Long, epochDay: Long,
      precip: Option[Double])
  case class CascGenState(buf: List[BufDay])

  /** Exact Scala twin of [[graft.disagg.Wind.uniformHash]] (the
    * production draw): xxhash64 over (seed, idx, station) with
    * Catalyst's own hash kernel, pmod into (0, 1). */
  private[streaming] def uniformHashLocal(seed: Long, idx: Long,
      station: String): Double = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.{LongType, StringType}
    var h = 42L
    h = XxHash64Function.hash(seed, LongType, h)
    h = XxHash64Function.hash(idx, LongType, h)
    h = XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(station),
      StringType, h)
    val r = h % Long.MaxValue
    val m = if (r < 0) r + Long.MaxValue else r
    (m.toDouble + 1.0) / (Long.MaxValue.toDouble + 2.0)
  }

  /** Run the 5-level hourly cascade over a bounded day window with
    * GLOBAL day indices (so draws match the batch series), returning
    * each window day's 24 hourly sums. Window-edge boxes see a `false`
    * neighbor where the window truncates — only the emitted CENTER day
    * is read by the caller, and the cone bound above guarantees edge
    * truncation cannot reach it. */
  private[streaming] def localWindowCascade(days: IndexedSeq[BufDay],
      stats: CascadeStatistics, seed: Long, station: String)
      : IndexedSeq[Array[Double]] = {
    val cum = stats.wxxCum
    val centers = CascadeStatistics.wClassCenters
    var idxs = days.map(_.idx).toArray
    var vs = days.map(_.precip.getOrElse(0.0)).toArray
    var siVar = 5
    var l = 1
    while (l <= 5) {
      siVar -= 1
      val thr = stats.threshold(siVar)
      val n = vs.length
      val nIdxs = Array.ofDim[Long](2 * n)
      val nVs = Array.ofDim[Double](2 * n)
      var i = 0
      while (i < n) {
        val v = vs(i)
        var c0 = 0.0
        var c1 = 0.0
        if (v > 0.0) {
          val pWet = i > 0 && vs(i - 1) > 0.0
          val nWet = i < n - 1 && vs(i + 1) > 0.0
          val bt =
            if (!pWet && nWet) 1 else if (pWet && nWet) 2
            else if (pWet && !nWet) 3 else 4
          val ba = if (v > thr) 1 else 0
          val rndp = uniformHashLocal(seed * 31 + l, idxs(i), station)
          val p01 = stats.p01(ba)(bt - 1)
          val p10 = stats.p10(ba)(bt - 1)
          if (rndp <= p01) { c1 = v }
          else if (rndp <= p01 + p10) { c0 = v }
          else {
            val rndw =
              uniformHashLocal(seed * 31 + l + 7919, idxs(i), station)
            var w1 = centers(6)
            var k = 0
            var found = false
            while (k < 7 && !found) {
              if (rndw <= cum(k)(ba)(bt - 1)) { w1 = centers(k); found = true }
              k += 1
            }
            c0 = w1 * v; c1 = (1.0 - w1) * v
          }
        }
        nIdxs(2 * i) = idxs(i) * 2; nVs(2 * i) = c0
        nIdxs(2 * i + 1) = idxs(i) * 2 + 1; nVs(2 * i + 1) = c1
        i += 1
      }
      idxs = nIdxs; vs = nVs
      l += 1
    }
    // 32 boxes/day -> 96 thirds -> hours sum their 4 quarter-steps in
    // ascending order (the batch posexplode/groupBy fold order)
    days.indices.map { d =>
      val base = d * 32
      val hours = Array.ofDim[Double](24)
      var q = 0
      while (q < 96) {
        hours(q / 4) += vs(base + q / 3) / 3.0
        q += 1
      }
      hours
    }
  }

  def cascadeGenerateStream(daily: Dataset[DailyPrecip],
      stats: CascadeStatistics, seed: Long = 42L)
      : Dataset[HourlyPrecip] = {
    import daily.sparkSession.implicits._
    daily.groupByKey(_.station)
      .flatMapGroupsWithState[CascGenState, HourlyPrecip](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (station: String, rows: Iterator[DailyPrecip],
            state: GroupState[CascGenState]) =>
          var buf = state.getOption.map(_.buf).getOrElse(Nil) // oldest-first
          val out = Seq.newBuilder[HourlyPrecip]
          rows.toArray.sortBy(_.date.toLocalDate.toEpochDay).foreach { r =>
            val ed = r.date.toLocalDate.toEpochDay
            val idx = buf.lastOption match {
              case Some(last) =>
                if (ed != last.epochDay + 1) throw new IllegalStateException(
                  s"gap in daily grid for $station: epoch day $ed " +
                    s"after ${last.epochDay}")
                last.idx + 1
              case None => 0L
            }
            buf = (buf :+ BufDay(idx, ed, r.precip)).takeRight(5)
            if (idx >= 2) {
              // finalize day idx-2 over its (possibly series-start
              // truncated) 5-day window [idx-4 .. idx]
              val window = buf.toIndexedSeq
              val emitPos = window.indexWhere(_.idx == idx - 2)
              val hourly =
                localWindowCascade(window, stats, seed, station)(emitPos)
              val day = window(emitPos)
              var h = 0
              while (h < 24) {
                out += HourlyPrecip(station,
                  new java.sql.Timestamp(
                    (day.epochDay * 86400L + h * 3600L) * 1000L),
                  if (day.precip.isEmpty) None else Some(hourly(h)))
                h += 1
              }
            }
          }
          state.update(CascGenState(buf))
          out.result().iterator
      }
  }
}
