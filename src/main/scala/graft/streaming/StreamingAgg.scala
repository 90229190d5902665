package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Structured-Streaming re-expressions of the batch aggregations
  * (SURVEY.md §2.9 stretch goal): hourly observations arriving as a
  * stream.
  *
  * The window-free disaggregators need no re-expression at all: wind
  * equal/cosine/random and precip equal are pure per-daily-row
  * explode + scalar expressions (no windows, no cross-day state), so
  * the BATCH operators — `Wind.disaggregate`, `Precipitation.equal` —
  * run unchanged on a streaming daily feed in append mode with the
  * exact same plan (StreamingAggSpec proves stream ≡ batch on them).
  * The window-shaped disaggregation methods (temperature's
  * prev/next-day extremes, humidity) are calendar-stateful and stay
  * batch; the cascade's CALIBRATION half streams via
  * [[cascadeClassifyStream]] (given a threshold from a prior
  * calibration), its stochastic disaggregation half stays batch.
  *
  * Hourly observations arriving as a stream roll up into the same
  * daily frame `daily_from_hourly` produces in batch — event-time
  * windows + watermark, so state is bounded and late data within the
  * watermark folds in correctly at any scale. */
object StreamingAgg {

  /** Streaming sessionization: Spark's native `session_window` — the
    * event-time twin of the batch `TimeSeries.sessionize`, aggregated
    * to one row per session. Boundary caveat: `session_window`'s
    * half-open [ts, ts+gap) windows put an event EXACTLY `gap` after
    * its predecessor in a NEW session, while the batch operator's
    * `gap > threshold` test keeps it in the same one — equal
    * everywhere except that exact boundary. Watermark bounds the
    * session state; sessions emit in append mode once the watermark
    * passes their close. */
  def sessionStream(events: DataFrame, tsCol: String,
      keyCols: Seq[String], gap: String,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(keyCols.map(col) :+
        session_window(col(tsCol), gap).as("session"): _*)
      .agg(count(lit(1)).as("n_events"))
      .select(keyCols.map(col) ++ Seq(
        col("session.start").as("session_start"),
        col("session.end").as("session_end"),
        col("n_events")): _*)

  /** Streaming daily_from_hourly: tumbling 1-day event-time windows over
    * a (timestamp, temp/precip/hum/wind/glob…) stream. Append mode after
    * the watermark closes a day. */
  def dailyFromHourlyStream(hourly: DataFrame,
      watermark: String = "2 hours",
      tsCol: String = "timestamp"): DataFrame = {
    val cols = hourly.columns.toSet
    val aggs = Seq.newBuilder[org.apache.spark.sql.Column]
    if (cols("temp")) aggs ++= Seq(avg("temp").as("temp"),
      min("temp").as("tmin"), max("temp").as("tmax"))
    if (cols("precip")) aggs += sum("precip").as("precip")
    if (cols("glob")) aggs += avg("glob").as("glob")
    if (cols("hum")) aggs ++= Seq(avg("hum").as("hum"),
      min("hum").as("hum_min"), max("hum").as("hum_max"))
    if (cols("wind")) aggs += avg("wind").as("wind")
    val built = aggs.result()
    hourly
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 day").as("w"))
      .agg(built.head, built.tail: _*)
      .withColumn("date", to_date(col("w.start")))
      .drop("w")
  }

  /** Streaming gap monitor: counts per-day arrivals so missing hours show
    * up as counts < 24 once the day closes. */
  def completenessStream(hourly: DataFrame, watermark: String = "2 hours",
      tsCol: String = "timestamp"): DataFrame =
    hourly
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 day").as("w"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("date", to_date(col("w.start")))
      .withColumn("complete", col("n_rows") >= 24)
      .drop("w")

  /** Streaming exact dedup for a document firehose: first occurrence of
    * each fingerprint wins, duplicates within the watermark horizon are
    * dropped — state stays bounded (fingerprints expire with the
    * watermark), so this holds up on an unbounded 100 TB/day feed where
    * a batch distinct() could not. */
  def dedupStream(docs: DataFrame, fingerprintCol: String,
      tsCol: String = "timestamp", watermark: String = "1 hour")
      : DataFrame =
    docs.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq(fingerprintCol))

  case class PrecipObs(station: String, ts: java.sql.Timestamp,
      v: Option[Double])
  case class PendingPair(idx: Long, v: Option[Double],
      r1: Option[Double], r2: Option[Double])
  case class CascadePairState(pendingHour: Option[Long],
      pendingV: Option[Double], pair: Option[PendingPair],
      prevWet: Boolean, prevNan: Boolean)
  case class ClassifiedPair(station: String, pair: Long, v: Double,
      r1: Double, r2: Double, ba: Int, bt: Int)

  private def wetOpt(v: Option[Double]): Boolean = v.exists(_ > 0)

  /** Streaming twin of the cascade calibration's classification stage
    * (the data-scale half of `Cascade.aggregateStep`): hourly
    * precipitation arriving as a stream is paired into 2-hour parents
    * and every WET parent is classified into the (ba, bt) calibration
    * cell — exactly `Cascade.classifiedPairs` with the wet-volume
    * threshold supplied from a previous calibration (the percentile
    * itself is a full-data quantile, calibration-scale, not part of
    * the incremental path). Downstream, the count matrices are one
    * streaming groupBy over these rows.
    *
    * State per station is O(1): the half-built pair, the last complete
    * pair (a parent classifies once its SUCCESSOR's wetness is known —
    * one-pair lookahead), and the predecessor's wetness/NaN flags. The
    * numpy NaN quirk is kept: a NaN-adjacent wet parent lands in the
    * `isolated` column.
    *
    * Contract (mirrors the batch positional pairing): a gap-free
    * hourly grid starting on an even epoch hour; rows inside a batch
    * are sorted by event time, cross-batch order follows arrival
    * (monitor semantics, like `gapStream`); grid violations fail
    * loudly. A bounded replay flushes its final parent by appending
    * one dry sentinel pair past the end — equivalent to the batch
    * operator's lead=false at the series edge. */
  def cascadeClassifyStream(obs: Dataset[PrecipObs], meanvol: Double)
      : Dataset[ClassifiedPair] = {
    import obs.sparkSession.implicits._
    // capture the box-type codes as plain Ints: a reference to the
    // BoxTypes object would drag the (non-serializable) enclosing
    // companion into the task closure
    val (starting, enclosed, ending, isolated) = {
      val t = graft.cascade.CascadeStatistics.BoxTypes
      (t.starting, t.enclosed, t.ending, t.isolated)
    }
    obs.groupByKey(_.station)
      .flatMapGroupsWithState[CascadePairState, ClassifiedPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (station: String, rows: Iterator[PrecipObs],
            state: GroupState[CascadePairState]) =>
          var st = state.getOption.getOrElse(
            CascadePairState(None, None, None, prevWet = false,
              prevNan = false))
          val out = Seq.newBuilder[ClassifiedPair]
          rows.toArray.sortBy(_.ts.getTime).foreach { o =>
            val h = o.ts.getTime / 3600000L
            st.pendingHour match {
              case None =>
                if (h % 2 != 0) throw new IllegalStateException(
                  s"pair must start on an even epoch hour (got $h)")
                st = st.copy(pendingHour = Some(h), pendingV = o.v)
              case Some(ph) =>
                if (h != ph + 1) throw new IllegalStateException(
                  s"gap in hourly grid: hour $h after $ph")
                val r1 = st.pendingV; val r2 = o.v
                val v = for (a <- r1; b <- r2) yield a + b
                val cur = PendingPair(ph / 2, v, r1, r2)
                st.pair.foreach { q =>
                  q.v.filter(_ > 0).foreach { qv =>
                    val nextWet = wetOpt(cur.v)
                    val nextNan = cur.v.isEmpty
                    val bt =
                      if (st.prevNan || nextNan) isolated
                      else if (!st.prevWet && nextWet) starting
                      else if (st.prevWet && nextWet) enclosed
                      else if (st.prevWet && !nextWet) ending
                      else isolated
                    out += ClassifiedPair(station, q.idx, qv,
                      q.r1.get, q.r2.get,
                      if (qv > meanvol) 1 else 0, bt)
                  }
                  st = st.copy(prevWet = wetOpt(q.v),
                    prevNan = q.v.isEmpty)
                }
                st = st.copy(pair = Some(cur), pendingHour = None,
                  pendingV = None)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class Obs(station: String, ts: java.sql.Timestamp, value: Double)
  case class GapEvent(station: String, gap_start: java.sql.Timestamp,
      gap_end: java.sql.Timestamp, gap_seconds: Long)
  case class LastSeen(ts: Long)

  /** Stateful streaming gap detection (the streaming twin of
    * TimeSeries.gaps): per-station custom state via
    * flatMapGroupsWithState keeps only the last-seen stamp per station
    * and emits a GapEvent the moment a batch's arrivals jump more than
    * `stepSeconds`. State size = #stations, independent of stream
    * length. Rows inside one batch are sorted by event time; ordering
    * across batches follows arrival, matching monitor semantics. */
  def gapStream(obs: Dataset[Obs], stepSeconds: Long)
      : Dataset[GapEvent] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.station)
      .flatMapGroupsWithState[LastSeen, GapEvent](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (station: String, rows: Iterator[Obs],
            state: GroupState[LastSeen]) =>
          val sorted = rows.map(_.ts.getTime / 1000L).toArray.sorted
          val events = Seq.newBuilder[GapEvent]
          var last = state.getOption.map(_.ts)
          sorted.foreach { t =>
            last.foreach { p =>
              if (t - p != stepSeconds)
                events += GapEvent(station,
                  new java.sql.Timestamp(p * 1000L),
                  new java.sql.Timestamp(t * 1000L), t - p)
            }
            last = Some(t)
          }
          last.foreach(t => state.update(LastSeen(t)))
          events.result().iterator
      }
  }
}
