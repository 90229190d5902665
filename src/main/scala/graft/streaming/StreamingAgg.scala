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
  * The window-shaped methods (temperature's prev/next-day extremes,
  * humidity, cascade) are calendar-stateful and stay batch.
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
