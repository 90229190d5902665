package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming re-expressions of the batch aggregations
  * (SURVEY.md §2.9 stretch goal): hourly observations arriving as a
  * stream roll up into the same daily frame `daily_from_hourly` produces
  * in batch — event-time windows + watermark, so state is bounded and
  * late data within the watermark folds in correctly at any scale. */
object StreamingAgg {

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
}
