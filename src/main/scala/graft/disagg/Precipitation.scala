package graft.disagg

import graft.core.TimeSeries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Precipitation disaggregation dispatcher + the deterministic methods
  * (melodist/precipitation.py:32-71, 375-413). The cascade model lives in
  * graft.cascade. */
object Precipitation {

  /** equal: daily/24 replicated (mass-preserving). */
  def equal(daily: DataFrame, partitionCols: Seq[String] = Nil): DataFrame =
    TimeSeries.distributeEquallyPartitioned(daily, "date", "precip",
      divide = true, partitionCols)

  /** masterstation (precipitation.py:375-413): scale the master station's
    * hourly profile to the local daily total; zero/NaN master day sums
    * fall back to uniform 1/24 (zerodiv="uniform") or 0.
    *
    * Scale shape: one date-keyed join, no windows — safe at any size. */
  def masterStation(daily: DataFrame, masterHourly: DataFrame,
      zerodiv: String = "uniform", partitionCols: Seq[String] = Nil)
      : DataFrame = {
    val pcols = partitionCols.map(col)
    val joinKeys = partitionCols :+ "date"
    val masterDaily = masterHourly
      .groupBy((pcols :+ to_date(col("timestamp")).as("date")): _*)
      .agg(coalesce(sum(col("precip")), lit(0.0)).as("master_day_sum"))
    val hourly = masterHourly
      .select((pcols :+ col("timestamp") :+
        col("precip").as("master_precip")): _*)
      .withColumn("date", to_date(col("timestamp")))
    val fallback = if (zerodiv == "uniform")
      col("precip") / 24.0 else lit(0.0)
    // note: join master hourly against the local daily frame so only local
    // days are emitted (hourly_index over precip_daily in the reference)
    daily.select((pcols :+ col("date") :+ col("precip")): _*)
      .join(hourly, joinKeys, "inner")
      .join(masterDaily, joinKeys, "left")
      .withColumn("precip_disagg",
        when(col("master_day_sum") =!= 0.0,
          col("master_precip") / col("master_day_sum") * col("precip"))
        .otherwise(fallback))
      .select((pcols :+ col("timestamp") :+
        col("precip_disagg").as("precip")): _*)
  }
}
