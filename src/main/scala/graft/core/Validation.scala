package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Input validation mirroring the reference's asserts
  * (melodist/station.py:82-96): hourly/daily index expectations and the
  * Kelvin plausibility check. One aggregate pass each — no collects of
  * data rows. */
object Validation {

  /** temperatures below 200 K are implausible (a °C/K unit mix-up);
    * station.py:92-96 rejects them at ingest. */
  def assertPlausibleTemps(df: DataFrame,
      cols: Seq[String] = Seq("temp", "tmean", "tmin", "tmax")): Unit = {
    val present = cols.filter(df.columns.contains)
    if (present.nonEmpty) {
      val bad = df.where(present.map(c => col(c) < 200.0)
        .reduce(_ || _)).limit(1).count()
      require(bad == 0,
        s"implausible temperature < 200 K — are units Kelvin? " +
          s"(checked: ${present.mkString(", ")})")
    }
  }

  /** daily frames must be gap-free calendars (station.py:86-90 reindexes;
    * here we verify instead of silently fixing). */
  def assertCompleteDaily(df: DataFrame, dateCol: String = "date",
      partitionCols: Seq[String] = Nil): Unit = {
    val gaps = TimeSeries.gaps(df, dateCol, 86400L, partitionCols)
      .limit(1).count()
    require(gaps == 0, s"daily frame has calendar gaps in $dateCol")
  }

  /** hourly series should step by exactly one hour. */
  def assertHourlySteps(df: DataFrame, tsCol: String = "timestamp",
      partitionCols: Seq[String] = Nil): Unit = {
    val gaps = TimeSeries.gaps(df, tsCol, 3600L, partitionCols)
      .limit(1).count()
    require(gaps == 0, s"hourly series has irregular steps in $tsCol")
  }
}
