package graft.disagg

import graft.core.TimeSeries
import graft.meteo.Meteo
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Radiation disaggregation (melodist/radiation.py:32-101): hourly profile
  * = pot_rad / daily_mean(pot_rad) * R_day, with R_day from observed daily
  * glob, Angstroem (sunshine duration), or Bristow-Campbell (temperature
  * range); `mean_course` replaces pot_rad by the monthly mean course.
  * Final small-value zeroing (< 1e-2 -> 0). */
object Radiation {

  /** `daily` carries (date, glob | ssd+daylength | tmin+tmax per method).
    * `potRad`: hourly (timestamp, pot_rad) — typically
    * Meteo.potentialRadiation over the hourly index; for method
    * mean_course pass `meanCourse` (month, hour, value) instead.
    * Returns (partitionCols…, timestamp, glob).
    */
  def disaggregate(daily: DataFrame, method: String = "pot_rad",
      potRad: DataFrame = null, meanCourse: DataFrame = null,
      angstrA: Double = 0.25, angstrB: Double = 0.5,
      bristcampA: Double = 0.75, bristcampC: Double = 2.4,
      partitionCols: Seq[String] = Nil): DataFrame = {
    val pcols = partitionCols.map(col)
    val joinKeys = partitionCols :+ "date"

    // hourly potential radiation profile
    val pot: DataFrame = method match {
      case "mean_course" =>
        require(meanCourse != null)
        val valueCol = meanCourse.columns
          .filterNot(c => c == "month" || c == "hour").head
        TimeSeries.explodeDays(daily.select((pcols :+ col("date")): _*),
            "date", 24, 3600L * 1000000L)
          .withColumn("month", month(col("timestamp")))
          .withColumn("hour", hour(col("timestamp")))
          .join(broadcast(meanCourse.select(col("month"), col("hour"),
            col(valueCol).as("pot_rad"))), Seq("month", "hour"), "left")
          .select((pcols :+ col("timestamp") :+ col("pot_rad")): _*)
      case _ =>
        require(potRad != null, "potRad hourly frame required")
        potRad
    }

    val potDaily = pot
      .groupBy((pcols :+ to_date(col("timestamp")).as("date")): _*)
      .agg(avg(col("pot_rad")).as("pot_rad_daily"))

    // daily target radiation R_day
    val rDay: DataFrame = method match {
      case "pot_rad" | "mean_course" =>
        daily.select((pcols :+ col("date") :+ col("glob").as("r_day")): _*)
      case "pot_rad_via_ssd" =>
        // Angstroem only on days with daylength > 0 (polar nights -> 0)
        daily.join(potDaily, joinKeys, "left")
          .select((pcols :+ col("date") :+
            when(col("daylength") > 0,
              Meteo.angstroem(col("ssd"), col("daylength"),
                col("pot_rad_daily"), lit(angstrA), lit(angstrB)))
              .otherwise(0.0).as("r_day")): _*)
      case "pot_rad_via_bc" =>
        val withPot = daily.join(potDaily, joinKeys, "left")
        Meteo.bristowCampbell(withPot, "date", "tmin", "tmax",
            "pot_rad_daily", Left(bristcampA), Left(bristcampC),
            partitionCols)
          .select((pcols :+ col("date") :+ col("r0").as("r_day")): _*)
      case other => throw new IllegalArgumentException(other)
    }

    pot.withColumn("date", to_date(col("timestamp")))
      .join(potDaily, joinKeys, "left")
      .join(rDay, joinKeys, "left")
      .withColumn("glob_disagg",
        col("pot_rad") / col("pot_rad_daily") * col("r_day"))
      .withColumn("glob_disagg",
        when(col("glob_disagg") < 1e-2, 0.0).otherwise(col("glob_disagg")))
      .select((pcols :+ col("timestamp") :+ col("glob_disagg").as("glob")): _*)
  }
}
