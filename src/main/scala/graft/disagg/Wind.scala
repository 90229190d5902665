package graft.disagg

import graft.core.TimeSeries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wind disaggregation (melodist/wind.py:28-72): equal replication,
  * calibrated cosine diurnal course, or stochastic Weibull-ish scaling.
  * The `random` method uses a hash-derived uniform so results are
  * deterministic under any partitioning/retry (SURVEY.md §4). */
object Wind {

  /** `daily`: (date, wind). Returns (partitionCols…, timestamp, wind).
    * `draw` maps (seed, key columns) to a (0,1) uniform for the
    * `random` method — xxhash64 in production; oracle twins pass a
    * cross-engine hash (md5), the same pluggable-draw pattern as
    * [[graft.cascade.Cascade.disaggregate]]. */
  def disaggregate(daily: DataFrame, method: String = "equal",
      a: Double = Double.NaN, b: Double = Double.NaN,
      tShift: Double = Double.NaN, seed: Long = 42L,
      partitionCols: Seq[String] = Nil,
      draw: (Long, Seq[org.apache.spark.sql.Column]) =>
        org.apache.spark.sql.Column = uniformHash(_, _: _*)): DataFrame = {
    val pcols = partitionCols.map(col)
    val hourly = TimeSeries.explodeDays(daily, "date", 24, 3600L * 1000000L)
    val out = method match {
      case "equal" => hourly.withColumn("wind_disagg", col("wind"))
      case "cosine" =>
        require(!a.isNaN && !b.isNaN && !tShift.isNaN)
        val h = hour(col("timestamp"))
        hourly.withColumn("wind_disagg",
          lit(a) * col("wind") * cos((h - tShift) * (math.Pi / 12.0)) +
            lit(b) * col("wind"))
      case "random" =>
        // w̄ * (-ln U)^0.3 with U from a stable per-row hash — plan- and
        // partitioning-independent determinism, unlike rand(seed)
        val u = draw(seed, col("timestamp") +: pcols)
        hourly.withColumn("wind_disagg",
          col("wind") * pow(-log(u), 0.3))
      case other => throw new IllegalArgumentException(other)
    }
    out.select((pcols :+ col("timestamp") :+
      col("wind_disagg").as("wind")): _*)
  }

  /** Fleet cosine disaggregation: per-station (a, b, t_shift) joined
    * from a fits frame — e.g. `Fitting.fitCosineWindByStation`'s output
    * — via one broadcast join (fits are one row per station). The
    * fleet twin of `disaggregate(method = "cosine")`: each station's
    * hourly curve uses ITS OWN calibrated parameters in a single job
    * over the fleet. */
  def cosinePerStation(daily: DataFrame, fits: DataFrame,
      partitionCols: Seq[String]): DataFrame = {
    require(partitionCols.nonEmpty, "cosinePerStation needs partitionCols")
    val hourly = TimeSeries.explodeDays(daily, "date", 24, 3600L * 1000000L)
    val h = hour(col("timestamp"))
    hourly.join(broadcast(fits), partitionCols)
      .withColumn("wind_disagg",
        col("a") * col("wind") *
          cos((h - col("t_shift")) * (math.Pi / 12.0)) +
          col("b") * col("wind"))
      .select((partitionCols.map(col) :+ col("timestamp") :+
        col("wind_disagg").as("wind")): _*)
  }

  /** Uniform(0,1) from xxhash64 of the given columns + seed; excludes 0
    * exactly so -ln(u) stays finite. */
  def uniformHash(seed: Long,
      cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    (pmod(xxhash64(lit(seed) +: cols: _*), lit(Long.MaxValue))
      .cast("double") + 1.0) / (Long.MaxValue.toDouble + 2.0)
}
