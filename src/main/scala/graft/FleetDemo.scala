package graft

import graft.agg.Aggregations
import graft.cascade.Cascade
import graft.core.Tables
import graft.disagg.{Temperature, Wind}
import graft.stats.Fitting
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end FLEET pipeline — the 100 TB shape in miniature:
  * `runMain graft.FleetDemo [stations] [outDir]`.
  *
  *  1. land a synthesized station fleet in the station-partitioned
  *     parquet layout (directory pruning + in-file time sort);
  *  2. read one station back through a pruned scan;
  *  3. calibrate EVERY station in parallel — cosine wind fits on
  *     executors (mapGroups), per-station cascade statistics
  *     (distributed percentile passes);
  *  4. disaggregate the whole fleet with station-partitioned windows
  *     and roll daily aggregates back up.
  *
  * Every step is one Spark job over the fleet — never a driver loop
  * over stations. */
object FleetDemo {
  def main(args: Array[String]): Unit = {
    val stations = args.headOption.map(_.toInt).getOrElse(50)
    val outDir = args.lift(1).getOrElse("/tmp/graft_fleet")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-fleet-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[fleet] $label%-42s ${(System.nanoTime() - t0) / 1e9}%6.1f s")
      r
    }

    val days = 365
    // one year of daily values + hourly observations per station, all
    // synthesized with expressions (no driver-side data)
    val daily = spark.range(0, stations.toLong * days, 1, 8)
      .select(
        concat(lit("st"), (col("id") / days).cast("long")).as("station_id"),
        date_add(lit(java.sql.Date.valueOf("2016-01-01")),
          (col("id") % days).cast("int")).as("date"),
        (sin(col("id") / 58.1) * 8 + 278).as("tmin"),
        (sin(col("id") / 58.1) * 8 + 286).as("tmax"),
        when(pmod(col("id"), lit(3)) === 0,
          pmod(col("id"), lit(17)).cast("double")).otherwise(0.0)
          .as("precip"))
    val hourlyObs = spark.range(0, stations.toLong * days * 24, 1, 8)
      .select(
        concat(lit("st"), (col("id") / (days * 24)).cast("long"))
          .as("station_id"),
        timestamp_seconds(
          lit(java.sql.Timestamp.valueOf("2016-01-01 00:00:00"))
            .cast("long") +
          pmod(col("id"), lit(days * 24)) * 3600L).as("timestamp"),
        // per-station diurnal wind: amplitude varies with the station
        (lit(4.0) + (col("id") / (days * 24)).cast("long") % 3 +
          (lit(1.5) + pmod(col("id") / (days * 24), lit(5))) *
            cos((pmod(col("id"), lit(24)) - 13) * (math.Pi / 12)))
          .as("wind"),
        when(pmod(col("id"), lit(5)) === 0,
          pmod(col("id"), lit(7)).cast("double") / 2.0).otherwise(0.0)
          .as("precip"))

    t("land station-partitioned layout") {
      Tables.writeStationPartitioned(daily, s"$outDir/daily",
        Seq("station_id"), tsCol = "date")
    }
    val fleet = Tables.readStationPartitioned(spark, s"$outDir/daily")
    t("pruned single-station read") {
      val one = fleet.where(col("station_id") === "st7")
      val plan = one.queryExecution.executedPlan.toString
      require(plan.contains("PartitionFilters:"), "expected pruning")
      require(one.count() == days)
    }

    val windFits = t("per-station cosine wind fits (executors)") {
      val fits = Fitting.fitCosineWindByStation(
        hourlyObs.select(col("station_id"), col("timestamp"), col("wind")),
        Seq("station_id"))
      require(fits.count() == stations)
      fits
    }
    t("per-station cascade calibration") {
      val stats = Cascade.buildCascPerStation(
        hourlyObs.select(col("station_id"), col("timestamp"),
          col("precip")),
        hourly = true, partitionCols = Seq("station_id"))
      require(stats.size == stations)
    }
    t("fleet temperature disaggregation") {
      val hourly = Temperature.disaggregate(fleet, "sine_min_max", "fix",
        partitionCols = Seq("station_id"))
      require(hourly.count() == stations.toLong * days * 24)
    }
    t("fleet wind disaggregation (per-station params)") {
      val dailyWind = Aggregations.dailyFromHourly(
        hourlyObs.select(col("station_id"), col("timestamp"),
          col("wind")),
        partitionCols = Seq("station_id"))
      val hourly = Wind.cosinePerStation(dailyWind, windFits,
        Seq("station_id"))
      require(hourly.count() == stations.toLong * days * 24)
    }
    t("fleet daily rollup") {
      val hourly = Temperature.disaggregate(fleet, "sine_min_max", "fix",
        partitionCols = Seq("station_id"))
        .withColumnRenamed("temp", "temp")
      require(Aggregations.dailyFromHourly(hourly,
        partitionCols = Seq("station_id")).count() ==
        stations.toLong * days)
    }
    println(s"[fleet] OK: $stations stations end-to-end at $outDir")
    spark.stop()
  }
}
