package graft

import graft.agg.Aggregations
import graft.api.{Station, StationSession}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end walkthrough on the reference's own fixture — what a
  * migrating user runs instead of the reference's example notebook:
  *
  *   sbt "runMain graft.Demo /tmp/graft_demo"
  *
  * hourly obs -> daily aggregation -> calibration -> every
  * disaggregation method -> parquet outputs + stats JSON.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_demo")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the reference's 2016 fixture, pre-extracted alongside the goldens
    val golden = new java.io.File("src/test/resources/golden")
      .getAbsolutePath
    val hourlyObs = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$golden/hourly_obs.csv.gz")
      .withColumn("timestamp", to_timestamp($"timestamp"))
      .cache()

    // 1. aggregate to daily + validate
    val daily = Aggregations.dailyFromHourly(hourlyObs)
    graft.core.Validation.assertPlausibleTemps(daily)

    // 2. calibrate everything from the hourly observations
    val station = Station("demo", "fixture station", 8.86, 51.0, 1.0)
    val session = new StationSession(spark, station, daily,
      Some(hourlyObs)).calibrate()
    session.stats.writeJson(s"$outDir-stats.json")
    println(s"calibrated: wind=${session.stats.wind}, " +
      s"hum a0/a1=${session.stats.hum.a0}/${session.stats.hum.a1}")

    // 3. disaggregate every variable
    val outputs = Map(
      "temp" -> session.disaggregateTemperature("sine_min_max",
        "sun_loc_shift"),
      "hum" -> session.disaggregateHumidity("dewpoint_regression",
        preserveDailyMean = true),
      "wind" -> session.disaggregateWind("cosine"),
      "glob" -> session.disaggregateRadiation("pot_rad"),
      "precip" -> session.disaggregatePrecipitation("cascade"))

    outputs.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
      val n = spark.read.parquet(s"$outDir/$name").count()
      println(f"$name%8s -> $outDir/$name ($n rows)")
    }
    spark.stop()
  }
}
