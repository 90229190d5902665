package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Format-specific sources/sinks (SURVEY.md §2.1): SMET 1.1, DWD, KNMI.
  * Headers are tiny and parsed on the driver; the data tables go through
  * Spark's distributed CSV reader so multi-GB files scan in parallel. */
object Formats {

  // ------------------------------------------------------------------ SMET

  val smetDailyRenames: Map[String, String] = Map(
    "TA" -> "tmean", "TMAX" -> "tmax", "TMIN" -> "tmin",
    "PSUM" -> "precip", "ISWR" -> "glob", "RH" -> "hum", "VW" -> "wind")
  val smetHourlyRenames: Map[String, String] = Map(
    "TA" -> "temp", "PSUM" -> "precip", "ISWR" -> "glob", "RH" -> "hum",
    "VW" -> "wind")

  /** read_smet (data_io.py:27-104): `[HEADER]` k = v block, whitespace
    * table after `[DATA]`, nodata -999, per-column units_multiplier
    * (first entry belongs to the timestamp and is skipped). */
  def readSmet(spark: SparkSession, path: String, mode: String)
      : (Map[String, String], DataFrame) = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).asScala
    val headerStart = lines.indexWhere(_.trim == "[HEADER]")
    val dataStart = lines.indexWhere(_.trim == "[DATA]")
    require(headerStart >= 0 && dataStart > headerStart, s"not SMET: $path")
    val header = lines.slice(headerStart + 1, dataStart)
      .filter(_.contains("="))
      .map { l =>
        val Array(k, v) = l.split("=", 2)
        k.trim -> v.trim
      }.toMap

    val columns = header("fields").split("\\s+").toSeq
    val multipliers = header.get("units_multiplier")
      .map(_.split("\\s+").map(_.toDouble).drop(1))
      .getOrElse(Array.fill(columns.length - 1)(1.0))

    var df = spark.read
      .option("sep", " ")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .option("nullValue", "-999")
      .csv(spark.createDataset(
        lines.drop(dataStart + 1).toSeq.map(_.trim.replaceAll("\\s+", " ")))(
        spark.implicits.newStringEncoder))
      .toDF(columns: _*)
    df = df.withColumn("timestamp", to_timestamp(col("timestamp")))
    columns.drop(1).zip(multipliers).foreach { case (c, m) =>
      df = df.withColumn(c, col(c).cast("double") * m)
    }
    val renames = if (mode == "d") smetDailyRenames else smetHourlyRenames
    renames.foreach { case (from, to) =>
      if (df.columns.contains(from))
        df = df.withColumnRenamed(from, to)
    }
    (header, df)
  }

  /** write_smet (data_io.py:228-307): header + fixed 2-decimal table,
    * nodata fill, optional all-NaN column drop. Single ordered text file
    * (driver-composed header, executor-formatted rows collected —
    * SMET sinks are per-station sized).
    *
    * Intentional divergence: the reference's daily write dict swaps
    * tmin→TMAX / tmax→TMIN (data_io.py:251-253, a bug — its own reader
    * maps TMAX→tmax, so reference-written daily files round-trip with
    * min/max exchanged). We write the correct mapping. */
  def writeSmet(df: DataFrame, path: String,
      metadata: Map[String, String], nodataValue: Double = -999,
      mode: String = "h", checkNan: Boolean = true): Unit = {
    val renames = (if (mode == "d") smetDailyRenames
      else smetHourlyRenames).map(_.swap)
    var out = df
    renames.foreach { case (from, to) =>
      if (out.columns.contains(from)) out = out.withColumnRenamed(from, to)
    }
    val tsCol = out.columns.head
    val valueCols0 = out.columns.drop(1).toSeq
    val valueCols = if (!checkNan) valueCols0 else {
      val counts = out.agg(count(lit(1)),
        valueCols0.map(c => count(col(c)).as(c)): _*).head()
      valueCols0.filter(c => counts.getAs[Long](c) > 0)
    }
    val fmt = if (mode == "d") "yyyy-MM-dd'T'00:00" else "yyyy-MM-dd'T'HH:mm"
    val rows = out
      .orderBy(col(tsCol))
      .select(concat_ws(" ",
        date_format(col(tsCol), fmt) +:
          valueCols.map(c => format_number(
            coalesce(col(c), lit(nodataValue)), 2)): _*).as("line"))
      .collect().map(_.getString(0))
    val meta = metadata ++ Map(
      "fields" -> ("timestamp " + valueCols.mkString(" ")),
      "units_multiplier" -> Seq.fill(valueCols.length + 1)("1")
        .mkString(" ", " ", "").trim)
    val sb = new StringBuilder
    sb.append("SMET 1.1 ASCII\n[HEADER]\n")
    meta.foreach { case (k, v) => sb.append(s"$k = $v\n") }
    sb.append("[DATA]\n")
    sb.append(rows.mkString("\n"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      sb.toString)
  }

  // ------------------------------------------------------------------- DWD

  val dwdRenames: Map[String, String] = Map(
    "LUFTTEMPERATUR" -> "tmean",
    "LUFTTEMPERATUR_MINIMUM" -> "tmin",
    "LUFTTEMPERATUR_MAXIMUM" -> "tmax",
    "NIEDERSCHLAGSHOEHE" -> "precip",
    "GLOBAL_KW_J" -> "glob",
    "REL_FEUCHTE" -> "hum",
    "WINDGESCHWINDIGKEIT" -> "wind",
    "SONNENSCHEINDAUER" -> "sun_h")

  /** DWD station metadata header (data_io.py:138-151): last valid row of
    * the `;`-separated metadata file -> id, name, lat (Breite), lon
    * (Laenge). Driver-side — the file is a handful of rows. */
  def readDwdMetadata(path: String): Map[String, String] = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).asScala
      .map(_.trim).filter(_.nonEmpty)
    require(lines.size >= 2, s"no metadata rows in $path")
    val cols = lines.head.split(";").map(_.trim)
    val last = lines.last.split(";").map(_.trim)
    val byName = cols.zip(last).toMap
    Map(
      "Stations_id" -> byName.getOrElse("Stations_id", last(0)),
      "Stationsname" -> byName.getOrElse("Stationsname", ""),
      "Breite" -> last.lift(2).getOrElse(""),
      "Laenge" -> last.lift(3).getOrElse(""))
  }

  /** read_dwd (data_io.py:107-225): `;`-separated, na -999, MESS_DATUM
    * daily yyyyMMdd / hourly yyyyMMddHH, German→canonical renames, °C→K,
    * unknown columns dropped; multi-file variants outer-join on the
    * timestamp. `skipLast` drops the trailing summary line. Pass
    * `metadataPath` to also get the station header. */
  def readDwd(spark: SparkSession, paths: Seq[String], mode: String = "d",
      skipLast: Boolean = true): DataFrame =
    paths.map(readSingleDwd(spark, _, mode, skipLast))
      .reduce((a, b) => a.join(b, Seq("timestamp"), "outer"))

  def readDwdWithMetadata(spark: SparkSession, paths: Seq[String],
      metadataPath: String, mode: String = "d", skipLast: Boolean = true)
      : (Map[String, String], DataFrame) =
    (readDwdMetadata(metadataPath), readDwd(spark, paths, mode, skipLast))

  private def readSingleDwd(spark: SparkSession, path: String,
      mode: String, skipLast: Boolean): DataFrame = {
    var df = spark.read
      .option("sep", ";").option("header", "true")
      .option("nullValue", "-999")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .csv(path)
    df = df.toDF(df.columns.map(_.trim): _*)
    if (skipLast) {
      // DWD files end in a summary line whose MESS_DATUM isn't a date —
      // drop rows that don't parse instead of counting lines
      df = df.where(col("MESS_DATUM").rlike("^\\s*\\d{8,10}\\s*$"))
    }
    val tsFmt = if (mode == "d") "yyyyMMdd" else "yyyyMMddHH"
    df = df.withColumn("timestamp",
      to_timestamp(col("MESS_DATUM").cast("string"), tsFmt))
    dwdRenames.foreach { case (from, to) =>
      if (df.columns.contains(from)) df = df.withColumnRenamed(from, to)
    }
    val keep = "timestamp" +: df.columns.filter(dwdRenames.values.toSet)
    df = df.select(keep.distinct.map(col): _*)
    Seq("tmean", "tmin", "tmax", "temp").foreach { c =>
      if (df.columns.contains(c))
        df = df.withColumn(c, col(c).cast("double") + 273.15)
    }
    df.columns.filterNot(_ == "timestamp").foldLeft(df) { (d, c) =>
      d.withColumn(c, col(c).cast("double"))
    }
  }

  // ------------------------------------------------------------------ KNMI

  /** read_single_knmi_file / read_knmi_dataset (data_io.py:310-383):
    * hourly KNMI CSV — 31 skipped lines then a column-name row; timestamp
    * = YYYYMMDD + (HH−1) + 1 h; unit conversions (0.1°C→K, J/cm²/h→W/m²,
    * 0.1 mm, 0.1 m/s, ssd×6 min); negative precip clamped to 0.
    * `path` may be a glob (read_knmi_dataset concat ≡ multi-file scan). */
  def readKnmi(spark: SparkSession, path: String): DataFrame = {
    // column names from the first matching file's line 32 (driver-side)
    val firstFile = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      val glob = fs.globStatus(new org.apache.hadoop.fs.Path(path))
      require(glob != null && glob.nonEmpty, s"no KNMI files at $path")
      glob.head.getPath
    }
    val fs = firstFile.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(firstFile)
    val headerLine = try {
      scala.io.Source.fromInputStream(in).getLines().slice(31, 32)
        .toSeq.headOption.getOrElse("")
    } finally in.close()
    val names = headerLine.replace("#", "").split(",").map(_.trim)

    var df = spark.read.option("header", "false")
      .option("comment", "#")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .csv(path)
    df = df.toDF(names.take(df.columns.length): _*)
    df = df.where(col("YYYYMMDD").rlike("^\\d{8}$"))
    def c(name: String) = col(name).cast("double")
    df.select(
      (to_timestamp(concat(col("YYYYMMDD"),
        lpad((col("HH").cast("int") - 1).cast("string"), 2, "0")),
        "yyyyMMddHH") + expr("INTERVAL 1 HOUR")).as("timestamp"),
      (c("T") / 10.0 + 273.15).as("temp"),
      greatest(c("RH") / 10.0, lit(0.0)).as("precip"),
      (c("Q") * 10000.0 / 3600.0).as("glob"),
      c("U").as("hum"),
      (c("FH") / 10.0).as("wind"),
      (c("SQ") * 6.0).as("ssd"))
  }
}
