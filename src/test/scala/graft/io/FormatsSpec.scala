package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def tmp(name: String, content: String): String = {
    val f = java.io.File.createTempFile(name, ".txt")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath, content)
    f.getAbsolutePath
  }

  test("readSmet parses header, multipliers, nodata and renames") {
    val path = tmp("smet", """SMET 1.1 ASCII
[HEADER]
station_id = test1
latitude = 51.0
longitude = 8.86
altitude = 100
fields = timestamp TA RH VW
units_multiplier = 1 1 0.01 1
[DATA]
2016-01-01T00:00 278.15 8000 -999
2016-01-01T01:00 -999 7500 3.2
""")
    val (header, df) = Formats.readSmet(spark, path, "h")
    assert(header("station_id") == "test1")
    val rows = df.orderBy($"timestamp").collect()
    assert(rows.length == 2)
    assert(df.columns.toSet == Set("timestamp", "temp", "hum", "wind"))
    assert(rows(0).getAs[Double]("temp") == 278.15)
    assert(rows(0).getAs[Double]("hum") == 80.0) // 8000 * 0.01
    assert(rows(0).isNullAt(rows(0).fieldIndex("wind")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("temp")))
    assert(rows(1).getAs[Double]("wind") == 3.2)
  }

  test("writeSmet + readSmet round-trip") {
    val df = Seq(
      ("2016-01-01 00:00:00", 278.15, 80.0),
      ("2016-01-01 01:00:00", 279.0, 75.5))
      .toDF("s", "temp", "hum")
      .select(to_timestamp($"s").as("timestamp"), $"temp", $"hum")
    val f = java.io.File.createTempFile("smetw", ".smet")
    f.deleteOnExit()
    Formats.writeSmet(df, f.getAbsolutePath,
      Map("station_id" -> "w1"), mode = "h")
    val (h2, back) = Formats.readSmet(spark, f.getAbsolutePath, "h")
    assert(h2("station_id") == "w1")
    val rows = back.orderBy($"timestamp").collect()
    assert(rows.length == 2)
    assert(math.abs(rows(0).getAs[Double]("temp") - 278.15) < 1e-9)
    assert(math.abs(rows(1).getAs[Double]("hum") - 75.5) < 1e-9)
  }

  test("writeSmet drops all-NaN columns when check_nan") {
    val df = Seq(("2016-01-01 00:00:00", 278.15,
        null.asInstanceOf[java.lang.Double]))
      .toDF("s", "temp", "wind")
      .select(to_timestamp($"s").as("timestamp"), $"temp",
        $"wind".cast("double"))
    val f = java.io.File.createTempFile("smetn", ".smet")
    f.deleteOnExit()
    Formats.writeSmet(df, f.getAbsolutePath, Map("station_id" -> "n"),
      mode = "h")
    val content = java.nio.file.Files.readString(f.toPath)
    assert(content.contains("fields = timestamp TA"))
    assert(!content.contains("VW"))
  }

  test("readDwd daily: renames, Kelvin conversion, outer merge") {
    val f1 = tmp("dwd1", """STATIONS_ID; MESS_DATUM;LUFTTEMPERATUR;NIEDERSCHLAGSHOEHE;UNBEKANNT
44; 20160101;    1.5;  0.0; 9
44; 20160102;   -999;  2.5; 9
44; eor
""")
    val f2 = tmp("dwd2", """STATIONS_ID; MESS_DATUM;WINDGESCHWINDIGKEIT
44; 20160102;    3.5
44; 20160103;    4.0
44; eor
""")
    val df = Formats.readDwd(spark, Seq(f1, f2), mode = "d")
    assert(df.columns.toSet ==
      Set("timestamp", "tmean", "precip", "wind"))
    val rows = df.orderBy($"timestamp").collect()
    assert(rows.length == 3)
    assert(math.abs(rows(0).getAs[Double]("tmean") - 274.65) < 1e-9)
    assert(rows(1).isNullAt(rows(1).fieldIndex("tmean")))
    assert(rows(1).getAs[Double]("wind") == 3.5)
    assert(rows(2).isNullAt(rows(2).fieldIndex("precip")))
  }

  test("readDwdMetadata picks the last valid station row") {
    val meta = tmp("dwdmeta",
      """Stations_id; von_datum; Geogr.Breite; Geogr.Laenge; Stationsname
44; 19500101; 51.10; 8.90; Alt Standort
44; 20000101; 51.00; 8.86; Neuer Standort
""")
    val h = Formats.readDwdMetadata(meta)
    assert(h("Stations_id") == "44")
    assert(h("Breite") == "51.00" && h("Laenge") == "8.86")
  }

  test("readDwd hourly parses yyyyMMddHH stamps") {
    val f = tmp("dwdh", """STATIONS_ID; MESS_DATUM;LUFTTEMPERATUR;REL_FEUCHTE
44; 2016010100;    1.0;  80
44; 2016010101;    2.0;  75
44; eor
""")
    val df = Formats.readDwd(spark, Seq(f), mode = "h")
    val rows = df.orderBy($"timestamp").collect()
    assert(rows.length == 2)
    assert(rows(1).getAs[java.sql.Timestamp]("timestamp").toString
      .startsWith("2016-01-01 01:00"))
    assert(math.abs(rows(1).getAs[Double]("tmean") - 275.15) < 1e-9)
    assert(rows(1).getAs[Double]("hum") == 75.0)
  }

  test("readKnmi converts units and shifts the hour") {
    val hdr = (1 to 31).map(i => s"# comment line $i").mkString("\n")
    val path = tmp("knmi", s"""$hdr
# STN,YYYYMMDD,   HH,   DD,   FH,   FF,   FX,    T, T10N,   TD,   SQ,    Q,   DR,   RH,    P, VV,    N,    U, WW, IX,  M,  R,  S,  O,  Y
  260,20160101,    1,  200,   30,   30,   40,   15,     ,   10,    5,   20,    0,    -1,1010, 59,    8,   85,  ,  7,  0,  0,  0,  0,  0
  260,20160101,    2,  210,   40,   40,   50,   20,     ,   12,   10,   30,    0,    12,1008, 59,    8,   90,  ,  7,  0,  0,  0,  0,  0
""")
    val df = Formats.readKnmi(spark, path)
    val rows = df.orderBy($"timestamp").collect()
    assert(rows.length == 2)
    // HH=1 -> hour 0 + 1h shift -> 01:00
    assert(rows(0).getAs[java.sql.Timestamp]("timestamp").toString
      .startsWith("2016-01-01 01:00"))
    assert(math.abs(rows(0).getAs[Double]("temp") - (1.5 + 273.15)) < 1e-9)
    assert(rows(0).getAs[Double]("precip") == 0.0) // -1 clamped
    assert(math.abs(rows(1).getAs[Double]("precip") - 1.2) < 1e-9)
    assert(math.abs(rows(0).getAs[Double]("glob") -
      20.0 * 10000 / 3600.0) < 1e-9)
    assert(rows(0).getAs[Double]("hum") == 85.0)
    assert(math.abs(rows(0).getAs[Double]("wind") - 3.0) < 1e-9)
    assert(rows(0).getAs[Double]("ssd") == 30.0)
  }
}
