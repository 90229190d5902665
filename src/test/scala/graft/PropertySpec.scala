package graft

import graft.cascade.{Cascade, CascadeStatistics}
import graft.core.Validation
import graft.disagg.Temperature
import graft.meteo.Meteo
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (FIXTURES.md §7 generators): conservation,
  * bounds, inverse relations, and polar sanity over generated inputs.
  * Raw scalacheck generators sampled with fixed seeds (the scalatest
  * bridge isn't on the offline classpath). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seed + i)))

  val precipSeriesGen: Gen[List[Option[Double]]] =
    Gen.listOfN(60, Gen.frequency(
      (2, Gen.const(Some(0.0))),
      (1, Gen.const(None)),
      (3, Gen.choose(1, 3000).map(v => Some(v / 100.0)))))

  test("random daily precip -> cascade conserves sums, restores NaN") {
    samples(precipSeriesGen, 5, 1000L).foreach { values =>
      val rows = values.zipWithIndex.map { case (v, i) =>
        (java.sql.Date.valueOf(
          java.time.LocalDate.of(2016, 1, 1).plusDays(i)),
          v.map(Double.box).orNull)
      }
      val daily = rows.toDF("date", "precip")
        .withColumn("precip", $"precip".cast("double"))
      val out = Cascade.disaggregate(daily,
        Left(CascadeStatistics.sampleData()), seed = 17L)
      val sums = out.groupBy(to_date($"timestamp").as("date"))
        .agg(sum($"precip").as("s"), count($"precip").as("n"))
      val bad = daily.join(sums, "date").where(
        ($"precip".isNull && $"n" =!= 0) ||
        ($"precip".isNotNull && abs($"s" - $"precip") > 1e-9)).count()
      assert(bad == 0)
    }
  }

  val tempSeriesGen: Gen[List[(Double, Double)]] =
    Gen.listOfN(40, for {
      tmin <- Gen.choose(25000, 29000).map(_ / 100.0)
      dtr <- Gen.choose(100, 1500).map(_ / 100.0)
    } yield (tmin, tmin + dtr))

  test("sine_min_max output stays within global [tmin, tmax]") {
    samples(tempSeriesGen, 5, 2000L).foreach { values =>
      val rows = values.zipWithIndex.map { case ((tmin, tmax), i) =>
        (java.sql.Date.valueOf(
          java.time.LocalDate.of(2016, 6, 1).plusDays(i)), tmin, tmax)
      }
      val daily = rows.toDF("date", "tmin", "tmax")
      val out = Temperature.disaggregate(daily, "sine_min_max", "fix")
      val gmin = values.map(_._1).min
      val gmax = values.map(_._2).max
      val bad = out.where($"temp" < gmin - 1e-9 ||
        $"temp" > gmax + 1e-9 || $"temp".isNull).count()
      assert(bad == 0)
    }
  }

  val tempHumGen: Gen[(Double, Double)] = for {
    t <- Gen.choose(21000, 31000).map(_ / 100.0)
    h <- Gen.choose(100, 10000).map(_ / 100.0)
  } yield (t, h)

  test("vapor pressure > 0; dewpoint <= temp; RH round-trips") {
    val pairs = samples(tempHumGen, 200, 3000L)
    val df = pairs.toDF("t", "h")
    val checked = df.select(
      Meteo.vaporPressure($"t", $"h").as("vp"),
      Meteo.dewpointTemperature($"t", $"h").as("td"),
      $"t", $"h")
      .withColumn("rh_back",
        Meteo.saturationVaporPressure($"td") /
          Meteo.saturationVaporPressure($"t") * 100.0)
    val bad = checked.where($"vp" <= 0 || $"td" > $"t" + 1e-6).count()
    assert(bad == 0)
    // RH round-trip is exact only when temp and dewpoint sit on the same
    // Sonntag branch — the reference's formulas share that asymmetry
    // (vapor_pressure branches on temp, util/util.py:87-99)
    val badRt = checked.where($"t" >= 273.15 && $"td" >= 273.15 &&
      abs($"rh_back" - $"h") > 0.01).count()
    assert(badRt == 0)
  }

  test("sun times sane for arbitrary latitudes incl. polar") {
    val latLonGen = for {
      lat <- Gen.choose(-89, 89)
      lon <- Gen.choose(-179, 179)
    } yield (lat, lon)
    samples(latLonGen, 12, 4000L).foreach { case (lat, lon) =>
      val days = (0 until 24).map(i => java.sql.Date.valueOf(
        java.time.LocalDate.of(2016, 1, 10).plusDays(i * 15)))
        .toDF("date")
      val st = Meteo.withSunTimes(days, "date", lon.toDouble,
        lat.toDouble, 0.0)
      val bad = st.where($"daylength" < -1e-9 ||
        $"daylength" > 24.0 + 1e-9 ||
        $"sunrise".isNull || $"sunset".isNull).count()
      assert(bad == 0, s"lat=$lat lon=$lon")
    }
  }

  test("validation rejects Celsius-looking temps, accepts Kelvin") {
    val kelvin = Seq(("2016-01-01", 271.0)).toDF("d", "temp")
    Validation.assertPlausibleTemps(kelvin)
    val celsius = Seq(("2016-01-01", 12.5)).toDF("d", "temp")
    intercept[IllegalArgumentException] {
      Validation.assertPlausibleTemps(celsius)
    }
  }
}
