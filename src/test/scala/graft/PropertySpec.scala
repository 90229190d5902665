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

  test("chunkTokens covers every token; overlap = maxTokens - stride") {
    import graft.text.Curation
    val gen = for {
      n <- Gen.choose(1, 300)
      maxTok <- Gen.choose(1, 64)
      stride <- Gen.choose(1, maxTok)
    } yield (n, maxTok, stride)
    samples(gen, 12, 2000L).foreach { case (n, maxTok, stride) =>
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      val chunks = Curation.chunkTokens(
        Seq((1L, text)).toDF("doc_id", "text"), "text", Seq("doc_id"),
        maxTok, stride).orderBy($"chunk_idx").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
      // starts at stride intervals while inside the doc
      assert(chunks.length == (n + stride - 1) / stride)
      // every token appears in at least one chunk, in order
      val covered = chunks.flatMap(_._3.split(" ")).distinct
      assert(covered.length == n)
      // all but possibly trailing chunks are full-size
      chunks.dropRight(math.max(1, (maxTok + stride - 1) / stride))
        .foreach { c => assert(c._2 == maxTok) }
      // consecutive full chunks overlap by maxTokens - stride
      chunks.sliding(2).foreach {
        case Array(a, b) if a._2 == maxTok.toLong =>
          assert(a._3.split(" ").drop(stride).toSeq ==
            b._3.split(" ").take(maxTok - stride).toSeq)
        case _ =>
      }
    }
  }

  test("asofJoin nearest equals brute-force nearest on random series") {
    import graft.core.TimeSeries
    val gen = for {
      lts <- Gen.listOfN(25, Gen.choose(0L, 2000L))
      rts <- Gen.listOfN(12, Gen.choose(0L, 2000L))
    } yield (lts.distinct, rts.distinct)
    samples(gen, 8, 3000L).foreach { case (lts, rts) =>
      val left = lts.zipWithIndex
        .map { case (t, i) => (new java.sql.Timestamp(t * 1000), i.toLong) }
        .toDF("ts", "lid")
      val right = rts
        .map(t => (new java.sql.Timestamp(t * 1000), t.toDouble))
        .toDF("ts", "v")
      val out = TimeSeries.asofJoin(left, right, "ts", Seq("v"),
          "nearest")
        .collect().map(r => r.getLong(1) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      lts.zipWithIndex.foreach { case (t, i) =>
        val expected = if (rts.isEmpty) None
          else {
            // nearest by |dt|; tie -> backward (smaller right ts)
            val best = rts.minBy(rt => (math.abs(rt - t), rt))
            Some(best.toDouble)
          }
        assert(out(i.toLong) == expected, s"t=$t rts=$rts")
      }
    }
  }

  test("sessionize: session count = gaps exceeding threshold + 1") {
    import graft.core.TimeSeries
    val gen = Gen.listOfN(40, Gen.choose(0L, 5000L)).map(_.distinct)
    samples(gen, 8, 4000L).foreach { ts =>
      val df = ts.map(t => ("k", new java.sql.Timestamp(t * 1000L)))
        .toDF("key", "ts")
      val out = TimeSeries.sessionize(df, "ts", Seq("key"), 300L)
      val nSessions = out.agg(max($"session_id")).head().getLong(0) + 1
      val sorted = ts.sorted
      val expected = 1 + sorted.sliding(2).count {
        case Seq(a, b) => b - a > 300L
        case _ => false
      }
      assert(nSessions == expected)
      // ids are dense 0..n-1 and monotone over time
      val ids = out.orderBy($"ts").collect().map(_.getLong(2))
      assert(ids.toSeq == ids.sorted.toSeq)
      assert(ids.distinct.length == expected)
    }
  }

  test("rollingTimeAgg equals a brute-force window on random series") {
    import graft.agg.Aggregations
    val gen = Gen.listOfN(30, Gen.zip(
      Gen.choose(0L, 3000L), Gen.choose(-100, 100))).map(_.distinctBy(_._1))
    samples(gen, 8, 5000L).foreach { pts =>
      val df = pts.map { case (t, v) =>
        ("k", new java.sql.Timestamp(t * 1000L), v.toDouble) }
        .toDF("key", "ts", "v")
      val out = Aggregations.rollingTimeAgg(df, "ts", "v", 600L,
          Seq("key"))
        .collect().map(r => r.getTimestamp(1).getTime / 1000 ->
          (r.getLong(3), r.getDouble(4))).toMap
      pts.foreach { case (t, _) =>
        val in = pts.filter { case (u, _) => u >= t - 600 && u <= t }
        val (n, s) = out(t)
        assert(n == in.length && math.abs(s - in.map(_._2).sum) < 1e-9)
      }
    }
  }

  test("ewma equals the sequential recurrence on random series") {
    import graft.core.TimeSeries
    val gen = Gen.listOfN(25, Gen.zip(
      Gen.choose(0L, 3000L), Gen.choose(-50, 50))).map(_.distinctBy(_._1))
    samples(gen, 8, 6000L).foreach { pts =>
      val alpha = 0.25
      val df = pts.map { case (t, v) =>
        ("k", new java.sql.Timestamp(t * 1000L), v.toDouble) }
        .toDF("key", "ts", "v")
      val out = TimeSeries.ewma(df, "ts", "v", alpha, Seq("key"))
        .orderBy($"ts").collect().map(_.getDouble(3))
      val expected = pts.sortBy(_._1).map(_._2.toDouble)
        .scanLeft(Double.NaN) { (acc, x) =>
          if (acc.isNaN) x else (1 - alpha) * acc + alpha * x }.tail
      out.zip(expected).foreach { case (a, e) =>
        assert(math.abs(a - e) < 1e-9) }
    }
  }

  test("duplicateSpans invariants on random corpora with planted clones") {
    import graft.text.Dedup
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docGen: Gen[String] = Gen.choose(2, 40).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val texts = samples(docGen, 30, 4242L)
    // plant one exact clone pair so the duplicated-span path fires
    val rows = (texts :+ texts.head).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(df, "text", "doc_id", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    // one row per doc, nothing dropped
    assert(out.length == rows.length)
    out.foreach { case (_, nGrams, covered, nToks, fracMicro) =>
      // coverage never exceeds the doc, never negative
      assert(covered >= 0 && covered <= nToks)
      // each duplicated gram adds at least 1 and at most n tokens
      assert(covered <= 4L * nGrams)
      assert(nGrams == 0L || covered >= nGrams + 3) // union >= n for >=1 gram
      assert(fracMicro == math.round(covered * 1e6 / nToks))
    }
    // the planted clone pair is fully covered when long enough
    val byId = out.map(r => r._1 -> r).toMap
    val first = byId(0L); val clone = byId(rows.length - 1L)
    if (first._4 >= 4) {
      assert(first._3 == first._4, s"clone source not fully covered: $first")
      assert(clone._3 == clone._4)
    }
    // raising minOccurrences can only shrink coverage
    val strict = Dedup.duplicateSpans(df, "text", "doc_id", n = 4,
      minOccurrences = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    out.foreach { case (id, _, covered, _, _) =>
      assert(strict(id) <= covered)
    }
  }

  test("packGreedy invariants on random size sequences") {
    import graft.text.Curation
    val sizeGen: Gen[List[Long]] = Gen.choose(5, 40).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        (6, Gen.choose(1L, 90L)),
        (1, Gen.choose(150L, 300L)), // oversized: own pack
        (1, Gen.const(0L)))))
    // the planted head case caught a real bug: a zero-size row opening
    // a pack left fill at 0, and the old fill-based split guard then
    // let the NEXT oversized row JOIN that pack (multi-row pack over
    // budget) — the guard must key on the pack's ROW count
    val planted = List(150L, 0L, 250L, 10L, 0L, 300L)
    (samples(sizeGen, 8, 7700L) :+ planted).foreach { sizes =>
      val budget = 100L
      val df = sizes.zipWithIndex
        .map { case (s, i) => ("k", i.toLong, s) }
        .toDF("key", "pos", "n_tokens")
      val out = Curation.packGreedy(df, "n_tokens", budget,
          Seq("key"), Seq("pos"))
        .orderBy($"pos").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))) // (pos, size, pack_id, offset)
      // pack ids are nondecreasing in walk order, starting at 0
      assert(out.head._3 == 0L)
      out.sliding(2).foreach { case Array(a, b) =>
        assert(b._3 == a._3 || b._3 == a._3 + 1)
      case _ => }
      // offset = running fill; fill within budget unless the pack is
      // a single oversized row
      out.groupBy(_._3).foreach { case (_, rows) =>
        val sorted = rows.sortBy(_._1)
        var fill = 0L
        sorted.foreach { case (_, s, _, off) =>
          assert(off == fill, s"offset $off != running fill $fill")
          fill += s
        }
        assert(fill <= budget ||
          (sorted.length == 1 && sorted.head._2 > budget))
      }
      // conservation: every row appears exactly once
      assert(out.map(_._1).toSeq == sizes.indices.map(_.toLong))
      // determinism under repartitioning
      val out2 = Curation.packGreedy(df.repartition(7), "n_tokens",
          budget, Seq("key"), Seq("pos"))
        .orderBy($"pos").collect()
        .map(r => (r.getLong(1), r.getLong(3), r.getLong(4)))
      assert(out.map(r => (r._1, r._3, r._4)).toSeq == out2.toSeq)
    }
  }

  test("asofJoin backward equals a brute-force scan on random series") {
    import graft.core.TimeSeries
    val tsGen: Gen[(List[Long], List[Long])] = Gen.zip(
      Gen.listOfN(20, Gen.choose(0L, 500L)).map(_.distinct),
      Gen.listOfN(12, Gen.choose(0L, 500L)).map(_.distinct))
    samples(tsGen, 8, 8800L).foreach { case (lts, rts) =>
      val left = lts.map(t =>
        ("k", new java.sql.Timestamp(t * 1000L), t)).toDF("key", "ts", "l")
      val right = rts.map(t =>
        ("k", new java.sql.Timestamp(t * 1000L), t * 10))
        .toDF("key", "ts", "r")
      val got = TimeSeries.asofJoin(left, right, "ts", Seq("r"),
          direction = "backward", partitionCols = Seq("key"))
        .orderBy($"ts").collect()
        .map(r => (r.getLong(2), if (r.isNullAt(3)) None
          else Some(r.getLong(3))))
      val want = lts.sorted.map { t =>
        (t, rts.filter(_ <= t).sorted.lastOption.map(_ * 10)) }
      assert(got.toSeq == want.toSeq)
    }
  }

  test("asofJoin forward equals a brute-force scan on random series") {
    import graft.core.TimeSeries
    val tsGen: Gen[(List[Long], List[Long])] = Gen.zip(
      Gen.listOfN(20, Gen.choose(0L, 500L)).map(_.distinct),
      Gen.listOfN(12, Gen.choose(0L, 500L)).map(_.distinct))
    samples(tsGen, 8, 9900L).foreach { case (lts, rts) =>
      val left = lts.map(t =>
        ("k", new java.sql.Timestamp(t * 1000L), t)).toDF("key", "ts", "l")
      val right = rts.map(t =>
        ("k", new java.sql.Timestamp(t * 1000L), t * 10))
        .toDF("key", "ts", "r")
      val got = TimeSeries.asofJoin(left, right, "ts", Seq("r"),
          direction = "forward", partitionCols = Seq("key"))
        .orderBy($"ts").collect()
        .map(r => (r.getLong(2), if (r.isNullAt(3)) None
          else Some(r.getLong(3))))
      val want = lts.sorted.map { t =>
        (t, rts.filter(_ >= t).sorted.headOption.map(_ * 10)) }
      assert(got.toSeq == want.toSeq)
    }
  }

  test("asofJoin tolerance equals brute force in all three directions") {
    import graft.core.TimeSeries
    val tsGen: Gen[(List[Long], List[Long], Long)] = for {
      lts <- Gen.listOfN(18, Gen.choose(0L, 400L)).map(_.distinct)
      rts <- Gen.listOfN(10, Gen.choose(0L, 400L)).map(_.distinct)
      tol <- Gen.choose(5L, 80L)
    } yield (lts, rts, tol)
    samples(tsGen, 8, 11000L).foreach { case (lts, rts, tolS) =>
      val left = lts.map(t =>
        ("k", new java.sql.Timestamp(t * 1000L), t)).toDF("key", "ts", "l")
      val right = rts.map(t =>
        ("k", new java.sql.Timestamp(t * 1000L), t * 10))
        .toDF("key", "ts", "r")
      def run(dir: String) =
        TimeSeries.asofJoin(left, right, "ts", Seq("r"), dir,
            Seq("key"), toleranceMicros = Some(tolS * 1000000L))
          .orderBy($"ts").collect()
          .map(r => (r.getLong(2), if (r.isNullAt(3)) None
            else Some(r.getLong(3)))).toSeq
      def brute(dir: String) = lts.sorted.map { t =>
        val m = dir match {
          case "backward" =>
            rts.filter(rt => rt <= t && t - rt <= tolS)
              .sorted.lastOption
          case "forward" =>
            rts.filter(rt => rt >= t && rt - t <= tolS)
              .sorted.headOption
          case "nearest" =>
            // min |dt|, tie -> smaller right ts (backward preference)
            val in = rts.filter(rt => math.abs(rt - t) <= tolS)
            if (in.isEmpty) None
            else Some(in.minBy(rt => (math.abs(rt - t), rt)))
        }
        (t, m.map(_ * 10))
      }
      Seq("backward", "forward", "nearest").foreach { dir =>
        assert(run(dir) == brute(dir),
          s"direction=$dir tol=$tolS lts=$lts rts=$rts")
      }
    }
  }

  test("winnowing guarantee: any shared substring of >= w+k-1 tokens " +
      "shares a fingerprint hash; selections are consistent across docs") {
    // random word soup around a random planted shared run — the MOSS
    // theorem says w + k - 1 shared tokens force >= 1 shared selected
    // hash, for EVERY (k, w) and placement
    val wordGen = Gen.choose(0, 400).map(i => s"w$i")
    val caseGen = for {
      k <- Gen.choose(2, 6)
      w <- Gen.choose(2, 6)
      shared <- Gen.listOfN(k + w - 1, wordGen) // exactly the bound
      pre1 <- Gen.listOfN(8, wordGen)
      post1 <- Gen.listOfN(8, wordGen)
      pre2 <- Gen.listOfN(13, wordGen)
      post2 <- Gen.listOfN(3, wordGen)
    } yield (k, w,
      (pre1 ++ shared ++ post1).mkString(" "),
      (pre2 ++ shared ++ post2).mkString(" "))
    samples(caseGen, 25, 4242L).zipWithIndex.foreach {
      case ((k, w, d1, d2), i) =>
        val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
        val fp = graft.text.Dedup.winnowFingerprints(docs, "text",
          "doc_id", k = k, w = w)
        val h1 = fp.where($"doc_id" === 1L).select($"gram_hash")
          .as[Long].collect().toSet
        val h2 = fp.where($"doc_id" === 2L).select($"gram_hash")
          .as[Long].collect().toSet
        assert((h1 & h2).nonEmpty,
          s"case $i (k=$k w=$w): shared ${k + w - 1}-token run " +
            "selected no common fingerprint")
    }
  }

  test("sq8 quantized cosine tracks exact cosine within the int8 " +
      "error bound on random vectors") {
    // per-component quantization error <= scale/2 = max|x|/254; the
    // cosine error is bounded by ~2*sqrt(d)/127 for unit-ish vectors —
    // assert a loose 3x margin over random data, plus sign fidelity
    for (d <- Seq(8, 32, 64)) {
      val vecGen = for {
        a <- Gen.listOfN(d, Gen.choose(-1000, 1000).map(_ / 1000.0f))
        b <- Gen.listOfN(d, Gen.choose(-1000, 1000).map(_ / 1000.0f))
      } yield (a.toArray, b.toArray)
      val cases = samples(vecGen, 10, 777L + d)
        .filter { case (a, b) =>
          a.exists(_ != 0.0f) && b.exists(_ != 0.0f) }
      val df = cases.zipWithIndex.flatMap { case ((a, b), i) =>
        Seq((2L * i, a), (2L * i + 1, b)) }.toDF("vec_id", "embedding")
      val q = graft.similarity.Similarity.sq8TopK(df, df, "embedding",
          "vec_id", "vec_id", k = df.count().toInt)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      cases.zipWithIndex.foreach { case ((a, b), i) =>
        def cos(x: Array[Float], y: Array[Float]): Double = {
          val dot = x.zip(y).map { case (p, r) => p.toDouble * r }.sum
          val nx = math.sqrt(x.map(v => v.toDouble * v).sum)
          val ny = math.sqrt(y.map(v => v.toDouble * v).sum)
          dot / (nx * ny)
        }
        val exact = cos(a, b)
        val quant = q((2L * i + 1, 2L * i))
        val bound = 6.0 * math.sqrt(d) / 127.0
        assert(math.abs(quant - exact) <= bound,
          s"case $i (d=$d): |$quant - $exact| > $bound")
      }
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
