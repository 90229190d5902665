package graft.streaming

import graft.TestSpark
import graft.cascade.{Cascade, CascadeStatistics}
import graft.streaming.StreamingCascade.DailyPrecip
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream ≡ batch for cascade GENERATION: the 5-day-window streaming
  * operator must reproduce the batch [[Cascade.disaggregate]] hourly
  * series bit-for-bit — same xxhash64 draws, same branching, same
  * quarter-sum order. This is also the empirical proof of the
  * dependency-cone bound the operator's state design rests on (each
  * emitted day depends only on the raw daily values ±2 days). */
class StreamingCascadeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val stats = CascadeStatistics.sampleData()

  private def mkDays(n: Int, station: String): Seq[DailyPrecip] = {
    val rng = new scala.util.Random(station.hashCode ^ 7)
    (0 until n).map { i =>
      val d = java.sql.Date.valueOf(
        java.time.LocalDate.of(2016, 3, 1).plusDays(i))
      val p =
        if (rng.nextDouble() < 0.15) None // missing day
        else if (rng.nextDouble() < 0.45) Some(0.0) // dry
        else Some(rng.nextDouble() * 24.0) // wet
      DailyPrecip(station, d, p)
    }
  }

  private def batchHourly(days: Seq[DailyPrecip]) = {
    val daily = days.toDF("station", "date", "precip")
    Cascade.disaggregate(daily, Left(stats), hourly = true,
        seed = 42L, partitionCols = Seq("station"))
      .select($"station", $"timestamp", $"precip")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime,
        Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toSet
  }

  test("streaming cascade generation ≡ batch, two stations, " +
      "uneven micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val n = 24
    val a = mkDays(n, "alpha")
    val b = mkDays(n, "bravo")
    val mem = MemoryStream[DailyPrecip]
    val q = StreamingCascade.cascadeGenerateStream(mem.toDS(), stats)
      .writeStream.outputMode("append").format("memory")
      .queryName("casc_gen_stream").start()
    try {
      // interleave stations, vary batch sizes incl. single days
      val feed = a.zip(b).flatMap { case (x, y) => Seq(x, y) }
      var off = 0
      val sizes = Iterator.continually(Seq(2, 6, 1, 9, 4)).flatten
      while (off < feed.length) {
        val take = math.min(sizes.next(), feed.length - off)
        mem.addData(feed.slice(off, off + take))
        q.processAllAvailable()
        off += take
      }
      val streamed = spark.table("casc_gen_stream")
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime,
          Option(r.get(2)).map(_.asInstanceOf[Double])))
        .toSet
      // stream finalizes a day two days late: days 0..n-3 per station
      assert(streamed.size == 2 * (n - 2) * 24, s"got ${streamed.size}")
      val batchAll = batchHourly(a ++ b)
      val lastTwoDays: Set[(String, Long)] =
        (a ++ b).groupBy(_.station).toSeq.flatMap { case (s, ds) =>
          ds.map(_.date.toLocalDate.toEpochDay).sorted.takeRight(2)
            .map(e => (s, e))
        }.toSet
      val batchPrefix = batchAll.filterNot { case (s, ts, _) =>
        lastTwoDays.contains(s -> ts / 86400000L) }
      assert(batchPrefix.size == streamed.size)
      // EXACT equality: identical draws, branching, and sum order
      assert(streamed == batchPrefix, {
        val diff = streamed.diff(batchPrefix).take(3)
        val diff2 = batchPrefix.diff(streamed).take(3)
        s"stream-only: $diff; batch-only: $diff2"
      })
      // mass sanity: each finalized non-missing day sums to its input
      val byDay = streamed.toSeq.groupBy { case (s, ts, _) =>
        (s, ts / 86400000L) }
      (a ++ b).foreach { d =>
        val key = (d.station, d.date.toLocalDate.toEpochDay)
        byDay.get(key).foreach { hrs =>
          d.precip.foreach { p =>
            val got = hrs.flatMap(_._3).sum
            assert(math.abs(got - p) < 1e-9, s"$key: $got vs $p")
          }
        }
      }
    } finally q.stop()
  }

  test("emitted rows never change when later days arrive " +
      "(the ±2-day cone bound, empirically)") {
    implicit val sqlCtx = spark.sqlContext
    val days = mkDays(12, "gamma")
    val mem = MemoryStream[DailyPrecip]
    val q = StreamingCascade.cascadeGenerateStream(mem.toDS(), stats)
      .writeStream.outputMode("append").format("memory")
      .queryName("casc_gen_prefix").start()
    try {
      mem.addData(days.take(7)); q.processAllAvailable()
      val afterSeven = spark.table("casc_gen_prefix").collect()
        .map(_.toSeq).toSet
      mem.addData(days.drop(7)); q.processAllAvailable()
      val afterAll = spark.table("casc_gen_prefix").collect()
        .map(_.toSeq).toSet
      // append-only: the first emission is a subset of the final state,
      // byte-identical rows (nothing retracted or revised)
      assert(afterSeven.subsetOf(afterAll))
      assert(afterSeven.size == 5 * 24 && afterAll.size == 10 * 24)
    } finally q.stop()
  }

  test("calendar gap in the daily grid fails loudly") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DailyPrecip]
    val q = StreamingCascade.cascadeGenerateStream(mem.toDS(), stats)
      .writeStream.outputMode("append").format("memory")
      .queryName("casc_gen_gap").start()
    try {
      mem.addData(Seq(
        DailyPrecip("x", java.sql.Date.valueOf("2016-03-01"), Some(1.0)),
        DailyPrecip("x", java.sql.Date.valueOf("2016-03-03"), Some(2.0))))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("gap in daily grid") ||
        Option(e.getCause).exists(_.getMessage.contains("gap in daily grid")))
    } finally q.stop()
  }
}
