package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming dailyFromHourly matches the batch aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double, Double)]
    val df = mem.toDF().toDF("timestamp", "temp", "precip")

    val out = StreamingAgg.dailyFromHourlyStream(df,
      watermark = "0 seconds")
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("daily_out").start()
    try {
      val rows = for (d <- 1 to 3; h <- 0 until 24) yield (
        java.sql.Timestamp.valueOf(f"2016-01-0$d $h%02d:00:00"),
        270.0 + d + h * 0.5, if (h % 6 == 0) 1.0 else 0.0)
      mem.addData(rows)
      q.processAllAvailable()
      val got = spark.table("daily_out").orderBy($"date").collect()
      assert(got.length == 3)
      val first = got(0)
      assert(first.getAs[Double]("tmin") == 271.0)
      assert(first.getAs[Double]("tmax") == 271.0 + 23 * 0.5)
      assert(first.getAs[Double]("precip") == 4.0)
    } finally q.stop()
  }

  test("completeness stream flags short days") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val df = mem.toDF().toDF("timestamp", "temp")
    val q = StreamingAgg.completenessStream(df, "0 seconds")
      .writeStream.outputMode("complete").format("memory")
      .queryName("complete_out").start()
    try {
      val full = (0 until 24).map(h =>
        (java.sql.Timestamp.valueOf(f"2016-02-01 $h%02d:00:00"), 1.0))
      val short = (0 until 20).map(h =>
        (java.sql.Timestamp.valueOf(f"2016-02-02 $h%02d:00:00"), 1.0))
      mem.addData(full ++ short)
      q.processAllAvailable()
      val got = spark.table("complete_out").orderBy($"date").collect()
      assert(got.length == 2)
      assert(got(0).getAs[Boolean]("complete"))
      assert(!got(1).getAs[Boolean]("complete"))
    } finally q.stop()
  }
}
