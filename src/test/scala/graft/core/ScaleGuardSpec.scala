package graft.core

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def series = (0 until 100).map(i =>
    (java.sql.Timestamp.valueOf(f"2016-01-01 ${i % 24}%02d:00:00"),
      s"st${i % 4}", if (i % 7 == 0) None else Some(i.toDouble)))
    .toDF("ts", "station", "v")

  private def withThreshold[A](bytes: Long)(body: => A): A = {
    val old = ScaleGuard.thresholdBytes
    ScaleGuard.thresholdBytes = BigInt(bytes)
    ScaleGuard.reset()
    try body finally {
      ScaleGuard.thresholdBytes = old
      ScaleGuard.probe = null
      ScaleGuard.reset()
    }
  }

  test("unpartitioned windowed operators trip the guard on large input") {
    withThreshold(1L) {
      var tripped = List.empty[String]
      ScaleGuard.probe = (op, _) => tripped ::= op
      TimeSeries.interpolateLinear(series, "ts", "v", limit = 2)
        .count()
      assert(tripped.contains("TimeSeries.interpolateLinear"))
      TimeSeries.fillForward(series, "ts", "v", limit = 2).count()
      assert(tripped.contains("TimeSeries null-filling"))
      graft.agg.Aggregations.rollingTimeAgg(series, "ts", "v",
        windowSeconds = 3600L).count()
      assert(tripped.contains("Aggregations.rollingTimeAgg"))
    }
  }

  test("partitioned calls never trip the guard") {
    withThreshold(1L) {
      var tripped = List.empty[String]
      ScaleGuard.probe = (op, _) => tripped ::= op
      TimeSeries.interpolateLinear(series, "ts", "v", limit = 2,
        partitionCols = Seq("station")).count()
      graft.agg.Aggregations.rollingTimeAgg(series, "ts", "v",
        windowSeconds = 3600L, partitionCols = Seq("station")).count()
      assert(tripped.isEmpty)
    }
  }

  test("small inputs stay silent at the default threshold") {
    ScaleGuard.reset()
    var tripped = List.empty[String]
    ScaleGuard.probe = (op, _) => tripped ::= op
    try {
      TimeSeries.interpolateLinear(series, "ts", "v", limit = 2).count()
      assert(tripped.isEmpty)
    } finally { ScaleGuard.probe = null; ScaleGuard.reset() }
  }
}
