package graft.core

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fleet = {
    val rows = for {
      st <- Seq("s1", "s2", "s3")
      d <- 1 to 60
      h <- 0 until 24
    } yield (st, f"2016-${1 + (d - 1) / 31}%02d-${1 + (d - 1) % 31}%02d $h%02d:00:00",
      (d * 24 + h).toDouble)
    rows.toDF("station", "s", "temp")
      .select($"station", to_timestamp($"s").as("timestamp"), $"temp")
  }

  test("station-partitioned layout round-trips and prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout")
      .toString + "/fleet"
    Tables.writeStationPartitioned(fleet, dir, Seq("station"),
      byMonth = true)
    // hive layout on disk: one dir per station, month dirs nested
    val top = new java.io.File(dir).listFiles().map(_.getName).sorted
      .filter(_.startsWith("station="))
    assert(top.toSeq == Seq("station=s1", "station=s2", "station=s3"))
    val back = Tables.readStationPartitioned(spark, dir)
    assert(back.count() == fleet.count())
    val a = fleet.select($"station", $"timestamp", $"temp")
      .orderBy($"station", $"timestamp").collect()
    val b = back.select($"station", $"timestamp", $"temp")
      .orderBy($"station", $"timestamp").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // a station+month filter becomes a PartitionFilter (directory
    // pruning before I/O), not a data filter
    val pruned = back.where($"station" === "s2" && $"part_month" === "2016-01")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters:"), scan)
    assert(scan.contains("(station#"), scan)
    assert(pruned.count() == 31 * 24)
    // files within a partition are time-sorted (read head of one file)
    val files = new java.io.File(s"$dir/station=s1/part_month=2016-01")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    val head = spark.read.parquet(files.head.getPath)
      .select($"timestamp").limit(3).collect().map(_.getTimestamp(0))
    assert(head.sorted.toSeq == head.toSeq)
  }

  test("bucketed tables join without an exchange on either side") {
    val left = spark.range(0, 10000)
      .select($"id".as("k"), ($"id" * 2).as("a"))
    val right = spark.range(0, 10000)
      .select($"id".as("k"), ($"id" * 3).as("b"))
    Tables.writeBucketed(left, "graft_bkt_l", Seq("k"), 8)
    Tables.writeBucketed(right, "graft_bkt_r", Seq("k"), 8)
    // force the non-broadcast path: at fleet scale both sides are big
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bkt_l")
        .join(spark.table("graft_bkt_r"), "k")
      assert(joined.count() == 10000)
      // the co-located join plans with zero shuffles: bucket layout
      // replaces both Exchanges
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), plan)
      // correctness: values line up per key
      assert(joined.where($"a" =!= $"k" * 2 || $"b" =!= $"k" * 3)
        .count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_l")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_r")
    }
  }
}
