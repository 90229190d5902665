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

  test("training-shard layout: shard dirs partition-prune, every " +
      "FILE streams rows in pos order, round-trip is lossless") {
    val docs = (0 until 500).map(i => (i.toLong, s"doc $i"))
      .toDF("doc_id", "text")
    val ordered = graft.text.Curation.trainingOrder(docs,
      Seq("doc_id"), numShards = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_shards")
      .toString + "/epoch0"
    Tables.writeTrainingShards(ordered, dir)
    val back = spark.read.parquet(dir)
    // lossless: same (doc_id, shard, pos) triples
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"shard".cast("int"), $"pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
    assert(canon(back) == canon(ordered))
    // a loader reading one shard directory gets training order
    // WITHOUT a sort: rows inside each parquet FILE are pos-ascending
    val files = new java.io.File(s"$dir/shard=3").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val pos = spark.read.parquet(f.getAbsolutePath)
        .select($"pos").collect().map(_.getLong(0)).toSeq
      assert(pos == pos.sorted, s"file ${f.getName} not pos-sorted")
    }
    // shard filters prune at the directory level
    val plan = back.where($"shard" === 3).queryExecution.executedPlan
      .toString
    assert("PartitionFilters: \\[[^\\]]*shard[^\\]]*".r
      .findFirstIn(plan).nonEmpty, plan)
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
