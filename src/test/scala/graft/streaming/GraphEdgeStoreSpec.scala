package graft.streaming

import graft.TestSpark
import graft.core.Graphs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The growing edge store: grown ≡ one-shot, replay idempotence,
  * rank-preserving compaction, checkpoint rules, node takedown. */
class GraphEdgeStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edgesDf(rows: Seq[(String, String, Long)]) =
    rows.toDF("src", "dst", "w")

  private val seedEdges = Seq(
    ("a", "b", 3L), ("a", "c", 1L), ("b", "a", 2L), ("c", "a", 5L),
    ("c", "d", 1L), ("d", "a", 1L))
  private val lateEdges = Seq(
    ("a", "b", 2L), // re-observed pair: must ADD weight
    ("d", "e", 4L), ("e", "a", 1L))

  private def ranks(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("initialize + pageRank equals the direct weighted rank; " +
      "grown store equals the one-shot union (re-observed edges " +
      "add weight); redelivered batches overwrite, not duplicate") {
    val tmp = java.nio.file.Files
      .createTempDirectory("edge_store").toString
    val store = new GraphEdgeStore(spark, tmp,
      weightCol = Some("w"))
    store.initialize(edgesDf(seedEdges))
    assert(ranks(store.pageRank(iterations = 3)) ==
      ranks(Graphs.weightedPageRankMicros(edgesDf(seedEdges),
        "src", "dst", "w", iterations = 3)))
    store.processBatch(edgesDf(lateEdges), 0L)
    val oneShot = ranks(Graphs.weightedPageRankMicros(
      edgesDf(seedEdges ++ lateEdges), "src", "dst", "w",
      iterations = 3))
    assert(ranks(store.pageRank(iterations = 3)) == oneShot)
    // replay: same batch id lands twice -> same rows, same ranks
    store.processBatch(edgesDf(lateEdges), 0L)
    assert(store.edgeTable.count() ==
      (seedEdges.size + lateEdges.size))
    assert(ranks(store.pageRank(iterations = 3)) == oneShot)
  }

  test("compact folds and AGGREGATES parallel pairs — ranks " +
      "unchanged, table shrinks to distinct pairs, checkpoint kept") {
    val tmp = java.nio.file.Files
      .createTempDirectory("edge_store_c").toString
    // fabricate a checkpoint dir to observe the keep rule
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$tmp/checkpoint/offsets"))
    val store = new GraphEdgeStore(spark, tmp, weightCol = Some("w"))
    store.initialize(edgesDf(seedEdges))
    // initialize wipes the checkpoint (new store, fresh offsets)
    assert(!StorePaths.exists(spark, s"$tmp/checkpoint"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$tmp/checkpoint/offsets"))
    store.processBatch(edgesDf(lateEdges), 0L)
    val before = ranks(store.pageRank(iterations = 3))
    assert(store.ingestBatchCount == 2)
    store.compact()
    assert(store.ingestBatchCount == 1)
    // the re-observed (a,b) pair folded into one summed row
    assert(store.edgeTable.count() ==
      (seedEdges ++ lateEdges).map(e => (e._1, e._2)).distinct.size)
    assert(ranks(store.pageRank(iterations = 3)) == before)
    // compact KEEPS the checkpoint: no membership gate to absorb a
    // replayable source's re-delivery (every weight would double)
    assert(StorePaths.exists(spark, s"$tmp/checkpoint"),
      "compact() must not wipe the edge store's checkpoint")
  }

  test("streaming ingest equals the batch folds") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files
      .createTempDirectory("edge_store_s").toString
    val store = new GraphEdgeStore(spark, tmp, weightCol = Some("w"))
    store.initialize(edgesDf(seedEdges))
    val mem = MemoryStream[(String, String, Long)]
    val q = store.ingest(mem.toDF()
      .select($"_1".as("src"), $"_2".as("dst"), $"_3".as("w")))
    try {
      mem.addData(lateEdges)
      q.processAllAvailable()
    } finally q.stop()
    assert(ranks(store.pageRank(iterations = 3)) ==
      ranks(Graphs.weightedPageRankMicros(
        edgesDf(seedEdges ++ lateEdges), "src", "dst", "w",
        iterations = 3)))
  }

  test("deleteNodes removes the node and every edge touching it; " +
      "personalized rank through the store matches the direct form") {
    val tmp = java.nio.file.Files
      .createTempDirectory("edge_store_d").toString
    val store = new GraphEdgeStore(spark, tmp, weightCol = Some("w"))
    store.initialize(edgesDf(seedEdges))
    store.processBatch(edgesDf(lateEdges), 0L)
    val direct = ranks(Graphs.weightedPersonalizedPageRankMicros(
      edgesDf(seedEdges ++ lateEdges), "src", "dst", "w",
      Seq("a").toDF("node"), "node", iterations = 3))
    assert(ranks(store.personalizedPageRank(Seq("a").toDF("node"),
      "node", iterations = 3)) == direct)
    store.deleteNodes(Seq("c").toDF("node"))
    val after = store.edgeTable.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(!after.exists(e => e._1 == "c" || e._2 == "c"))
    // the node is gone from the rank's node set entirely
    assert(!ranks(store.pageRank(iterations = 2)).contains("c"))
    // takedown is rank-equivalent to never having had the node
    val expected = ranks(Graphs.weightedPageRankMicros(
      edgesDf((seedEdges ++ lateEdges)
        .filter(e => e._1 != "c" && e._2 != "c")),
      "src", "dst", "w", iterations = 3))
    assert(ranks(store.pageRank(iterations = 3)) == expected)
  }

  test("default weight-1 store counts re-observations; ingest " +
      "refuses without a base build; bad weights fail at landing") {
    val tmp = java.nio.file.Files
      .createTempDirectory("edge_store_g").toString
    val store = new GraphEdgeStore(spark, tmp) // no weight column
    val unweighted = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    store.initialize(unweighted)
    // re-observing a->b in a later batch doubles its weight
    store.processBatch(Seq(("a", "b")).toDF("src", "dst"), 0L)
    assert(ranks(store.pageRank(iterations = 1)) ==
      ranks(Graphs.weightedPageRankMicros(
        Seq(("a", "b", 2L), ("b", "a", 1L)).toDF("src", "dst", "w"),
        "src", "dst", "w", iterations = 1)))
    val fresh = new GraphEdgeStore(spark,
      java.nio.file.Files.createTempDirectory("edge_store_n")
        .toString)
    val e1 = intercept[IllegalArgumentException] {
      fresh.processBatch(unweighted, 0L)
    }
    assert(e1.getMessage.contains("base build missing"))
    val wStore = new GraphEdgeStore(spark,
      java.nio.file.Files.createTempDirectory("edge_store_w")
        .toString, weightCol = Some("w"))
    val e2 = intercept[Throwable] {
      wStore.initialize(edgesDf(Seq(("a", "b", 0L))))
    }
    def chain(t: Throwable): String = {
      var m = List.empty[String]; var c = t
      while (c != null) { m ::= String.valueOf(c.getMessage); c = c.getCause }
      m.mkString(" | ")
    }
    assert(chain(e2).contains("positive integer"), chain(e2))
  }
}
