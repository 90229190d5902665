package graft.streaming

import graft.TestSpark
import graft.text.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val base = "the quick brown fox jumps over the lazy dog and then " +
    "ran far away into the deep green forest before sunset tonight"
  val corpusRows = Seq(
    (100L, base),
    (101L, "completely unrelated words about spark query engines and " +
      "physical plans with many exchanges and scans in them today"),
    (102L, "another standalone corpus document mentioning shuffles " +
      "broadcasts and sort merge joins across the cluster machines"))
  val deltaRows = Seq(
    (1L, base),                                  // exact dup of 100
    (2L, base.replace("quick", "swift")),        // near dup of 100
    (3L, "a fresh delta document with entirely new content that " +
      "matches nothing in the standing corpus at all whatsoever"))

  test("stream ingest equals the batch delta-vs-corpus path") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = corpusRows.toDF("doc_id", "text")
    val corpusHashed = Dedup.shingleHashes(corpus, "text", "doc_id")
    val (buckets, docs) = Dedup.streamingCorpusIndex(corpusHashed,
      "doc_id", numHashes = 32, bands = 16)

    val mem = MemoryStream[(Long, String)]
    val q = StreamingDedup.nearDupIngestStream(
        mem.toDF().toDF("doc_id", "text"), buckets, docs,
        "text", "doc_id", numHashes = 32, bands = 16)
      .writeStream.outputMode("append").format("memory")
      .queryName("neardup_ingest").start()
    try {
      mem.addData(deltaRows.take(2))
      q.processAllAvailable()
      mem.addData(deltaRows.drop(2)) // later micro-batch
      q.processAllAvailable()
      val got = spark.table("neardup_ingest")
        .orderBy($"delta_id", $"corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

      val want = Dedup.nearDupAgainstCorpusFromHashes(
          Dedup.shingleHashes(deltaRows.toDF("doc_id", "text"), "text",
            "doc_id"), corpusHashed, "doc_id",
          numHashes = 32, bands = 16)
        .orderBy($"delta_id", $"corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

      assert(got.nonEmpty && got.toSeq == want.toSeq,
        s"stream=${got.toSeq} batch=${want.toSeq}")
      // each verified pair is emitted exactly once despite colliding
      // in many of the 16 bands
      assert(got.map(p => (p._1, p._2)).distinct.length == got.length)
    } finally q.stop()
  }
}
