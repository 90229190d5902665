package graft.streaming

import graft.TestSpark
import graft.text.{Bpe, Unigram}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tokenization at ingest: both tokenizers' encode paths are
  * stateless mapPartitions scans with broadcast models, so they run
  * UNCHANGED on a streaming frame in append mode — no state store, no
  * watermark, stream ≡ batch per row. (Training stays batch: models
  * are versioned artifacts, the industry shape.) */
class StreamingTokenizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val docRows = Seq(
    (1L, "the newest analysis of the lowest numbers"),
    (2L, "Mixed CASE and émojis 🎈 survive byte level"),
    (3L, null.asInstanceOf[String]),
    (4L, "the the the"))

  test("bpe byte-level encode: stream equals batch across " +
      "micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val train = Seq((0L, "the newest lowest the the newest"))
      .toDF("doc_id", "text")
    val merges = Bpe.trainBytes(train, "text", numMerges = 6,
      minFreq = 1L)
    assert(merges.nonEmpty)
    val mem = MemoryStream[(Long, String)]
    val q = Bpe.encodeBytes(mem.toDF().toDF("doc_id", "text"),
        "text", "doc_id", merges)
      .writeStream.outputMode("append").format("memory")
      .queryName("bpe_ingest").start()
    try {
      mem.addData(docRows.take(2))
      q.processAllAvailable()
      mem.addData(docRows.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("bpe_ingest").orderBy($"doc_id")
      .select($"doc_id", $"pieces", $"n_pieces")
      .as[(Long, Seq[String], Long)].collect().toSeq
    val want = Bpe.encodeBytes(docRows.toDF("doc_id", "text"),
        "text", "doc_id", merges)
      .orderBy($"doc_id")
      .select($"doc_id", $"pieces", $"n_pieces")
      .as[(Long, Seq[String], Long)].collect().toSeq
    assert(got == want)
    // and the byte-level guarantee holds through the stream: decode
    // restores the emoji row exactly
    val emoji = got.find(_._1 == 2L).get._2
    assert(Bpe.decodePieces(emoji) == docRows(1)._2)
  }

  test("unigram viterbi encode-to-ids: stream equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val train = Seq(("the", 10L), ("newest", 6L), ("lowest", 4L))
      .toDF("word", "freq")
    val model = Unigram.mleScores(
      Unigram.seedVocab(train, "word", "freq", 50, 4))
    val mem = MemoryStream[(Long, String)]
    val q = Unigram.encodeToIds(mem.toDF().toDF("doc_id", "text"),
        "text", "doc_id", model)
      .writeStream.outputMode("append").format("memory")
      .queryName("unigram_ingest").start()
    try {
      mem.addData(docRows.take(2))
      q.processAllAvailable()
      mem.addData(docRows.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("unigram_ingest").orderBy($"doc_id")
      .select($"doc_id", $"pieces", $"ids", $"score_micros")
      .as[(Long, Seq[String], Seq[Int], Long)].collect().toSeq
    val want = Unigram.encodeToIds(docRows.toDF("doc_id", "text"),
        "text", "doc_id", model)
      .orderBy($"doc_id")
      .select($"doc_id", $"pieces", $"ids", $"score_micros")
      .as[(Long, Seq[String], Seq[Int], Long)].collect().toSeq
    assert(got == want)
    assert(got.find(_._1 == 3L).get._2.isEmpty) // null text tolerated
  }
}
