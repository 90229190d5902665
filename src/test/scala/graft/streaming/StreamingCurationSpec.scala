package graft.streaming

import graft.TestSpark
import graft.text.Curation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingCurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // probe doc shares its 13-gram tail with doc 2 below
  val probeText = ("alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu nu xi omicron pi rho sigma tau")
  val docRows = Seq(
    (1L, (1 to 60).map(i => "word" + i).grouped(20)
      .map(_.mkString(" ") + " ends.").mkString("\n") +
      " mail me at a@b.com"),
    (2L, "prefix words then " + probeText + " and a longer tail " +
      (1 to 40).map(i => "tok" + i).mkString(" ")),
    (3L, "short"))

  test("curation ingest stream equals the batch stages, across " +
      "micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val probes = Seq((100L, probeText)).toDF("doc_id", "text")
    val hashes = StreamingCuration.probeGramHashes(probes, "text")
    assert(hashes.nonEmpty)

    val mem = MemoryStream[(Long, String)]
    val q = StreamingCuration.curationIngestStream(
        mem.toDF().toDF("doc_id", "text"), "text", hashes)
      .select($"doc_id", $"keep", $"n_shared", $"contaminated",
        $"quality", $"text_redacted")
      .writeStream.outputMode("append").format("memory")
      .queryName("curation_ingest").start()
    try {
      mem.addData(docRows.take(2))
      q.processAllAvailable()
      mem.addData(docRows.drop(2)) // later micro-batch
      mem.addData(Seq((4L, null.asInstanceOf[String]))) // null text
      q.processAllAvailable()
      // the null-text row must land with a DEFINED clean verdict, not
      // a null/-1 n_shared (the admit gate reads these columns)
      val nullRow = spark.table("curation_ingest")
        .where($"doc_id" === 4L).collect()
      assert(nullRow.length == 1 &&
        nullRow.head.getLong(2) == 0L && nullRow.head.getLong(3) == 0L)
      val got = spark.table("curation_ingest")
        .where($"doc_id" <= 3L).orderBy($"doc_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(5)))

      // batch twin: heuristic verdict + decontaminate + redaction
      val docs = docRows.toDF("doc_id", "text")
      val stats = Curation.heuristicStats(docs, "text")
        .select($"doc_id", $"keep")
      val decon = Curation.decontaminate(docs, probes, "text", "doc_id")
      val want = docs
        .join(stats, "doc_id").join(decon, "doc_id")
        .select($"doc_id", $"keep", $"n_shared", $"contaminated",
          Curation.redactPii($"text").as("red"))
        .orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4)))

      assert(got.toSeq == want.toSeq,
        s"stream=${got.toSeq} batch=${want.toSeq}")
      // the planted overlaps actually fired: doc 2 is contaminated
      // (shares the probe's 13-grams), doc 1 is clean but redacted,
      // doc 3 fails the word-count floor
      val byId = got.map(r => r._1 -> r).toMap
      assert(byId(2L)._4 == 1L && byId(2L)._3 > 0L)
      assert(byId(1L)._4 == 0L &&
        byId(1L)._5.contains("<EMAIL>"))
      assert(byId(3L)._2 == 0L)
    } finally q.stop()
  }
}
