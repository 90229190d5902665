package graft.text

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two winnowing implementations — keyed window function vs pure
  * row expression — must select the SAME fingerprints; and the row
  * form must run unchanged over a Structured Stream. */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def randomDocs(n: Int, seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val len = 1 + rnd.nextInt(60) // includes docs shorter than k, w
      (i.toLong, (1 to len).map(_ => s"w${rnd.nextInt(50)}")
        .mkString(" "))
    }
  }

  test("in-row expression form selects exactly the window form's set, " +
      "across k/w combinations and short docs") {
    for ((k, w) <- Seq((5, 4), (2, 2), (3, 6), (1, 1))) {
      val docs = randomDocs(40, seed = 100L * k + w)
        .toDF("doc_id", "text")
      val a = Dedup.winnowFingerprints(docs, "text", "doc_id", k, w)
      val b = Dedup.winnowFingerprintsInRow(docs, "text", "doc_id", k, w)
      assert(a.except(b).isEmpty && b.except(a).isEmpty,
        s"(k=$k, w=$w): forms disagree")
    }
  }

  test("in-row form has no exchange in its physical plan") {
    val docs = randomDocs(5, 7L).toDF("doc_id", "text")
    val plan = Dedup.winnowFingerprintsInRow(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"expected a shuffle-free plan, got:\n$plan")
    val windowed = Dedup.winnowFingerprints(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(windowed.contains("Window"), "window form sanity check")
  }

  test("in-row form streams in append mode, stream equals batch") {
    implicit val sqlCtx = spark.sqlContext
    val rows = randomDocs(12, 99L)
    val mem = MemoryStream[(Long, String)]
    val q = Dedup.winnowFingerprintsInRow(
        mem.toDF().toDF("doc_id", "text"), "text", "doc_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("winnow_stream").start()
    try {
      mem.addData(rows.take(7))
      q.processAllAvailable()
      mem.addData(rows.drop(7)) // later micro-batch
      q.processAllAvailable()
      val got = spark.table("winnow_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val want = Dedup.winnowFingerprints(rows.toDF("doc_id", "text"),
          "text", "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got == want, "stream must equal the batch selection")
    } finally q.stop()
  }
}
