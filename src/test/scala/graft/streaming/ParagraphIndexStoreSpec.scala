package graft.streaming

import graft.TestSpark
import graft.text.Curation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ParagraphIndexStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ids FOLLOW arrival order (corpus 1-2, then 10-11, then 20-21):
  // the stream keeps the first ARRIVAL of each paragraph, the batch
  // twin keeps the lowest (id, idx) — the two agree exactly when ids
  // are arrival-ordered, which is the ingest contract (monotone ids).
  val corpusRows = Seq(
    (1L, "original reporting paragraph\n\nthe famous quote"),
    (2L, "independent corpus text\n\nsecond original paragraph"))
  // batch 1: doc 10 repeats a corpus paragraph (drop) + brings a new
  // one; doc 11 repeats doc 10's NEW paragraph within the same batch
  // (intra-batch first-wins). batch 2: doc 20 repeats doc 10's
  // accepted paragraph — the GROWING-index proof (neither copy was in
  // the initial corpus); doc 21 is all fresh.
  val batches = Seq(
    Seq((10L, "the famous quote\n\nbrand new analysis"),
      (11L, "brand new analysis\n\nits own commentary")),
    Seq((20L, "late arriving copy of\n\nbrand new analysis"),
      (21L, "entirely fresh paragraph\n\nand another one")))

  test("growing paragraph dedup at ingest: stream equals the " +
      "corpus-wide batch pass, later-arriving copies die") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files
      .createTempDirectory("para_index").toString
    val store = new ParagraphIndexStore(spark, tmp)
    store.initialize(corpusRows.toDF("doc_id", "text"), "text")
    val mem = MemoryStream[(Long, String)]
    val q = store.ingest(mem.toDF().toDF("doc_id", "text"), "text")
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val got = store.cleaned.orderBy(col("doc_id"))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    // the batch twin: one corpus-wide pass over everything, in id
    // order (= arrival order here)
    val want = Curation.dedupParagraphs(
        (corpusRows ++ batches.flatten).toDF("doc_id", "text"),
        "text", "doc_id")
      .orderBy(col("doc_id")).select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    assert(got == want, s"stream=$got batch=$want")
    // the growing-index proof specifically: doc 20 lost the paragraph
    // doc 10 introduced, though neither was in the initial corpus
    val d20 = got.find(_._1 == 20L).get._2
    assert(d20 == "late arriving copy of")
    // intra-batch first-wins: doc 11 lost its repeat of doc 10's new
    // paragraph in the SAME micro-batch
    assert(got.find(_._1 == 11L).get._2 == "its own commentary")
    // the stored index covers exactly the kept paragraphs
    val keptHashes = Curation.paragraphHashes(store.cleaned, "text",
      "doc_id").select(col("para_hash")).as[Long].collect().sorted
    val indexHashes = store.paragraphTable.select(col("para_hash"))
      .as[Long].collect().sorted
    assert(indexHashes.toSeq == keptHashes.toSeq)
    // the sharded Bloom artifact GREW per batch: the merged view
    // flags every kept paragraph (no false negatives across the base
    // build AND both folded batches)
    val flagged = Curation.flagMaybeKnownParagraphsSharded(
      store.cleaned, "text", "doc_id", store.bloomShards, 32)
    assert(flagged.where(!col("maybe_known")).count() == 0)
  }

  test("replaying a micro-batch id is idempotent") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("para_index_replay").toString
    val store = new ParagraphIndexStore(spark, tmp)
    store.initialize(corpusRows.toDF("doc_id", "text"), "text")
    val b1 = batches.head.toDF("doc_id", "text")
    store.processBatch(b1, "text", 0L)
    val once = store.cleaned.orderBy(col("doc_id"))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    // redelivery of the SAME batch id must see the index as it stood
    // before the first attempt — not drop its own folded paragraphs
    store.processBatch(b1, "text", 0L)
    val twice = store.cleaned.orderBy(col("doc_id"))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    assert(once == twice)
    assert(store.paragraphTable.count() ==
      Curation.paragraphHashes(store.cleaned, "text", "doc_id").count())
  }

  test("compact folds every batch partition into one base build: " +
      "membership, cleaned text, and later dedup exactly preserved") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("para_index_compact").toString
    val store = new ParagraphIndexStore(spark, tmp)
    store.initialize(corpusRows.toDF("doc_id", "text"), "text")
    batches.zipWithIndex.foreach { case (b, i) =>
      store.processBatch(b.toDF("doc_id", "text"), "text", i.toLong)
    }
    def snapshot(s: ParagraphIndexStore) = (
      s.paragraphTable.orderBy($"doc_id", $"para_idx")
        .as[(Long, Int, Int, Long)].collect().toSeq,
      s.cleaned.orderBy($"doc_id")
        .select($"doc_id", $"n_paras", $"n_dropped", $"text")
        .as[(Long, Long, Long, String)].collect().toSeq)
    val before = snapshot(store)
    store.compact()
    assert(snapshot(store) == before)
    def parts(sub: String) = new java.io.File(s"$tmp/$sub").list()
      .filter(_.startsWith("ingest_batch=")).toSeq
    Seq("paragraphs", "cleaned", "blooms").foreach { sub =>
      assert(parts(sub) == Seq("ingest_batch=-1"), sub)
    }
    // post-compaction the store still dedups against everything it
    // ever kept — including paragraphs folded from batches
    store.processBatch(
      Seq((40L, "brand new analysis\n\nnever seen closing para"))
        .toDF("doc_id", "text"), "text", 0L)
    assert(store.cleaned.where($"doc_id" === 40L)
      .select($"text").as[String].head() == "never seen closing para")
  }

  test("compact crash recovery mirrors the sentence store: committed " +
      "snapshots resume a wiped store; stale ones never roll back") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("para_index_crash").toString
    val store = new ParagraphIndexStore(spark, tmp)
    store.initialize(corpusRows.toDF("doc_id", "text"), "text")
    store.processBatch(batches.head.toDF("doc_id", "text"), "text", 0L)
    val before = store.cleaned.orderBy($"doc_id")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    // crash window: snapshots committed, store wiped, rewrite lost
    store.paragraphTable.write.mode("overwrite")
      .parquet(s"$tmp/compact_tmp_paragraphs")
    store.cleaned.write.mode("overwrite")
      .parquet(s"$tmp/compact_tmp_cleaned")
    StorePaths.wipe(spark, Seq(s"$tmp/paragraphs", s"$tmp/cleaned",
      s"$tmp/blooms", s"$tmp/checkpoint"))
    store.compact()
    assert(store.cleaned.orderBy($"doc_id")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      == before)
    // stale-snapshot case: snapshots linger while the store is
    // intact and keeps ingesting — compact must keep the new batch
    store.paragraphTable.write.mode("overwrite")
      .parquet(s"$tmp/compact_tmp_paragraphs")
    store.cleaned.write.mode("overwrite")
      .parquet(s"$tmp/compact_tmp_cleaned")
    store.processBatch(batches(1).toDF("doc_id", "text"), "text", 1L)
    val withNew = store.cleaned.orderBy($"doc_id")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    store.compact()
    assert(store.cleaned.orderBy($"doc_id")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      == withNew)
  }
  test("deleteIds: the document and its kept paragraphs leave the " +
      "store; membership forgets them; survivors still dedup") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("para_index_delete").toString
    val store = new ParagraphIndexStore(spark, tmp)
    store.initialize(corpusRows.toDF("doc_id", "text"), "text")
    // take down doc 1 — sole keeper of "the famous quote"
    store.deleteIds(Seq(1L).toDF("doc_id"))
    assert(store.cleaned.where(col("doc_id") === 1L).count() == 0)
    assert(store.paragraphTable.where(col("doc_id") === 1L)
      .count() == 0)
    // a later copy of the deleted-only paragraph is KEPT anew
    store.processBatch(
      Seq((30L, "the famous quote\n\nfresh follow up paragraph"))
        .toDF("doc_id", "text"), "text", 3L)
    assert(store.cleaned.where(col("doc_id") === 30L)
      .select(col("text")).as[String].head() ==
      "the famous quote\n\nfresh follow up paragraph")
    // while doc 2's surviving paragraphs still kill copies
    store.processBatch(
      Seq((31L, "independent corpus text\n\ntrailing new bit"))
        .toDF("doc_id", "text"), "text", 4L)
    assert(store.cleaned.where(col("doc_id") === 31L)
      .select(col("text")).as[String].head() == "trailing new bit")
  }
  test("deleteIds refuses to ride a crashed compaction's resume " +
      "(it would restore the UNFILTERED snapshot and silently skip " +
      "the deletion); compact() then deleteIds completes it") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("para_index_del_resume").toString
    val store = new ParagraphIndexStore(spark, tmp)
    store.initialize(corpusRows.toDF("doc_id", "text"), "text")
    // crash window: snapshots committed, base wiped mid-rewrite
    store.paragraphTable.write.mode("overwrite")
      .parquet(s"$tmp/compact_tmp_paragraphs")
    store.cleaned.write.mode("overwrite")
      .parquet(s"$tmp/compact_tmp_cleaned")
    StorePaths.wipe(spark, Seq(s"$tmp/paragraphs", s"$tmp/cleaned",
      s"$tmp/blooms"))
    val e = intercept[IllegalStateException] {
      store.deleteIds(Seq(1L).toDF("doc_id"))
    }
    assert(e.getMessage.contains("skip this deletion"))
    // the pending compaction resumes normally...
    store.compact()
    assert(store.cleaned.where(col("doc_id") === 1L).count() == 1)
    // ...and the deletion lands once the store is whole again
    store.deleteIds(Seq(1L).toDF("doc_id"))
    assert(store.cleaned.where(col("doc_id") === 1L).count() == 0)
    assert(store.paragraphTable.where(col("doc_id") === 1L)
      .count() == 0)
  }
}
