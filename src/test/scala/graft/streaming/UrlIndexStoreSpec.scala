package graft.streaming

import graft.TestSpark
import graft.text.Urls
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlIndexStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ids follow arrival order (the ingest contract, like
  // ParagraphIndexStoreSpec): stream keeps the first ARRIVAL per
  // canonical URL, the batch twin the lowest id.
  val corpusRows = Seq(
    (1L, "http://www.news.org/story?utm_source=a", "seed story"),
    (2L, "https://blog.example.com/post/", "seed post"),
    (3L, "not a url", "unparseable seed"))
  val batches = Seq(
    // 10: tracking/case variant of the seed story -> dropped;
    // 11: new page; 12: same-batch variant of 11 -> dropped
    Seq((10L, "HTTP://NEWS.ORG/story#top", "dup of seed"),
      (11L, "https://shop.example.com/item?b=2&a=1", "new page"),
      (12L, "https://shop.example.com/item?a=1&b=2&fbclid=x",
        "same-batch dup")),
    // 20: late variant of the page 11 introduced (GROWING index);
    // 21: fresh; 22: unparseable, always kept
    Seq((20L, "https://shop.example.com/item/?a=1&b=2", "late dup"),
      (21L, "https://docs.example.com/guide", "fresh"),
      (22L, "also not a url", "unparseable late")))

  test("growing url dedup at ingest equals the batch " +
      "dedupByCanonicalUrl keepers; unparseable urls always pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files
      .createTempDirectory("url_index").toString
    val store = new UrlIndexStore(spark, tmp)
    store.initialize(corpusRows.toDF("doc_id", "url", "text"))
    val mem = MemoryStream[(Long, String, String)]
    val q = store.ingest(mem.toDF().toDF("doc_id", "url", "text"))
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val got = store.accepted.select(col("doc_id")).orderBy("doc_id")
      .as[Long].collect().toSeq
    val want = Urls.dedupByCanonicalUrl(
        (corpusRows ++ batches.flatten).toDF("doc_id", "url", "text"),
        "url", "doc_id")
      .where(!col("is_url_dup")).select(col("doc_id"))
      .orderBy("doc_id").as[Long].collect().toSeq
    assert(got == want, s"stream=$got batch=$want")
    assert(got == Seq(1L, 2L, 3L, 11L, 21L, 22L))
    // the index holds exactly the accepted canonicals
    val idx = store.urlTable.select(col("canonical_url"))
      .as[String].collect().toSet
    val acc = store.accepted.select(col("canonical_url"))
      .where(col("canonical_url").isNotNull)
      .as[String].collect().toSet
    assert(idx == acc)
  }

  test("replaying a micro-batch id is idempotent") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("url_index_replay").toString
    val store = new UrlIndexStore(spark, tmp)
    store.initialize(corpusRows.toDF("doc_id", "url", "text"))
    val b1 = batches.head.toDF("doc_id", "url", "text")
    store.processBatch(b1, 0L)
    val once = store.accepted.select(col("doc_id")).orderBy("doc_id")
      .as[Long].collect().toSeq
    store.processBatch(b1, 0L)
    val twice = store.accepted.select(col("doc_id")).orderBy("doc_id")
      .as[Long].collect().toSeq
    assert(once == twice)
  }

  test("compact folds batch partitions into one base build and the " +
      "store keeps rejecting known canonicals afterwards") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("url_index_compact").toString
    val store = new UrlIndexStore(spark, tmp)
    store.initialize(corpusRows.toDF("doc_id", "url", "text"))
    store.processBatch(batches.head.toDF("doc_id", "url", "text"), 0L)
    def snap() = (
      store.urlTable.orderBy($"canonical_url")
        .as[String].collect().toSeq,
      store.accepted.select($"doc_id").orderBy($"doc_id")
        .as[Long].collect().toSeq)
    val before = snap()
    // cadence metric: base + one batch = 2 partitions; the poll
    // contract mirrors the bloom-backed stores' needsCompaction
    assert(store.ingestBatchCount == 2)
    assert(store.needsCompaction(maxBatches = 1))
    assert(!store.needsCompaction()) // default threshold far away
    store.compact()
    assert(snap() == before)
    assert(store.ingestBatchCount == 1)
    assert(!store.needsCompaction(maxBatches = 1))
    def parts(sub: String) = new java.io.File(s"$tmp/$sub").list()
      .filter(_.startsWith("ingest_batch=")).toSeq
    Seq("urls", "accepted").foreach { sub =>
      assert(parts(sub) == Seq("ingest_batch=-1"), sub)
    }
    // a post-compaction batch re-delivering a known canonical drops it
    val knownUrl = corpusRows.head._2
    store.processBatch(
      Seq((900L, knownUrl, "redelivered"),
        (901L, "http://fresh.example.org/new", "novel"))
        .toDF("doc_id", "url", "text"), 0L)
    val ids = store.accepted.select($"doc_id").as[Long].collect().toSet
    assert(!ids.contains(900L) && ids.contains(901L))
  }
  test("deleteIds: takedown removes the rows AND their canonicals — " +
      "a re-submitted variant of the url is accepted again; " +
      "surviving urls still reject variants") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("url_index_delete").toString
    val store = new UrlIndexStore(spark, tmp)
    store.initialize(corpusRows.toDF("doc_id", "url", "text"))
    store.deleteIds(Seq(1L).toDF("doc_id"))
    assert(store.accepted.where($"doc_id" === 1L).count() == 0)
    assert(store.accepted.count() == 2) // 2 and the unparseable 3
    // doc 1's canonical left the index with it: the membership
    // evidence for deleted content must not keep rejecting future
    // submissions of the url
    assert(store.urlTable.count() == 1)
    store.processBatch(
      Seq((30L, "http://news.org/story", "the page, returned"),
        (31L, "https://blog.example.com/post", "variant of survivor"))
        .toDF("doc_id", "url", "text"), 5L)
    val ids = store.accepted.select($"doc_id").as[Long].collect().toSet
    assert(ids.contains(30L), s"taken-down url not re-accepted: $ids")
    assert(!ids.contains(31L), s"surviving url stopped rejecting: $ids")
    // replaying the same delete is a no-op
    val n = store.accepted.count()
    store.deleteIds(Seq(1L).toDF("doc_id"))
    assert(store.accepted.count() == n)
  }
}
