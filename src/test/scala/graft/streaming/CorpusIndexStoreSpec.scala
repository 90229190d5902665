package graft.streaming

import graft.TestSpark
import graft.text.{Clusters, Dedup}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusIndexStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val base = "the quick brown fox jumps over the lazy dog and then " +
    "ran far away into the deep green forest before sunset tonight"
  val docA = "a genuinely new arrival document about stream ingest " +
    "gates growing their standing index with every accepted batch"
  val docB = "completely different prose describing parquet buckets " +
    "and idempotent overwrites of partition directories at scale"
  val corpusRows = Seq(
    (100L, base),
    (101L, "unrelated words about spark query engines and physical " +
      "plans with many exchanges and scans in them today"),
    (102L, "another standalone corpus document mentioning shuffles " +
      "broadcasts and sort merge joins across the cluster machines"))
  // batch 1: one fresh doc (accept), one clone of the base corpus
  // (reject). batch 2: a near-clone of batch 1's ACCEPTED doc — the
  // growing-index proof: rejected even though doc 1 was never in the
  // initial corpus — plus a fresh doc (accept). batch 3: two mutual
  // clones arriving TOGETHER — intra-batch dedup keeps the min id.
  val batches = Seq(
    Seq((1L, docA), (2L, base.replace("quick", "swift"))),
    Seq((3L, docA.replace("genuinely", "truly")), (4L, docB)),
    Seq((5L, docB.replace("different", "distinct") + " twin"),
      (6L, docB.replace("different", "distinct") + " twin two")))
  // doc 5 near-dups doc 4? it is docB edited twice — and 6 near-dups
  // 5; the sequential-fold twin below decides the ground truth, the
  // store must agree exactly.

  def newStore(tmp: String) = new CorpusIndexStore(spark, tmp,
    numHashes = 32, bands = 16)

  /** The batch twin: fold micro-batches sequentially with the BATCH
    * primitives (delta-vs-corpus, then within-batch keeper drop),
    * growing the corpus between batches. */
  def batchFold(): Set[Long] = {
    import spark.implicits._
    var corpus = corpusRows.toDF("doc_id", "text")
    batches.foreach { b =>
      val delta = b.toDF("doc_id", "text")
      val dup = Dedup.nearDupAgainstCorpusFromHashes(
          Dedup.shingleHashes(delta, "text", "doc_id"),
          Dedup.shingleHashes(corpus, "text", "doc_id"),
          "doc_id", numHashes = 32, bands = 16, minJaccard = 0.5)
        .select(col("delta_id")).distinct()
        .as[Long].collect().toSet
      val surv = b.filterNot(d => dup(d._1)).toDF("doc_id", "text")
      val pairs = Dedup.nearDupPairsFromHashes(
        Dedup.shingleHashes(surv, "text", "doc_id"), "doc_id",
        minJaccard = 0.5, numHashes = 32)
      val kept = surv.join(
        Clusters.assign(surv.select(col("doc_id")), "doc_id", pairs)
          .where(col("is_keeper") === 1).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      corpus = corpus.unionByName(kept).localCheckpoint()
    }
    corpus.select(col("doc_id")).as[Long].collect().toSet
  }

  test("growing ingest rejects clones of accepted arrivals and " +
      "equals the sequential batch fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files
      .createTempDirectory("corpus_index").toString
    val store = newStore(tmp)
    store.initialize(corpusRows.toDF("doc_id", "text"), "text")

    val mem = MemoryStream[(Long, String)]
    val q = store.ingest(mem.toDF().toDF("doc_id", "text"), "text",
      minJaccard = 0.5)
    try {
      batches.foreach { b =>
        mem.addData(b)
        q.processAllAvailable()
      }
      val got = store.accepted.select(col("doc_id"))
        .as[Long].collect().toSet
      val want = batchFold()
      assert(got == want, s"stream=$got batch=$want")
      // the growing-index proof specifically: doc 3 (clone of the
      // ACCEPTED doc 1, absent from the initial corpus) was rejected,
      // and exactly one of the intra-batch twins survived
      assert(got.contains(1L) && !got.contains(3L))
      assert(got.contains(5L) != got.contains(6L) ||
        (!got.contains(5L) && !got.contains(6L)))
      // index tables grew consistently with the accepted set
      val indexed = store.docTable.select(col("corpus_id"))
        .as[Long].collect().toSet
      assert(indexed == got)
    } finally q.stop()
  }

  test("a restarted ingest resumes batch numbering from the " +
      "store-owned checkpoint (no overwrite of earlier batches)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files
      .createTempDirectory("corpus_index_restart").toString
    val store = newStore(tmp)
    store.initialize(corpusRows.toDF("doc_id", "text"), "text")
    val mem1 = MemoryStream[(Long, String)]
    val q1 = store.ingest(mem1.toDF().toDF("doc_id", "text"), "text")
    try {
      mem1.addData(Seq((1L, docA)))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(store.accepted.where(col("doc_id") === 1L).count() == 1)
    // a SECOND query on the same store: without the store-owned
    // checkpoint its first micro-batch would reuse batchId 0 —
    // hiding doc 1 from the corpus check AND overwriting its
    // partition, so its clone would be admitted and doc 1 destroyed
    val mem2 = MemoryStream[(Long, String)]
    val q2 = store.ingest(mem2.toDF().toDF("doc_id", "text"), "text")
    try {
      // recovery treats the new source's offsets up to the committed
      // checkpoint as already processed — this first addData is
      // swallowed by design; the second fires as the NEXT batch id
      mem2.addData(Seq((8L, "placeholder row consumed by recovery")))
      mem2.addData(Seq((9L, docA.replace("genuinely", "truly")),
        (10L, docB)))
      q2.processAllAvailable()
    } finally q2.stop()
    val ids = store.accepted.select(col("doc_id"))
      .as[Long].collect().toSet
    assert(ids.contains(10L), "liveness: second query's batch ran")
    assert(ids.contains(1L), "doc 1 was destroyed by a batch-id clash")
    assert(!ids.contains(9L), "clone of accepted doc 1 was admitted")
  }

  test("replaying a micro-batch id is idempotent") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("corpus_index_replay").toString
    val store = newStore(tmp)
    store.initialize(corpusRows.toDF("doc_id", "text"), "text")
    val b = batches.head.toDF("doc_id", "text")
    store.processBatch(b, "text", 0.5, batchId = 7L)
    val once = store.accepted.orderBy(col("doc_id")).collect().toSeq
    val buckets1 = store.bucketTable.count()
    // foreachBatch redelivery after a failure replays the SAME id —
    // the overwrite-per-partition sink must not duplicate anything
    store.processBatch(b, "text", 0.5, batchId = 7L)
    assert(store.accepted.orderBy(col("doc_id")).collect().toSeq
      == once)
    assert(store.bucketTable.count() == buckets1)
    // cadence metric before compaction: base + one batch; mirrors the
    // bloom-backed stores' needsCompaction poll contract
    assert(store.ingestBatchCount == 2)
    assert(store.needsCompaction(maxBatches = 1))
    assert(!store.needsCompaction())
    // compaction rebuilds from the accepted corpus, same membership
    store.compact()
    assert(store.accepted.orderBy(col("doc_id")).collect().toSeq
      == once)
    assert(store.docTable.select(col("corpus_id")).as[Long].collect()
      .toSet == once.map(_.getLong(0)).toSet)
    assert(store.ingestBatchCount == 1)
    assert(!store.needsCompaction(maxBatches = 1))
  }
  test("deleteIds: the document leaves the corpus and its signatures " +
      "leave the index — a near-clone of ONLY deleted content is " +
      "accepted afterwards; survivors still gate") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("corpus_index_delete").toString
    val store = newStore(tmp)
    store.initialize(corpusRows.toDF("doc_id", "text"), "text")
    store.deleteIds(Seq(100L).toDF("doc_id"))
    assert(store.accepted.where(col("doc_id") === 100L).count() == 0)
    assert(store.docTable.where(col("corpus_id") === 100L).count() == 0)
    assert(store.accepted.count() == 2)
    // a near-clone of the DELETED base doc is accepted now; a clone
    // of a SURVIVING doc still dies
    store.processBatch(
      Seq((30L, base.replace("quick", "swift")),
        (31L, corpusRows(1)._2.replace("unrelated", "unconnected")))
        .toDF("doc_id", "text"), "text", 0.5, batchId = 3L)
    val ids = store.accepted.select(col("doc_id")).as[Long].collect()
      .toSet
    assert(ids.contains(30L), s"clone of deleted doc rejected: $ids")
    assert(!ids.contains(31L), s"clone of survivor accepted: $ids")
  }
  test("compact() RESUMES from a committed snapshot after a crash " +
      "mid-rebuild instead of wiping the only surviving copy; " +
      "deleteIds refuses while that state is pending") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("corpus_index_crash").toString
    val store = newStore(tmp)
    store.initialize(corpusRows.toDF("doc_id", "text"), "text")
    val before = store.accepted.orderBy(col("doc_id")).collect().toSeq
    // crash window: snapshot committed, base wiped mid-rebuild — the
    // old compact() wiped the tmp FIRST on retry, destroying the
    // corpus' only surviving copy before discovering the base is gone
    store.accepted.write.mode("overwrite").parquet(s"$tmp/compact_tmp")
    StorePaths.wipe(spark, Seq(s"$tmp/buckets", s"$tmp/docs",
      s"$tmp/accepted"))
    val e = intercept[IllegalStateException] {
      store.deleteIds(Seq(100L).toDF("doc_id"))
    }
    assert(e.getMessage.contains("skip this deletion"))
    store.compact()
    assert(store.accepted.orderBy(col("doc_id")).collect().toSeq
      == before)
    assert(store.docTable.count() > 0)
    // the deletion completes once the store is whole again
    store.deleteIds(Seq(100L).toDF("doc_id"))
    assert(store.accepted.where(col("doc_id") === 100L).count() == 0)
  }
}
