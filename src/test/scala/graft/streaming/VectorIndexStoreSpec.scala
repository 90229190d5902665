package graft.streaming

import graft.TestSpark
import graft.core.Tables
import graft.similarity.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorIndexStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val emb =
    Tables.table(spark, TestSpark.sfDir, "embeddings").cache()

  private def mkStore(tmp: String) = new VectorIndexStore(spark, tmp,
    nlist = 4, m = 8, ksub = 8, sampleSize = 256)

  private def canon(df: org.apache.spark.sql.DataFrame) = df
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    .sortBy(x => (x._1, x._4)).toSeq

  test("initialize + topK equals the direct in-memory IVF-PQ pipeline " +
      "under the store's own persisted model") {
    val tmp = java.nio.file.Files
      .createTempDirectory("vec_index").toString
    val store = mkStore(tmp)
    val corpus = emb.where($"vec_id" < 300)
    store.initialize(corpus)
    val q = emb.where($"vec_id" < 3)
    // the model round-trips through parquet: searching the store must
    // equal running the in-memory pipeline with the READ-BACK model
    val (cents, books) = store.model
    val direct = Similarity.ivfPqTopKWithParams(corpus, q, "embedding",
      "vec_id", "vec_id", k = 5, cents, books, nprobe = 2)
    assert(canon(store.topK(q, "vec_id", k = 5, nprobe = 2))
      == canon(direct))
  }

  test("topKManyQueries (distributed probe) equals topK (driver-LUT " +
      "probe) through the store") {
    val tmp = java.nio.file.Files
      .createTempDirectory("vec_index_mq").toString
    val store = mkStore(tmp)
    store.initialize(emb.where($"vec_id" < 300))
    val q = emb.where($"vec_id" < 6)
    assert(canon(store.topKManyQueries(q, "vec_id", k = 5, nprobe = 2))
      == canon(store.topK(q, "vec_id", k = 5, nprobe = 2)))
  }

  test("growing ingest: codes accumulate per batch under the FROZEN " +
      "model, search covers every batch, replay is idempotent") {
    val tmp = java.nio.file.Files
      .createTempDirectory("vec_index_grow").toString
    val store = mkStore(tmp)
    store.initialize(emb.where($"vec_id" < 200))
    val b1 = emb.where($"vec_id" >= 200 && $"vec_id" < 350)
    val b2 = emb.where($"vec_id" >= 350)
    store.processBatch(b1, 0L)
    store.processBatch(b2, 1L)
    // equivalent one-shot index under the SAME model
    val (cents, books) = store.model
    val q = emb.where($"vec_id" < 3)
    val oneShot = Similarity.ivfPqTopKFromCodes(
      Similarity.ivfPqCodeTable(emb, "embedding", "vec_id", cents,
        books),
      q, "embedding", "vec_id", k = 5, cents, books, nprobe = 3)
    val grown = store.topK(q, "vec_id", k = 5, nprobe = 3)
    assert(canon(grown) == canon(oneShot))
    // a redelivered batch id overwrites itself, never duplicates
    val before = store.codeTable.count()
    store.processBatch(b2, 1L)
    assert(store.codeTable.count() == before)
    assert(canon(store.topK(q, "vec_id", k = 5, nprobe = 3))
      == canon(oneShot))
  }

  test("streaming ingest equals the batch folds; the store-owned " +
      "checkpoint resumes batch numbering") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files
      .createTempDirectory("vec_index_stream").toString
    val store = mkStore(tmp)
    store.initialize(emb.where($"vec_id" < 400))
    val late = emb.where($"vec_id" >= 400)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toSeq
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = store.ingest(mem.toDF()
      .select($"_1".as("vec_id"), $"_2".cast("array<float>")
        .as("embedding")))
    try {
      mem.addData(late)
      q.processAllAvailable()
    } finally q.stop()
    assert(store.codeTable.count() == emb.count())
    val queries = emb.where($"vec_id" < 3)
    val (cents, books) = store.model
    val oneShot = Similarity.ivfPqTopKFromCodes(
      Similarity.ivfPqCodeTable(emb, "embedding", "vec_id", cents,
        books),
      queries, "embedding", "vec_id", k = 5, cents, books, nprobe = 3)
    assert(canon(store.topK(queries, "vec_id", k = 5, nprobe = 3))
      == canon(oneShot))
    // compact() PRESERVES the store-owned checkpoint: this store has
    // no membership gate, so a wiped checkpoint + a replayable source
    // would re-deliver every already-indexed offset into fresh batch
    // partitions — duplicate corpus_ids at multiple topK ranks with
    // no error anywhere (the text stores survive that replay through
    // membership; this store's protection is the checkpoint)
    store.compact()
    assert(StorePaths.exists(spark, s"$tmp/checkpoint"),
      "compact() must not wipe the vector store's checkpoint")
    assert(canon(store.topK(queries, "vec_id", k = 5, nprobe = 3))
      == canon(oneShot))
  }

  test("deleteIds: deleted ids never surface in topK again, the " +
      "fold equals a one-shot index over the surviving corpus, the " +
      "cell layout (pruning) survives, and replay is idempotent") {
    val tmp = java.nio.file.Files
      .createTempDirectory("vec_index_delete").toString
    val store = mkStore(tmp)
    store.initialize(emb.where($"vec_id" < 300))
    store.processBatch(emb.where($"vec_id" >= 300), 0L)
    val q = emb.where($"vec_id" < 3)
    // take ids the index actually RETURNS, so the assertion bites
    val served = store.topK(q, "vec_id", k = 5, nprobe = 4)
      .select($"corpus_id").distinct().limit(3)
      .as[Long].collect().toSeq
    assert(served.nonEmpty)
    store.deleteIds(served.toDF("vec_id"))
    val after = store.topK(q, "vec_id", k = 5, nprobe = 4)
    assert(after.where($"corpus_id".isin(served: _*)).count() == 0)
    assert(store.codeTable
      .where($"corpus_id".isin(served: _*)).count() == 0)
    // deletion ≡ one-shot index over the surviving corpus under the
    // same frozen model
    val (cents, books) = store.model
    val survivors = emb.where(!$"vec_id".isin(served: _*))
    val oneShot = Similarity.ivfPqTopKFromCodes(
      Similarity.ivfPqCodeTable(survivors, "embedding", "vec_id",
        cents, books),
      q, "embedding", "vec_id", k = 5, cents, books, nprobe = 4)
    assert(canon(after) == canon(oneShot))
    // deletion IS a compaction: folded to one base, layout preserved
    assert(store.ingestBatchCount == 1)
    val planStr = after.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*centroid_id[^\\]]*".r
      .findFirstIn(planStr).nonEmpty, planStr)
    // replaying the SAME delete is a no-op (anti-join idempotence)
    val count = store.codeTable.count()
    store.deleteIds(served.toDF("vec_id"))
    assert(store.codeTable.count() == count)
    assert(canon(store.topK(q, "vec_id", k = 5, nprobe = 4))
      == canon(oneShot))
    // a deleted id RE-INGESTED later is indexed anew (no tombstones —
    // an index, not a dedup gate)
    store.processBatch(emb.where($"vec_id" === served.head), 7L)
    assert(store.codeTable
      .where($"corpus_id" === served.head).count() == 1)
  }

  test("topKRefined through the store equals the composed " +
      "Similarity.ivfPqTopKRefined under the persisted model") {
    val tmp = java.nio.file.Files
      .createTempDirectory("vec_index_refine").toString
    val store = mkStore(tmp)
    store.initialize(emb)
    val q = emb.where($"vec_id" < 3)
    val (cents, books) = store.model
    val direct = Similarity.ivfPqTopKRefined(
      Similarity.ivfPqCodeTable(emb, "embedding", "vec_id", cents,
        books),
      emb, q, "embedding", "vec_id", "vec_id", k = 5, cents, books,
      nprobe = 2, refineFactor = 4)
    assert(canon(store.topKRefined(q, "vec_id", k = 5, emb,
      nprobe = 2, refineFactor = 4)) == canon(direct))
    // the refine re-ranks by EXACT distance, so each query's self
    // (distance 0) is rank 1 whenever its cell was probed — and the
    // query's own cell is always its nearest, so always probed
    val self = store.topKRefined(q, "vec_id", k = 5, emb, nprobe = 2)
      .where($"query_id" === $"corpus_id").select($"rank")
      .as[Int].collect()
    assert(self.length == 3 && self.forall(_ == 1))
  }

  test("distributedTrain store: searching equals the direct pipeline " +
      "under the ivfPqTrainDistributed model (the large-nlist path)") {
    val tmp = java.nio.file.Files
      .createTempDirectory("vec_index_dist").toString
    // iterations=1: the store's ONE iterations knob must govern the
    // COARSE Lloyd count on this path too (a mis-forwarded knob
    // would train 5 Lloyd passes and diverge from wantCents below)
    val store = new VectorIndexStore(spark, tmp, nlist = 4, m = 8,
      ksub = 8, sampleSize = 256, iterations = 1,
      distributedTrain = true)
    store.initialize(emb)
    val q = emb.where($"vec_id" < 3)
    // the persisted model IS the distributed-trained one
    val (wantCents, _) = Similarity.ivfPqTrainDistributed(emb,
      "embedding", "vec_id", nlist = 4, m = 8, ksub = 8,
      sampleSize = 256, iterations = 1, lloydIters = 1)
    val (cents, books) = store.model
    assert(cents.map(_.toSeq).toSeq == wantCents.map(_.toSeq).toSeq)
    val direct = Similarity.ivfPqTopKWithParams(emb, q, "embedding",
      "vec_id", "vec_id", k = 5, cents, books, nprobe = 2)
    assert(canon(store.topK(q, "vec_id", k = 5, nprobe = 2))
      == canon(direct))
  }

  test("compact folds batch partitions into one base build, keeps the " +
      "centroid_id directory layout (pruning survives), and retrieval " +
      "is unchanged; cadence metric resets") {
    val tmp = java.nio.file.Files
      .createTempDirectory("vec_index_compact").toString
    val store = mkStore(tmp)
    store.initialize(emb.where($"vec_id" < 300))
    store.processBatch(emb.where($"vec_id" >= 300), 0L)
    val q = emb.where($"vec_id" < 3)
    val before = canon(store.topK(q, "vec_id", k = 5, nprobe = 2))
    assert(store.ingestBatchCount == 2)
    assert(store.needsCompaction(maxBatches = 1))
    store.compact()
    assert(store.ingestBatchCount == 1)
    assert(!store.needsCompaction(maxBatches = 1))
    assert(canon(store.topK(q, "vec_id", k = 5, nprobe = 2)) == before)
    // the folded base keeps one directory per cell — the layout the
    // probe's partition pruning needs
    val base = new java.io.File(s"$tmp/codes/ingest_batch=-1")
    val cellDirs = base.list().filter(_.startsWith("centroid_id="))
    assert(cellDirs.nonEmpty)
    val planStr = store.topK(q, "vec_id", k = 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*centroid_id[^\\]]*".r
      .findFirstIn(planStr).nonEmpty, planStr)
  }

  test("ingest refuses while the base build is missing: a batch " +
      "landed into a crashed-mid-compaction store would be wiped by " +
      "the compaction resume") {
    val tmp = java.nio.file.Files
      .createTempDirectory("vec_index_guard").toString
    val store = mkStore(tmp)
    store.initialize(emb.where($"vec_id" < 300))
    // simulate the crash window: compact() died after wiping the
    // codes root (its committed snapshot tmp is the recovery
    // artifact); the model survives, so an unguarded processBatch
    // would happily encode and write — and the resume would then
    // silently delete it
    StorePaths.wipe(spark, Seq(s"$tmp/codes"))
    val e = intercept[IllegalArgumentException] {
      store.processBatch(emb.where($"vec_id" >= 300), 0L)
    }
    assert(e.getMessage.contains("base build missing"))
  }
}
