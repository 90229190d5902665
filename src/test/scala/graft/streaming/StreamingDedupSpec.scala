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

  test("the BATCH join topology (broadcast delta, corpus tables " +
      "scanned) is row-identical to the stream-legal form and moves " +
      "a small fraction of its shuffle bytes") {
    import spark.implicits._
    // a corpus big enough that shuffling its tables is VISIBLE in the
    // byte measurement (the shingle-set docs table is the fat one)
    val corpus = spark.range(100, 2100)
      .select($"id".as("doc_id"), concat_ws(" ",
        transform(sequence(lit(0), lit(79)), j =>
          concat(lit("w"), pmod($"id" * 83 + j * 17, lit(4096))
            .cast("string")))).as("text"))
    val corpusHashed = Dedup.shingleHashes(corpus, "text", "doc_id")
    val (buckets, docs) = Dedup.streamingCorpusIndex(corpusHashed,
      "doc_id", numHashes = 32, bands = 16)
    val dir = java.nio.file.Files
      .createTempDirectory("neardup_batch_ab").toString
    buckets.write.mode("overwrite").parquet(s"$dir/buckets")
    docs.write.mode("overwrite").parquet(s"$dir/docs")
    val bucketsP = spark.read.parquet(s"$dir/buckets")
    val docsP = spark.read.parquet(s"$dir/docs")
    // delta: an exact clone of corpus doc 150, a near-clone of doc
    // 151, and a fresh doc matching nothing
    val dup = corpus.where($"doc_id" === 150L)
      .select($"text").as[String].head()
    val near = corpus.where($"doc_id" === 151L)
      .select($"text").as[String].head() + " extra tail words here"
    val withSig = Seq((1L, dup), (2L, near),
        (3L, "a fresh delta document with entirely new content " +
          "matching nothing in the standing corpus whatsoever"))
      .toDF("doc_id", "text")
      .select(col("doc_id").as("delta_id"), col("text"))
      .withColumn("gh_", Dedup.shingleHashSetExpr(col("text"), 3))
      .withColumn("bks_", Dedup.bandBucketsExpr(
        Dedup.minhashSigExpr(col("gh_"), 32), 32, 16))
      .localCheckpoint(true) // materialized outside the byte windows
    val shuffled = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit = shuffled.addAndGet(
        sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    // CALL-BY-NAME: the batch topology is eager (candidate collect +
    // checkpointed fetch at construction), so building the frame
    // before the byte window opens would hide its per-batch shuffle
    def measured(df: => org.apache.spark.sql.DataFrame)
        : (Seq[(Long, Long, Double)], Long) = {
      org.apache.spark.graft.ListenerBusBarrier.drain(
        spark.sparkContext)
      val b0 = shuffled.get()
      val rows = df.orderBy($"delta_id", $"corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      org.apache.spark.graft.ListenerBusBarrier.drain(
        spark.sparkContext)
      (rows, shuffled.get() - b0)
    }
    // the production regime: the corpus tables are far over any
    // broadcast threshold and the checkpoint-backed delta has no
    // usable size estimate, so the planner cannot auto-broadcast
    // EITHER side — at spec scale the tiny corpus would be
    // auto-broadcast and hide the pathology, so rule it out
    // explicitly; the batch topology's broadcast() HINTS are exactly
    // what still applies under a -1 threshold
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf
      .getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val (streamRows, streamBytes) = measured(
        StreamingDedup.nearDupIngestFromSig(withSig, bucketsP, docsP,
          0.5))
      val (batchRows, batchBytes) = measured(
        StreamingDedup.nearDupIngestFromSigBatch(withSig, bucketsP,
          docsP, 0.5))
      assert(batchRows == streamRows,
        s"batch=$batchRows stream=$streamRows")
      assert(batchRows.nonEmpty)
      // the stream-legal form shuffles the corpus bucket + doc
      // tables; the batch topology broadcasts the delta and scans
      // them — its shuffle stays candidate-scale
      assert(batchBytes * 4 < streamBytes,
        s"batch=$batchBytes stream=$streamBytes")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
      // restore "unset" as unset: pinning a default here would break
      // the adaptive threshold's fallback-to-static for LATER suites
      // in the shared session
      prevAqe match {
        case Some(v) => spark.conf
          .set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf
          .unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }
}
