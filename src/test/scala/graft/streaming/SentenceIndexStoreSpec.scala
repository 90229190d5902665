package graft.streaming

import graft.TestSpark
import graft.text.Curation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SentenceIndexStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ids FOLLOW arrival order (the ParagraphIndexStoreSpec contract):
  // the stream keeps the first ARRIVAL of each sentence, the batch
  // twin keeps the lowest (id, idx) — they agree when ids are
  // arrival-ordered (monotone ingest ids).
  val corpusRows = Seq(
    (1L, "Original reporting sentence here. The famous quote lives."),
    (2L, "Independent corpus text stands. Second original sentence."))
  // batch 1: doc 10 repeats a corpus sentence (drop) + brings a new
  // one; doc 11 repeats doc 10's NEW sentence within the same batch
  // (intra-batch first-wins). batch 2: doc 20 repeats doc 10's
  // accepted sentence — the GROWING-index proof; doc 21 is fresh.
  val batches = Seq(
    Seq((10L, "The famous quote lives. Brand new analysis lands."),
      (11L, "Brand new analysis lands. Its own commentary follows.")),
    Seq((20L, "Late arriving copy next. Brand new analysis lands."),
      (21L, "Entirely fresh sentence one. And another one arrives.")))

  test("growing sentence dedup at ingest: stream equals the " +
      "corpus-wide batch pass, later-arriving copies die") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files
      .createTempDirectory("sent_index").toString
    val store = new SentenceIndexStore(spark, tmp)
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
    val want = Curation.dedupSentences(
        (corpusRows ++ batches.flatten).toDF("doc_id", "text"),
        "text", "doc_id")
      .orderBy(col("doc_id")).select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    assert(got == want, s"stream=$got batch=$want")
    // the growing-index proof: doc 20 lost the sentence doc 10
    // introduced, though neither was in the initial corpus
    assert(got.find(_._1 == 20L).get._2 == "Late arriving copy next.")
    // intra-batch first-wins: doc 11 lost its repeat of doc 10's new
    // sentence in the SAME micro-batch
    assert(got.find(_._1 == 11L).get._2 ==
      "Its own commentary follows.")
    // the stored index covers exactly the kept sentences
    val keptHashes = Curation.sentenceHashes(store.cleaned, "text",
      "doc_id").select(col("sent_hash")).as[Long].collect().sorted
    val indexHashes = store.sentenceTable.select(col("sent_hash"))
      .as[Long].collect().sorted
    assert(indexHashes.toSeq == keptHashes.toSeq)
    // compaction PRESERVES the store-owned checkpoint (round-13
    // stance, all stores): a wiped checkpoint + replayable source
    // re-delivers every offset — duplicate doc rows in cleaned, and
    // resurrection of taken-down docs after deleteIds
    store.compact()
    assert(StorePaths.exists(spark, s"$tmp/checkpoint"),
      "compact() must not wipe the store-owned checkpoint")
    assert(store.cleaned.orderBy(col("doc_id"))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq == got)
  }

  test("index survives NON-INVERTIBLE re-segmentation: rebuilt text " +
      "that merges across a suppressed boundary still indexes the " +
      "KEPT sentences, so later duplicates die") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("sent_index_reseg").toString
    val store = new SentenceIndexStore(spark, tmp)
    store.initialize(
      Seq((1L, "Banana split sentence. Other stored text."))
        .toDF("doc_id", "text"), "text")
    // doc 10 keeps "He said no." and "3 dogs barked today." (the
    // banana sentence is known); the REBUILT text "He said no. 3
    // dogs barked today." re-segments as ONE sentence (the dot sits
    // before whitespace+digit, the no./st. protection suppresses the
    // boundary) — an index derived by re-segmenting would store one
    // merged hash and lose both kept sentences
    store.processBatch(
      Seq((10L, "He said no. Banana split sentence. " +
        "3 dogs barked today.")).toDF("doc_id", "text"), "text", 0L)
    val idx = store.sentenceTable
      .select($"doc_id", $"sent_hash").as[(Long, Long)].collect()
      .filter(_._1 == 10L).map(_._2).toSet
    val wantHashes = Seq("He said no.", "3 dogs barked today.")
      .toDF("s").select(xxhash64($"s")).as[Long].collect().toSet
    assert(idx == wantHashes, s"index=$idx want=$wantHashes")
    // and the stored index actually kills the later duplicate
    store.processBatch(
      Seq((20L, "3 dogs barked today. Fresh ending line."))
        .toDF("doc_id", "text"), "text", 1L)
    val d20 = store.cleaned.where($"doc_id" === 20L)
      .select($"text").as[String].head()
    assert(d20 == "Fresh ending line.", d20)
  }

  test("replaying a micro-batch id is idempotent") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("sent_index_replay").toString
    val store = new SentenceIndexStore(spark, tmp)
    store.initialize(corpusRows.toDF("doc_id", "text"), "text")
    val b1 = batches.head.toDF("doc_id", "text")
    store.processBatch(b1, "text", 0L)
    val once = store.cleaned.orderBy(col("doc_id"))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    // redelivery of the SAME batch id must see the index as it stood
    // before the first attempt — not drop its own folded sentences
    store.processBatch(b1, "text", 0L)
    val twice = store.cleaned.orderBy(col("doc_id"))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    assert(once == twice)
    assert(store.sentenceTable.count() ==
      Curation.sentenceHashes(store.cleaned, "text", "doc_id").count())
  }

  test("compact folds every batch partition into one base build " +
      "WITHOUT re-segmenting rebuilt text: membership, cleaned text, " +
      "and post-compaction dedup behavior are exactly preserved") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("sent_index_compact").toString
    val store = new SentenceIndexStore(spark, tmp)
    store.initialize(corpusRows.toDF("doc_id", "text"), "text")
    batches.zipWithIndex.foreach { case (b, i) =>
      store.processBatch(b.toDF("doc_id", "text"), "text", i.toLong)
    }
    // doc 30 keeps "He said no." and "3 dogs barked today." as
    // SEPARATE sentences, but its REBUILT text rejoins them around
    // the no.-before-digit protection and would re-segment as ONE —
    // compact must carry the index rows as data, not recompute them
    store.processBatch(
      Seq((30L, "He said no. Entirely fresh sentence one. " +
        "3 dogs barked today.")).toDF("doc_id", "text"), "text", 2L)
    def snapshot(s: SentenceIndexStore) = (
      s.sentenceTable.orderBy($"doc_id", $"sent_idx")
        .as[(Long, Int, Int, Long)].collect().toSeq,
      s.cleaned.orderBy($"doc_id")
        .select($"doc_id", $"n_sentences", $"n_dropped", $"text")
        .as[(Long, Long, Long, String)].collect().toSeq)
    val before = snapshot(store)
    store.compact()
    assert(snapshot(store) == before)
    // exactly one base partition per table remains
    def parts(sub: String) = new java.io.File(s"$tmp/$sub").list()
      .filter(_.startsWith("ingest_batch=")).toSeq
    Seq("sentences", "cleaned", "blooms").foreach { sub =>
      assert(parts(sub) == Seq("ingest_batch=-1"), sub)
    }
    // and the compacted store still kills a later duplicate (the
    // sharded filters were rebuilt from the snapshot)
    store.processBatch(
      Seq((40L, "3 dogs barked today. Unseen closing words."))
        .toDF("doc_id", "text"), "text", 0L)
    assert(store.cleaned.where($"doc_id" === 40L)
      .select($"text").as[String].head() == "Unseen closing words.")
  }

  test("compact recovers from a crash between the wipe and the " +
      "rewrite: committed snapshots are the recovery artifact, a " +
      "second compact() resumes from them") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("sent_index_crash").toString
    val store = new SentenceIndexStore(spark, tmp)
    store.initialize(corpusRows.toDF("doc_id", "text"), "text")
    store.processBatch(batches.head.toDF("doc_id", "text"), "text", 0L)
    val before = store.cleaned.orderBy($"doc_id")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    // simulate the worst crash window: snapshots committed, store
    // wiped, rewrite never ran (driver died)
    store.sentenceTable.write.mode("overwrite")
      .parquet(s"$tmp/compact_tmp_sentences")
    store.cleaned.write.mode("overwrite")
      .parquet(s"$tmp/compact_tmp_cleaned")
    StorePaths.wipe(spark, Seq(s"$tmp/sentences", s"$tmp/cleaned",
      s"$tmp/blooms", s"$tmp/checkpoint"))
    // the store is unreadable right now — compact() must notice the
    // committed snapshots and resume the write-back
    store.compact()
    val after = store.cleaned.orderBy($"doc_id")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    assert(after == before)
    // recovered store still dedups against everything it ever kept
    store.processBatch(
      Seq((50L, "Brand new analysis lands. Post recovery line."))
        .toDF("doc_id", "text"), "text", 1L)
    assert(store.cleaned.where($"doc_id" === 50L)
      .select($"text").as[String].head() == "Post recovery line.")
    // and the snapshots were consumed — a later compact starts fresh
    assert(!StorePaths.committed(spark, s"$tmp/compact_tmp_sentences"))
  }

  test("STALE committed snapshots never roll the store back: a crash " +
      "after a complete rewrite leaves snapshots behind, new batches " +
      "ingest, and the next compact keeps them") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("sent_index_stale").toString
    val store = new SentenceIndexStore(spark, tmp)
    store.initialize(corpusRows.toDF("doc_id", "text"), "text")
    // simulate: a compact completed its rewrite but died before
    // deleting its snapshots — the store is intact AND committed
    // snapshots of the OLD state linger
    store.sentenceTable.write.mode("overwrite")
      .parquet(s"$tmp/compact_tmp_sentences")
    store.cleaned.write.mode("overwrite")
      .parquet(s"$tmp/compact_tmp_cleaned")
    // life goes on: a new batch lands AFTER the stale snapshots
    store.processBatch(batches.head.toDF("doc_id", "text"), "text", 0L)
    val withNew = store.cleaned.orderBy($"doc_id")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    assert(withNew.exists(_._1 == 10L))
    // the next compact must NOT resume from the stale snapshots —
    // that would silently erase docs 10/11
    store.compact()
    val after = store.cleaned.orderBy($"doc_id")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    assert(after == withNew, s"rolled back: $after vs $withNew")
    // and the post-compact store still remembers batch-0 sentences
    store.processBatch(
      Seq((60L, "Brand new analysis lands. Stale check ending."))
        .toDF("doc_id", "text"), "text", 0L)
    assert(store.cleaned.where($"doc_id" === 60L)
      .select($"text").as[String].head() == "Stale check ending.")
  }

  test("bloom sub-filters grow one-per-shard per batch; " +
      "needsCompaction flags the cadence and compact resets it") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("sent_index_bloomgrow").toString
    val store = new SentenceIndexStore(spark, tmp,
      bloomShardCount = 4, bloomItemsPerShard = 1L << 12)
    // every batch needs enough DISTINCT sentences to land rows in all
    // 4 shards, or the busiest-shard count undershoots the batch
    // count (a batch only writes sub-filter rows for shards its kept
    // sentences hash into)
    def wide(from: Int) = (0 until 2).map { d =>
      ((from + d).toLong, (0 until 60).map(i =>
        s"Wide batch sentence ${from + d} dash $i goes here.")
        .mkString(" "))
    }
    store.initialize(wide(0).toDF("doc_id", "text"), "text")
    assert(store.bloomSubFiltersPerShard == 1L)
    Seq(wide(100), wide(200)).zipWithIndex.foreach { case (b, i) =>
      store.processBatch(b.toDF("doc_id", "text"), "text", i.toLong)
    }
    assert(store.bloomSubFiltersPerShard == 3L)
    assert(store.needsCompaction(maxSubFilters = 2))
    assert(!store.needsCompaction(maxSubFilters = 8))
    store.compact()
    assert(store.bloomSubFiltersPerShard == 1L)
    assert(!store.needsCompaction(maxSubFilters = 2))
  }

  test("compact REFUSES to wipe snapshot tmps when the live store " +
      "is unreadable and the tmps are not provably committed — the " +
      "marker-less-committer crash window keeps its only recovery " +
      "artifact") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("sent_index_guard").toString
    val store = new SentenceIndexStore(spark, tmp)
    store.initialize(corpusRows.toDF("doc_id", "text"), "text")
    // simulate a crash between wipe and rewrite under a committer
    // that suppresses _SUCCESS markers: snapshots fully written but
    // unmarked, live store gone
    store.sentenceTable.write.mode("overwrite")
      .parquet(s"$tmp/compact_tmp_sentences")
    store.cleaned.write.mode("overwrite")
      .parquet(s"$tmp/compact_tmp_cleaned")
    Seq("compact_tmp_sentences", "compact_tmp_cleaned").foreach { d =>
      StorePaths.wipe(spark, Seq(s"$tmp/$d/_SUCCESS"))
    }
    StorePaths.wipe(spark, Seq(s"$tmp/sentences", s"$tmp/cleaned",
      s"$tmp/blooms", s"$tmp/checkpoint"))
    // without the guard this wiped the tmps (the only copy), then
    // died reading the empty store — unrecoverable loss
    val e = intercept[IllegalStateException] { store.compact() }
    assert(e.getMessage.toLowerCase.contains("refusing to wipe"))
    // the recovery artifact survives intact
    assert(spark.read.parquet(s"$tmp/compact_tmp_sentences")
      .count() > 0)
    assert(spark.read.parquet(s"$tmp/compact_tmp_cleaned")
      .count() == corpusRows.length)
  }

  test("compaction sorts the index base by hash: a batch's " +
      "exact-confirm probe reads a FRACTION of the index bytes " +
      "(parquet row-group pruning), with membership unchanged") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("sent_index_prune").toString
    // small blooms so the probe's byte profile is the INDEX scan,
    // not filter I/O
    val shards = 4
    val store = new SentenceIndexStore(spark, tmp,
      bloomShardCount = shards, bloomItemsPerShard = 1L << 12)
    def docs(from: Long, n: Long, perDoc: Int) =
      spark.range(from, from + n).select($"id".as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(perDoc - 1)),
          j => concat(lit("Unique corpus sentence number "),
            ($"id" * perDoc + j).cast("string"),
            lit(" stays put.")))).as("text"))
    store.initialize(docs(0, 5000, 20), "text") // 100k sentences
    store.processBatch(docs(5100, 500, 20), "text", 0L)
    store.processBatch(docs(5700, 500, 20), "text", 1L)
    // probe batch: 10 docs, each one KNOWN sentence (spread over the
    // corpus) + one fresh — so the confirm set is ~10 hashes
    val probeBatch = spark.range(0, 10)
      .select(($"id" + 9000).as("doc_id"),
        concat(lit("Unique corpus sentence number "),
          ($"id" * 487).cast("string"), lit(" stays put. "),
          lit("Probe only sentence number "), $"id".cast("string"),
          lit(" arrives now.")).as("text"))
      .localCheckpoint(true) // materialized OUTSIDE the byte windows
    // parquet's vectored-IO read path bypasses the Hadoop FileSystem
    // statistics that feed inputMetrics.bytesRead (measured: every
    // query "reads" exactly the footer bytes) — route data-page reads
    // through the counted stream for the duration of the measurement
    val hc = spark.sparkContext.hadoopConfiguration
    val prevVectored = hc.get("parquet.hadoop.vectored.io.enabled")
    hc.setBoolean("parquet.hadoop.vectored.io.enabled", false)
    val inputBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          inputBytes.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(listener)
    def measured[A](f: => A): (A, Long) = {
      org.apache.spark.graft.ListenerBusBarrier.drain(
        spark.sparkContext)
      val b0 = inputBytes.get()
      val a = f
      org.apache.spark.graft.ListenerBusBarrier.drain(
        spark.sparkContext)
      (a, inputBytes.get() - b0)
    }
    try {
      // the sharded probe's exact-confirm runs EAGERLY at call time,
      // so the call itself is the byte window; the cleaned output is
      // collected outside it (memory-only inputs from there on)
      def probe() = measured {
        Curation.dedupSentencesAgainstWithIndexSharded(probeBatch,
          store.sentenceTable, store.bloomShards, shards,
          "text", "doc_id")
      }
      val (preFrames, preBytes) = probe()
      val preCleaned = preFrames._1.orderBy($"doc_id")
        .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      // compact with enough range partitions that a ~10-hash probe
      // can only touch a small minority of the sorted files
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "64")
      try store.compact()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      val (postFrames, postBytes) = probe()
      val postCleaned = postFrames._1.orderBy($"doc_id")
        .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      // membership/result unchanged: same cleaned output, and every
      // probe doc actually lost its known sentence
      assert(postCleaned == preCleaned)
      assert(postCleaned.forall(_._2.startsWith("Probe only")))
      // a full index read, for scale: what the probe costs when
      // nothing prunes
      // an EXPRESSION aggregate, so neither parquet footer-stats
      // aggregate pushdown (which answers a bare max() from metadata
      // in ~footer bytes) nor row-group pruning can dodge the read
      val (_, fullBytes) = measured {
        store.sentenceTable
          .agg(max(pmod($"sent_hash", lit(1000000)))).head()
      }
      // the sorted base prunes: the post-compaction probe reads far
      // less than both the pre-compaction probe and a full scan
      // (expected ~10 of 64 range files + footers; assert with wide
      // headroom against layout/footer noise)
      info(s"probe bytes: pre-compact=$preBytes " +
        s"post-compact=$postBytes full-scan=$fullBytes")
      assert(postBytes * 2 < preBytes,
        s"post=$postBytes pre=$preBytes full=$fullBytes")
      assert(postBytes * 2 < fullBytes,
        s"post=$postBytes pre=$preBytes full=$fullBytes")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      if (prevVectored == null)
        hc.unset("parquet.hadoop.vectored.io.enabled")
      else hc.set("parquet.hadoop.vectored.io.enabled", prevVectored)
    }
  }

  test("minSentChars keeps short sentences out of the stored index " +
      "entirely (they are never deduped, so they buy nothing but " +
      "bloat) while the cleaned text keeps them") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("sent_index_minchars").toString
    val store = new SentenceIndexStore(spark, tmp, minSentChars = 12)
    store.initialize(
      Seq((1L, "Yes. This sentence is long enough to index."))
        .toDF("doc_id", "text"), "text")
    val idx = store.sentenceTable
      .select($"sent_chars").as[Int].collect()
    assert(idx.forall(_ >= 12), idx.mkString(","))
    assert(idx.length == 1)
    // the short sentence survives in the text — out of the INDEX is
    // not out of the CORPUS
    assert(store.cleaned.select($"text").as[String].head()
      .startsWith("Yes."))
    // ...and a later batch repeating the short sentence keeps it too
    // (never deduped at this threshold)
    store.processBatch(
      Seq((2L, "Yes. Another sufficiently long sentence arrives."))
        .toDF("doc_id", "text"), "text", 0L)
    assert(store.cleaned.where($"doc_id" === 2L)
      .select($"text").as[String].head().startsWith("Yes."))
  }

  test("deleteIds: the document leaves the cleaned corpus and its " +
      "kept sentences leave the index — membership FORGETS them, so " +
      "a later copy is kept anew; surviving docs still dedup") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("sent_index_delete").toString
    val store = new SentenceIndexStore(spark, tmp)
    store.initialize(corpusRows.toDF("doc_id", "text"), "text")
    // take down doc 1 — sole keeper of "The famous quote lives."
    store.deleteIds(Seq(1L).toDF("doc_id"))
    assert(store.cleaned.where(col("doc_id") === 1L).count() == 0)
    assert(store.sentenceTable.where(col("doc_id") === 1L)
      .count() == 0)
    assert(store.cleaned.count() == 1)
    // post-takedown semantics: the content left the corpus, so its
    // future copies must not be suppressed on evidence the store no
    // longer holds
    store.processBatch(
      Seq((30L, "The famous quote lives. Fresh trailing sentence."))
        .toDF("doc_id", "text"), "text", 3L)
    assert(store.cleaned.where(col("doc_id") === 30L)
      .select(col("text")).as[String].head() ==
      "The famous quote lives. Fresh trailing sentence.")
    // while the SURVIVING doc 2's sentences still kill copies (the
    // delete filtered, it did not rebuild membership from scratch)
    store.processBatch(
      Seq((31L, "Independent corpus text stands. Trailing bit here."))
        .toDF("doc_id", "text"), "text", 4L)
    assert(store.cleaned.where(col("doc_id") === 31L)
      .select(col("text")).as[String].head() == "Trailing bit here.")
    // replaying the same delete is a no-op (anti-join idempotence)
    val n = store.cleaned.count()
    store.deleteIds(Seq(1L).toDF("doc_id"))
    assert(store.cleaned.count() == n)
  }
}
