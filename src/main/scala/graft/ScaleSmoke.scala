package graft

import graft.agg.Aggregations
import graft.cascade.{Cascade, CascadeStatistics}
import graft.disagg.Temperature
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multi-station scale smoke: synthesize N stations × Y years of hourly
  * data with expressions (no driver data), then run the station-partitioned
  * pipeline — daily aggregation, temperature disaggregation, cascade —
  * and print row counts + timings. `runMain graft.ScaleSmoke [stations]
  * [years]`. This is the shape that scales to a 1000-executor cluster:
  * all windows keyed by station_id, no driver loops, no collects beyond
  * tiny matrices.
  *
  * `runMain graft.ScaleSmoke <stations> <years> dedup-store` runs the
  * DEDUP CHAIN ONLY with every ingest artifact written to and re-read
  * from parquet (`SPARK_GRAFT_STORE`, default /tmp/graft_store) instead
  * of `localCheckpoint` — the real production shape, where signatures/
  * labels are stored tables and no artifact pins executor memory. This
  * is what lets the chain run at 10M docs in a modest-heap local JVM
  * (the in-memory harness pins all artifacts simultaneously and needs
  * 24g at 1M docs; the stored path streams each stage through disk).
  *
  * `runMain graft.ScaleSmoke <stations> <years> curation` runs the
  * WEB-INGEST chain (stations × 1000 synthesized HTML pages → html
  * main-content extraction → url canonicalize/dedup → paragraph dedup
  * → unigram seed + Viterbi encode) with planted URL-variant and
  * shared-paragraph cohorts whose drop counts are checked
  * in-harness. */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val stations = args.headOption.map(_.toInt).getOrElse(100)
    val years = args.lift(1).map(_.toInt).getOrElse(3)
    val mode = args.lift(2).getOrElse("all")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val days = years * 365
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.1f s  " +
        f"$n%,d rows")
    }
    // shuffle-WRITE bytes per stage, accumulated via listener: the
    // honest cluster metric local wall time hides (a single box
    // shuffles through memcpy; a 1000-executor cluster shuffles
    // through the network)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit =
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def tShuffle(label: String)(f: => Long): Unit = {
      // deterministic listener-bus drain before AND after the
      // measured action — sleeps let late stage events land outside
      // the window and mis-attribute bytes (race-prone now that the
      // shuffle columns are load-bearing evidence in README/PLANS)
      org.apache.spark.graft.ListenerBusBarrier.drain(
        spark.sparkContext)
      val s0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val n = f
      val secs = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBusBarrier.drain(
        spark.sparkContext)
      val mb = (shuffleBytes.get() - s0) / 1e6
      println(f"$label%-28s $secs%7.1f s  $n%,d rows  " +
        f"$mb%,.0f MB shuffled")
    }

    if (mode == "dedup-store") {
      dedupStored(spark, stations)
      spark.stop()
      return
    }
    if (mode == "curation") {
      curationChain(spark, stations)
      spark.stop()
      return
    }
    if (mode == "ivf") {
      ivfAssign(spark, stations)
      spark.stop()
      return
    }
    if (mode == "ann") {
      annLadder(spark, stations)
      spark.stop()
      return
    }
    if (mode == "stores") {
      storeIngest(spark, stations)
      spark.stop()
      return
    }
    if (mode == "graph") {
      graphRank(spark, stations)
      spark.stop()
      return
    }

    val dailyMet = spark.range(0, stations.toLong * days, 1, 32)
      .select(
        concat(lit("st"), (col("id") / days).cast("long")).as("station_id"),
        date_add(lit(java.sql.Date.valueOf("2016-01-01")),
          (col("id") % days).cast("int")).as("date"),
        (sin(col("id") / 58.1) * 8 + 278).as("tmin"),
        (sin(col("id") / 58.1) * 8 + 286).as("tmax"),
        when(pmod(col("id"), lit(3)) === 0,
          pmod(col("id"), lit(17)).cast("double")).otherwise(0.0)
          .as("precip"))
      .localCheckpoint(true)

    println(s"$stations stations x $years years = " +
      f"${stations.toLong * days}%,d daily rows " +
      f"(${stations.toLong * days * 24}%,d hourly)")

    t("temperature sine_min_max") {
      Temperature.disaggregate(dailyMet, "sine_min_max", "fix",
        partitionCols = Seq("station_id")).count()
    }
    t("cascade hourly") {
      Cascade.disaggregate(dailyMet,
        Left(CascadeStatistics.sampleData()),
        partitionCols = Seq("station_id")).count()
    }
    t("daily_from_hourly roundtrip") {
      val hourly = graft.core.TimeSeries.explodeDays(
        dailyMet.withColumnRenamed("tmin", "temp"), "date", 24,
        3600L * 1000000L)
      Aggregations.dailyFromHourly(hourly,
        partitionCols = Seq("station_id")).count()
    }

    // LLM-pipeline ops on a synthesized corpus: `stations` scales the
    // corpus (1k docs / 2k embeddings per station-equivalent), ~14% of
    // docs are near-exact clones of their neighbor — the near-dup rate
    // stays fixed as the corpus grows, so pair counts grow linearly and
    // so should wall time (band buckets + caps, no quadratic joins).
    val words = array((0 until 512).map(i => lit(s"w$i")): _*)
    val docs = spark.range(0, stations * 1000L, 1, 32)
      .select(col("id").as("doc_id"),
        when(pmod(col("id"), lit(7)) === 0, col("id") - 1)
          .otherwise(col("id")).as("seed"))
      .select(col("doc_id"), concat_ws(" ",
        transform(sequence(lit(1), lit(60)), i =>
          element_at(words,
            (pmod(xxhash64(col("seed"), i), lit(512)) + 1).cast("int"))))
          .as("text"))
      .localCheckpoint(true)
    // the signatures-at-ingest shape: tokenize+shingle+hash+explode
    // runs ONCE per corpus; every dedup query downstream is 8-byte
    // remixes of the stored hashes
    val hashed = graft.text.Dedup.shingleHashes(docs, "text", "doc_id")
      .localCheckpoint(false)
    t("shingle hashes (once at ingest)") { hashed.count() }
    t("minhash near-dups from stored hashes") {
      // numHashes=32 -> 16 bands of 2 (S-curve threshold 0.25, well
      // under 0.8*minJaccard): same recall guarantee as the 128-hash
      // default at a quarter of the signature hashing, which dominates
      // at corpus scale. Verification is exact either way.
      graft.text.Dedup.nearDupPairsFromHashes(hashed, "doc_id",
        minJaccard = 0.5, numHashes = 32).count()
    }
    // one stored signature table, one level past stored hashes: the
    // min-agg stage runs once and every pair query only bands+verifies
    val sigs = graft.text.Dedup.signatureTable(hashed, "doc_id",
      numHashes = 32)
    t("signature table (once at ingest)") { sigs.count() }
    t("minhash near-dups from stored signatures") {
      graft.text.Dedup.nearDupPairsFromSigTable(sigs, "doc_id",
        minJaccard = 0.5, numHashes = 32).count()
    }
    t("planted-clone recall (must be 100%)") {
      // ground truth is the construction: every doc_id ≡ 0 (mod 7),
      // id > 0, reuses its neighbor's seed → an exact clone pair
      // (id-1, id). A left-anti against the found pairs must be empty.
      val found = graft.text.Dedup.nearDupPairsFromSigTable(sigs,
        "doc_id", minJaccard = 0.5, numHashes = 32)
      val expected = docs
        .where(pmod(col("doc_id"), lit(7)) === 0 && col("doc_id") > 0)
        .select((col("doc_id") - 1).as("id_a"), col("doc_id").as("id_b"))
      val missed = expected
        .join(found, Seq("id_a", "id_b"), "left_anti").count()
      require(missed == 0,
        s"recall < 100%: $missed planted clone pairs missed")
      expected.count()
    }
    // stored cluster labels, one level past stored signatures: assign
    // runs the star-contraction closure ONCE; split/keeper/stats
    // consumers read the stored frame (the q102 shape)
    val labels = graft.text.Clusters.assign(docs, "doc_id",
      graft.text.Dedup.nearDupPairsFromSigTable(sigs, "doc_id",
        minJaccard = 0.5, numHashes = 32))
      .localCheckpoint(false)
    t("cluster labels (once at ingest)") { labels.count() }
    t("split from stored labels") {
      graft.text.Clusters.splitFromClusters(labels,
        valFrac = 0.1, testFrac = 0.1)
        .groupBy(col("split")).count().count()
    }
    t("delta-vs-corpus incremental dedup") {
      // today's 1% ingest against the standing corpus: only the delta
      // is new text; both sides' bands derive from the shared frame
      // (the +1 boundary puts one clone pair astride the split at 100
      // stations, same as the decontaminate stage below)
      graft.text.Dedup.nearDupAgainstCorpusFromHashes(
        hashed.where(col("doc_id") < stations * 10L + 1),
        hashed.where(col("doc_id") >= stations * 10L + 1),
        "doc_id", numHashes = 32, bands = 16,
        minJaccard = 0.5).count()
    }
    t("line boilerplate dedup") {
      // every 3rd doc shares a footer line; the line explode + hashed
      // doc-frequency + regroup is linear in corpus size
      graft.text.Curation.dedupLines(
        docs.withColumn("text", concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            lit("\nshared footer boilerplate line"))
            .otherwise(lit("")))),
        "text", "doc_id", maxDocs = 10).count()
    }
    // sketch-vs-exact deboiler on a BOILERPLATE-HEAVY, MULTI-LINE
    // crawl: pages of 12 unique body lines + one of 4096 distinct
    // banner lines (by doc_id % 4096, each in ~nDocs/4096 documents —
    // all true boilerplate at maxDocs=10). The line count is the
    // point: real pages carry dozens of lines, and exact dedupLines
    // pays an explode + (hash, doc) distinct + groupBy + join over
    // EVERY line (13M rows at 1M docs) while the sketch pays two
    // linear scans — task-local Misra-Gries counters, then an O(1)
    // broadcast-HashSet probe per line (the r8 typedLit/
    // array_contains rebuild scanned all ~4k candidates per line —
    // the literal-collection trap — and ate the sketch's advantage
    // at exactly this candidate count). On 1-2-line docs the exact
    // shuffle is too small to matter and constant overhead wins;
    // line-rich pages are the regime the sketch exists for. The
    // sketch may UNDER-drop when its N/(k+1) slack swallows a line
    // (safe direction); at these shapes both paths drop every banner.
    val heavy = docs.select(col("doc_id"), concat(
        concat_ws("\n", transform(sequence(lit(0), lit(11)), j =>
          concat_ws(" ", transform(sequence(lit(1), lit(8)), i =>
            element_at(words, (pmod(xxhash64(col("doc_id"), j, i),
              lit(512)) + 1).cast("int")))))),
        lit("\nbanner "), pmod(col("doc_id"), lit(4096)).cast("string"),
        lit(" cookie consent navigation footer text")).as("text"))
      .localCheckpoint(true)
    tShuffle("deboil EXACT (13 lines/doc)") {
      graft.text.Curation.dedupLines(heavy, "text", "doc_id",
        maxDocs = 10).agg(sum(col("n_dropped"))).head().getLong(0)
    }
    // sketchK = 2^17: MG slack N/(k+1) ≈ 99 at 13M qualifying lines,
    // so a banner at df ≈ 244 is GUARANTEED found with
    // countMin ≥ 145 ≥ maxDocs (the scaladoc's sizing rule; the 2^14
    // default's slack of 794 would swallow the whole banner set)
    tShuffle("deboil SKETCH (13 lines/doc)") {
      graft.text.Curation.dedupLinesApprox(heavy, "text", "doc_id",
        maxDocs = 10, sketchK = 1 << 17)
        .agg(sum(col("n_dropped"))).head().getLong(0)
    }
    t("exact-substring duplicate spans") {
      // clone pairs share their full 60-token text -> every 15-token
      // window in a clone is a corpus-duplicated span; hit volume
      // tracks the fixed clone rate, so this stays linear too. The
      // aggregate forces the span computation (a bare count of the
      // per-doc output could prune the hit join).
      graft.text.Dedup.duplicateSpans(docs, "text", "doc_id", n = 15)
        .agg(sum(col("n_dup_grams"))).head().getLong(0)
    }
    t("dedup clusters + drop") {
      // pairs -> star-contraction components -> keep one per cluster;
      // O(log n) rounds regardless of family shape, each round two
      // map-side-combined min groupBys + joins
      graft.text.Clusters.dropNearDuplicates(docs, "text", "doc_id",
        minJaccard = 0.5, numHashes = 32).count()
    }
    t("decontaminate vs 1k probes") {
      // probe gram set broadcasts; corpus side is one scan + explode.
      // sum(contaminated) rather than count(): a bare count lets the
      // optimizer skip the flagging join entirely. The 1001 boundary
      // (7|1001) puts one clone pair astride it -> expected sum 1.
      graft.text.Curation.decontaminate(
        docs.where(col("doc_id") >= 1001),
        docs.where(col("doc_id") < 1001), "text", "doc_id")
        .agg(sum(col("contaminated"))).head().getLong(0)
    }
    t("heuristic filter + PII redact") {
      // both pure maps: wall time tracks the scan, not the corpus shape
      graft.text.Curation.heuristicFilter(
        docs.withColumn("text",
          graft.text.Curation.redactPii(col("text"))), "text",
        graft.text.Curation.HeuristicBounds(minWords = 20)).count()
    }
    t("chunk into training windows") {
      // explode-only fan-out, chunks co-partitioned with docs
      graft.text.Curation.chunkTokens(docs, "text", Seq("doc_id"),
        maxTokens = 32, stride = 16).count()
    }
    t("pack chunks into budgets") {
      // next-fit packing per hash shard: one shuffle on the shard key,
      // one streaming state pass per partition — the chunk→sequence
      // step at its production keying (shards, not documents)
      val chunks = graft.text.Curation.chunkTokens(docs, "text",
          Seq("doc_id"), maxTokens = 32, stride = 16)
        .withColumn("shard", pmod(xxhash64(col("doc_id")), lit(64L)))
      graft.text.Curation.packGreedy(chunks, "n_tokens", budget = 256,
        keyCols = Seq("shard"), orderCols = Seq("doc_id", "chunk_idx"))
        .count()
    }
    t("coherent train/val/test split") {
      // near-dup clusters land atomically in one split; cost = the CC
      // rounds (diameter 2 here) + one md5 row expression — no
      // per-doc independent draw can leak a clone across splits
      graft.text.Clusters.coherentSplit(docs, "doc_id",
        graft.text.Dedup.nearDupPairsFromHashes(hashed, "doc_id",
          minJaccard = 0.5, numHashes = 32),
        valFrac = 0.1, testFrac = 0.1)
        .groupBy(col("split")).count().count()
    }
    t("epoch shuffle-and-shard") {
      // md5 permutation → shard + dense position: the one shuffle IS
      // the training-file write clustering
      graft.text.Curation.trainingOrder(docs, Seq("doc_id"),
        numShards = 64).count()
    }
    t("tf-idf top terms") {
      // two map-side-combined groupBys + a hash join on term
      graft.text.Curation.tfIdfTopTerms(docs, "text", "doc_id").count()
    }
    t("rolling 3h window per station") {
      val hourly = graft.core.TimeSeries.explodeDays(
        dailyMet.withColumnRenamed("tmin", "temp"), "date", 24,
        3600L * 1000000L)
      Aggregations.rollingTimeAgg(hourly, "timestamp", "temp",
        windowSeconds = 3 * 3600L,
        partitionCols = Seq("station_id")).count()
    }
    val embs = spark.range(0, stations * 2000L, 1, 32)
      .select(col("id").as("vec_id"),
        when(pmod(col("id"), lit(7)) === 0, col("id") - 1)
          .otherwise(col("id")).as("seed"))
      .select(col("vec_id"), transform(sequence(lit(0), lit(63)), i =>
        (pmod(xxhash64(col("seed"), i), lit(1000)).cast("double") / 500.0
          - 1.0).cast("float")).as("embedding"))
      .localCheckpoint(true)
    t("embedding near-dup pairs") {
      graft.text.Dedup.embeddingNearDups(embs, "embedding", "vec_id",
        minCosine = 0.95).count()
    }
    t("semdedup (auto planes)") {
      // auto mode probes n and dim in one action: planes sized so
      // occupancy stays ~8, plane matrix shipped as literals
      graft.similarity.Similarity.semDedupAuto(embs, "embedding",
        "vec_id", minCosine = 0.95)
        .where(col("dropped") === 1).count()
    }
    t("sq8 quantized top-5 (64 queries)") {
      // int8 codes: one corpus scan of integer multiply-adds; queries
      // broadcast. Wall time tracks the scan like brute force, at a
      // quarter of the at-rest bytes when codes are the stored form.
      graft.similarity.Similarity.sq8TopK(embs,
        embs.where(col("vec_id") < 64), "embedding", "vec_id",
        "vec_id", k = 5).count()
    }
    t("kmeans fit k=16 x 3 iters + assign") {
      // exact-integer Lloyd: per iteration one scan (literal-centroid
      // argmin fold, no join/shuffle) + one 16x64-sum hash aggregate;
      // only k*dim longs reach the driver per round
      val model = graft.similarity.KMeans.fit(embs, "embedding",
        "vec_id", k = 16, iters = 3)
      graft.similarity.KMeans.assign(embs, "embedding", model)
        .groupBy(col("cluster_id")).count().count()
    }
    t("perplexity buckets (per 8-way stratum)") {
      // unigram LM (two token-scale map-side-combined shuffles) +
      // hierarchical prefix-sum bucketing: no task ever sorts more
      // than one coarse bin of one stratum, so a giant stratum cannot
      // cliff a single sort task
      graft.text.Curation.perplexityBuckets(
        docs.withColumn("src", pmod(col("doc_id"), lit(8))),
        "text", "doc_id", Seq("src")).count()
    }
    t("bpe train 16 merges (vocab-scale)") {
      // rounds run on the DISTINCT-WORD frame: corpus size only
      // affects the initial histogram pass
      graft.text.Bpe.train(docs, "text", numMerges = 16).length.toLong
    }
    spark.stop()
  }

  /** Ingest-store micro-batch membership A/B at corpus scale
    * (stations × 1000 docs × 8 paragraphs): the OLD direct
    * `dedupParagraphsAgainst` hash join — which re-shuffles the
    * stored index every micro-batch — against the wired
    * sharded-Bloom + pruned-confirm path, before AND after
    * `compact()` sorts the base by hash. Shuffle bytes are the
    * cluster-honest column (the stored side crossing the network per
    * batch is exactly what kills a 100 TB ingest); input bytes show
    * the post-compaction row-group pruning (vectored IO disabled for
    * the measurement — it bypasses the FileSystem statistics).
    *
    * Also exercised here: the COMPACTION CADENCE loop a long-running
    * ingest runs (`needsCompaction` polled after every batch,
    * `compact()` fired when it trips, membership proven unchanged),
    * the SENTENCE store's probe at the same corpus scale (10-100×
    * the unit count of paragraphs in production), and the URL store's
    * STRING-key pruned confirm — one row per granularity, same
    * contract: per-batch bytes stay batch-scale, never
    * index-proportional. */
  private def storeIngest(spark: SparkSession, stations: Int): Unit = {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration
      .setBoolean("parquet.hadoop.vectored.io.enabled", false)
    val shuffleB = new java.util.concurrent.atomic.AtomicLong(0L)
    val inputB = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          shuffleB.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          inputB.addAndGet(sc.stageInfo.taskMetrics.inputMetrics
            .bytesRead)
        }
      })
    def t2(label: String)(f: => Long): Unit = {
      org.apache.spark.graft.ListenerBusBarrier.drain(
        spark.sparkContext)
      val s0 = shuffleB.get(); val i0 = inputB.get()
      val t0 = System.nanoTime()
      val n = f
      val secs = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBusBarrier.drain(
        spark.sparkContext)
      println(f"$label%-44s $secs%6.1f s  $n%,d rows  " +
        f"${(shuffleB.get() - s0) / 1e6}%,.0f MB shuffled  " +
        f"${(inputB.get() - i0) / 1e6}%,.0f MB read")
    }
    val nDocs = stations * 1000L
    println(f"stores mode: $nDocs%,d corpus docs x 8 paragraphs")
    // finer range split for sorted bases: pruning granularity is the
    // row group, and the local 32-partition default would leave only
    // 32 of them for 4M rows
    def withShufflePartitions[A](n: Int)(f: => A): A = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      try f
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    def mkDocs(from: Long, n: Long, dupFrac: Int) =
      spark.range(from, from + n, 1, 32)
        .select(col("id").as("doc_id"), concat_ws("\n\n",
          transform(sequence(lit(0), lit(7)), p =>
            // every dupFrac-th doc's paragraphs repeat doc (id-1)'s —
            // planted known-membership load for the probe
            concat(lit("paragraph body "),
              (when(pmod(col("id"), lit(dupFrac)) === 0 &&
                col("id") > from, col("id") - 1)
                .otherwise(col("id")) * 8 + p).cast("string"),
              lit(" with enough characters to qualify"))))
          .as("text"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_store_ab").toString
    val store = new graft.streaming.ParagraphIndexStore(spark, tmp,
      bloomShardCount = 32, bloomItemsPerShard = 1L << 18)
    t2("initialize (corpus-wide dedup + index)") {
      store.initialize(mkDocs(0, nDocs, 7), "text")
      store.cleaned.count()
    }
    // every 500th batch doc repeats a CORPUS doc's paragraphs — a
    // probe set far smaller than the sorted base's file count, the
    // regime where row-group pruning shows (probes ≈ row groups reads
    // everything whatever the layout; a 100 TB index has 100k+ row
    // groups against batch-scale probes)
    val batch = spark.range(nDocs + 100, nDocs + 5100, 1, 8)
      .select(col("id").as("doc_id"), concat_ws("\n\n",
        transform(sequence(lit(0), lit(7)), p =>
          concat(lit("paragraph body "),
            (when(pmod(col("id"), lit(500)) === 0,
              pmod(col("id"), lit(nDocs)))
              .otherwise(col("id")) * 8 + p).cast("string"),
            lit(" with enough characters to qualify"))))
        .as("text"))
      .localCheckpoint(true) // batch materialized outside the windows
    // consume n_dropped, not count(): a bare count lets Catalyst
    // ELIMINATE the unique-key membership left join (it cannot change
    // cardinality) and the whole stored-side subtree with it — the
    // 0-byte "measurement" of nothing
    def drops(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("n_dropped"))).head().getLong(0)
    t2("batch OLD exact join (stored side shuffles)") {
      drops(graft.text.Curation.dedupParagraphsAgainst(batch,
        store.paragraphTable, "text", "doc_id"))
    }
    t2("batch SHARDED+pruned (pre-compaction layout)") {
      drops(graft.text.Curation.dedupParagraphsAgainstSharded(batch,
        store.paragraphTable, store.bloomSubFilters, 32, "text",
        "doc_id"))
    }
    t2("compact (snapshot + hash-sorted base)") {
      withShufflePartitions(512) { store.compact() }
      store.paragraphTable.count()
    }
    t2("batch SHARDED+pruned (sorted base)") {
      drops(graft.text.Curation.dedupParagraphsAgainstSharded(batch,
        store.paragraphTable, store.bloomSubFilters, 32, "text",
        "doc_id"))
    }

    // ---- compaction CADENCE: the maintenance loop a long-running
    // ingest runs (needsCompaction was caller-polled but nothing in
    // the repo actually polled it). Every batch folds one sub-filter
    // per shard into the store; at maxSubFilters=4 the threshold
    // trips mid-run and compact() folds them back to one — exactly
    // when a production foreachBatch driver should fire it (idle
    // window between batches). Membership proof: the planted-dup
    // probe batch drops the SAME rows before and after the
    // cadence-driven compaction (cadence doc ids are disjoint from
    // the probe batch's, so the expected count is unchanged).
    val dupDrops0 = drops(graft.text.Curation
      .dedupParagraphsAgainstSharded(batch, store.paragraphTable,
        store.bloomSubFilters, 32, "text", "doc_id"))
    var compactions = 0
    t2("cadence: 6 batches + compact-on-demand") {
      var i = 0
      while (i < 6) {
        store.processBatch(
          mkDocs(nDocs + 1000000L + i * 2000L, 2000L, 7),
          "text", batchId = i.toLong)
        if (store.needsCompaction(maxSubFilters = 4)) {
          store.compact()
          compactions += 1
        }
        i += 1
      }
      compactions.toLong
    }
    val dupDrops1 = drops(graft.text.Curation
      .dedupParagraphsAgainstSharded(batch, store.paragraphTable,
        store.bloomSubFilters, 32, "text", "doc_id"))
    require(compactions >= 1,
      s"cadence never tripped needsCompaction (maxSubFilters=4)")
    require(dupDrops1 == dupDrops0,
      s"membership changed across cadence compaction: " +
        s"$dupDrops0 -> $dupDrops1")
    println(s"cadence: $compactions compaction(s) fired mid-run; " +
      s"planted-dup drops unchanged ($dupDrops0)")

    // ---- sentence store: the same contract one granularity down —
    // probe bytes must stay batch-scale at sentence cardinality too
    // (a 100 TB ingest stores 10-100x more sentences than paragraphs)
    def mkSentDocs(from: Long, n: Long, dupFrac: Int) =
      spark.range(from, from + n, 1, 32)
        .select(col("id").as("doc_id"), concat_ws(" ",
          transform(sequence(lit(0), lit(7)), p =>
            concat(lit("Sentence body number "),
              (when(pmod(col("id"), lit(dupFrac)) === 0 &&
                col("id") > from, col("id") - 1)
                .otherwise(col("id")) * 8 + p).cast("string"),
              lit(" qualifies with enough characters here."))))
          .as("text"))
    val stmp = java.nio.file.Files
      .createTempDirectory("graft_sent_ab").toString
    val sstore = new graft.streaming.SentenceIndexStore(spark, stmp,
      bloomShardCount = 32, bloomItemsPerShard = 1L << 18)
    t2("sentences: initialize (dedup + index)") {
      sstore.initialize(mkSentDocs(0, nDocs, 7), "text")
      sstore.cleaned.count()
    }
    t2("sentences: compact (hash-sorted base)") {
      withShufflePartitions(512) { sstore.compact() }
      sstore.sentenceTable.count()
    }
    val sbatch = spark.range(nDocs + 100, nDocs + 5100, 1, 8)
      .select(col("id").as("doc_id"), concat_ws(" ",
        transform(sequence(lit(0), lit(7)), p =>
          concat(lit("Sentence body number "),
            (when(pmod(col("id"), lit(500)) === 0,
              pmod(col("id"), lit(nDocs)))
              .otherwise(col("id")) * 8 + p).cast("string"),
            lit(" qualifies with enough characters here."))))
        .as("text"))
      .localCheckpoint(true)
    t2("sentences: batch SHARDED+pruned probe") {
      val (cleanedB, _) =
        graft.text.Curation.dedupSentencesAgainstWithIndexSharded(
          sbatch, sstore.sentenceTable, sstore.bloomSubFilters, 32,
          "text", "doc_id")
      drops(cleanedB)
    }

    // ---- URL store: the STRING-key pruned confirm (no bloom front —
    // the batch's distinct canonicals ARE the probe set); row-group
    // pruning works off min/max STRING stats of the url-sorted base
    val utmp = java.nio.file.Files
      .createTempDirectory("graft_url_ab").toString
    val ustore = new graft.streaming.UrlIndexStore(spark, utmp)
    def mkUrls(from: Long, n: Long, parts: Int) =
      spark.range(from, from + n, 1, parts)
        .select(col("id").as("doc_id"),
          concat(lit("https://example.org/page/"),
            col("id").cast("string"),
            lit("?utm_source=smoke")).as("url"))
    t2("urls: initialize (canonical dedup + index)") {
      ustore.initialize(mkUrls(0, nDocs * 8, 32))
      ustore.urlTable.count()
    }
    t2("urls: compact (url-sorted base)") {
      withShufflePartitions(512) { ustore.compact() }
      ustore.urlTable.count()
    }
    // every 500th batch url is a known corpus url (id folded back
    // into the stored range) — the planted-membership load
    val ubatch = spark.range(nDocs * 8 + 100, nDocs * 8 + 5100, 1, 8)
      .select(col("id").as("doc_id"),
        concat(lit("https://example.org/page/"),
          when(pmod(col("id"), lit(500)) === 0,
            pmod(col("id"), lit(nDocs * 8)))
            .otherwise(col("id")).cast("string"),
          lit("?utm_source=smoke")).as("url"))
      .localCheckpoint(true)
    t2("urls: batch pruned string confirm") {
      val canon = graft.text.Urls.canonicalizeUrl(col("url"))
      val batchUrls = ubatch.select(canon.as("canonical_url"))
        .where(col("canonical_url").isNotNull).distinct()
      graft.text.Curation.confirmKnownStrings(
        ustore.urlTable.select(col("canonical_url")),
        "canonical_url", batchUrls).count()
    }

    // ---- vector store: the ANN index at ingest. The read column is
    // the point — topK's probed-cell filter partition-prunes the
    // partitionBy(centroid_id) layout, so a search reads ~nprobe/nlist
    // of the stored code bytes, and an ingested batch encodes without
    // reading anything stored.
    val vtmp = java.nio.file.Files
      .createTempDirectory("graft_vec_ab").toString
    val nVec = nDocs * 4
    val vstore = new graft.streaming.VectorIndexStore(spark, vtmp,
      nlist = 64, m = 8, ksub = 16)
    def mkVecs(from: Long, n: Long) = spark.range(from, from + n, 1, 32)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(64)), j =>
          sin((col("id") + 1) * j.cast("double") * 0.7).cast("float"))
          .as("embedding"))
    val vecs = mkVecs(0, nVec).localCheckpoint(true)
    // queries materialized as their OWN tiny frame: deriving them
    // from `vecs` would scan the whole corpus' checkpoint blocks
    // inside the measured windows and swamp the codes-read signal
    val qVecs = mkVecs(0, 8).localCheckpoint(true)
    t2(f"vectors: initialize (train + encode $nVec%,d)") {
      vstore.initialize(vecs)
      vstore.codeTable.count()
    }
    t2("vectors: ingest batch (encode only, store unread)") {
      vstore.processBatch(mkVecs(nVec, 5000), 0L)
      5000L
    }
    t2("vectors: topK 8 queries, nprobe 8/64 (pruned read)") {
      vstore.topK(qVecs, "vec_id", k = 10, nprobe = 8).count()
    }
    t2("vectors: topK 8 queries, nprobe 64/64 (full read)") {
      vstore.topK(qVecs, "vec_id", k = 10, nprobe = 64).count()
    }
    // the takedown path's honest cost shape: deletion IS a compaction
    // (snapshot → anti-join rewrite → fold), so its wall is one full
    // index rewrite regardless of how few ids die — batch takedowns
    // into compaction windows, don't fire one per request
    t2("vectors: deleteIds 1k (one compaction rewrite)") {
      vstore.deleteIds(mkVecs(0, 1000).select(col("vec_id")))
      vstore.codeTable.count()
    }

    // ---- edge store: the link graph at ingest. Per-batch work is
    // batch-scale (nothing stored is read — the base-exists guard is
    // the only stat call); the rank reads the whole accumulated table
    // (the semantics of a global rank); compaction aggregates a
    // re-crawl-heavy log toward distinct-pair size.
    val gtmp = java.nio.file.Files
      .createTempDirectory("graft_graph_ab").toString
    val gstore = new graft.streaming.GraphEdgeStore(spark, gtmp)
    val gNodes = nDocs
    val gEdges = nDocs * 8
    // re-crawl shape: each underlying edge is observed ~4 times (the
    // id folds onto a quarter-sized edge universe), so the weight-1
    // store accumulates weight 4 per pair and compaction has real
    // parallel rows to aggregate
    def mkEdges(from: Long, n: Long) =
      spark.range(from, from + n, 1, 32)
        .select(pmod(col("id"), lit(gEdges / 4)).as("e_"))
        .select(
          pmod(xxhash64(col("e_"), lit(3L)), lit(gNodes)).cast("string")
            .as("src"),
          pmod(pmod(xxhash64(col("e_"), lit(7L)), lit(gNodes)),
            lit(gNodes / 2)).cast("string").as("dst"))
    t2(f"graph: initialize (land $gEdges%,d edges)") {
      gstore.initialize(mkEdges(0, gEdges))
      gstore.edgeTable.count()
    }
    t2("graph: ingest batch (land only, store unread)") {
      gstore.processBatch(mkEdges(gEdges, 5000), 0L)
      5000L
    }
    t2("graph: pageRank 3 iters over accumulated") {
      gstore.pageRank(iterations = 3).count()
    }
    t2("graph: compact (fold + aggregate pairs)") {
      gstore.compact()
      gstore.edgeTable.count()
    }
    t2("graph: deleteNodes 100 (one compaction rewrite)") {
      gstore.deleteNodes(
        spark.range(0, 100).select(col("id").cast("string")
          .as("node")))
      gstore.edgeTable.count()
    }
  }

  /** IVF corpus assignment at production shapes: the
    * literal-expression form at the default nlist vs the broadcast
    * kernel at a realistic coarse-quantizer size (nlist 1024) — the
    * auto-switch's two regimes timed on one corpus. Bit-parity
    * between the forms is spec-pinned (SimilaritySpec, nlist 256);
    * this row pins the kernel's WALL cost where the literal form
    * cannot even compile (65k codegen terms). stations scales the
    * corpus: stations × 20k vectors of 64 dims. */
  private def ivfAssign(spark: SparkSession, stations: Int): Unit = {
    import spark.implicits._
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.1f s  " +
        f"$n%,d rows")
    }
    val dim = 64
    val n = stations.toLong * 20000L
    println(f"ivf mode: $n%,d vectors x $dim dims")
    val corpus = spark.range(0, n, 1, 64)
      .select(col("id").as("vec_id"),
        // (id+1): id 0 would make a zero VECTOR, whose zero norm the
        // literal form's -dot/|c| rejects under ANSI when it becomes
        // a centroid
        transform(sequence(lit(1), lit(dim)), j =>
          sin((col("id") + 1) * j.cast("double") * 0.7))
          .as("embedding"))
      .localCheckpoint(true) // materialize OUTSIDE the timed windows
    def cents(nlist: Int): Array[Array[Double]] = corpus
      .orderBy(col("vec_id")).limit(nlist)
      .select(col("embedding")).as[Seq[Double]].collect()
      .map(_.toArray)
    val c16 = cents(16)
    val c1024 = cents(1024)
    // sum(centroid_id) forces the argmin for every row (a bare count
    // would let column pruning skip the assignment entirely)
    t("warmup literal nlist=16") {
      graft.similarity.Similarity
        .ivfAssignLiteral(corpus, "embedding", "vec_id", c16)
        .agg(sum(col("centroid_id"))).head(); n
    }
    t("assign literal nlist=16") {
      graft.similarity.Similarity
        .ivfAssignLiteral(corpus, "embedding", "vec_id", c16)
        .agg(sum(col("centroid_id"))).head(); n
    }
    t("assign kernel  nlist=16") {
      graft.similarity.Similarity
        .ivfAssignKernel(corpus, "embedding", "vec_id", c16)
        .agg(sum(col("centroid_id"))).head(); n
    }
    t("assign kernel  nlist=1024") {
      graft.similarity.Similarity
        .ivfAssignKernel(corpus, "embedding", "vec_id", c1024)
        .agg(sum(col("centroid_id"))).head(); n
    }
    // the composed IVF-PQ pipeline at the same corpus and the same
    // production nlist: kernel L2 assignment of every vector, residual
    // PQ encode (m=8, ksub=16 — the stored artifact is 8 codes per
    // vector instead of 64 doubles), 8 queries probing nprobe=32 cells
    // via residual LUTs. One end-to-end wall: this is the build+search
    // cost of the index shape a 100 TB vector corpus actually stores.
    t("ivfpq e2e   nlist=1024") {
      val books = Array.tabulate(8) { j =>
        c16.map(_.slice(j * 8, (j + 1) * 8))
      }
      graft.similarity.Similarity
        .ivfPqTopKWithParams(corpus, corpus.where(col("vec_id") < 8),
          "embedding", "vec_id", "vec_id", k = 10, c1024, books,
          nprobe = 32)
        .agg(sum(col("corpus_id"))).head(); n
    }
  }

  /** The ANN recall LADDER — one row per index shape over ONE stored
    * corpus (stations × 20k vectors × 64 dims, parquet-backed like a
    * real index), 8 queries each: recall@10 vs the exact same-metric
    * ranking, search wall, bytes READ from storage. This is the
    * sizing table a user picking an index shape needs: what each
    * rung pays in recall for its I/O and wall savings. Cosine
    * engines (brute / LSH / IVF / SQ8) score against the exact
    * cosine top-10, L2 engines (PQ / IVF-PQ / refined) against the
    * exact squared-L2 top-10 — recall against a mismatched metric
    * would charge the compression for the metric difference.
    * Stored artifacts (the corpus table, SQ8 codes, the
    * partitionBy(centroid_id) IVF-PQ inverted file) are built
    * OUTSIDE the timed windows: the ladder measures SEARCH, the
    * `stores`/`ivf` modes own the build costs. */
  private def annLadder(spark: SparkSession, stations: Int): Unit = {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration
      .setBoolean("parquet.hadoop.vectored.io.enabled", false)
    val inputB = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit =
          inputB.addAndGet(sc.stageInfo.taskMetrics.inputMetrics
            .bytesRead)
      })
    val dim = 64
    val n = stations.toLong * 20000L
    val k = 10
    println(f"ann mode: $n%,d vectors x $dim dims, recall@$k over " +
      "8 queries, engines read their STORED artifacts")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_ann_ladder").toString
    // (id+1): id 0 would make a zero vector (zero-norm cosine guard)
    spark.range(0, n, 1, 64)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)), j =>
          sin((col("id") + 1) * j.cast("double") * 0.7).cast("float"))
          .as("embedding"))
      .write.mode("overwrite").parquet(s"$tmp/corpus")
    val corpus = spark.read.parquet(s"$tmp/corpus")
    val queries = corpus.where(col("vec_id") < 8).collect()
      .sortBy(_.getLong(0)).toIndexedSeq
    val qDf = spark.createDataFrame(
      java.util.Arrays.asList(queries: _*), corpus.schema)
      .localCheckpoint(true)
    // models, driver-side (untimed — the production TRAINED path:
    // recall is only meaningful under codebooks fit to what they
    // quantize, residuals for ivfpq, raw slices for plain pq);
    // nlist 1024 is the kernel-assignment regime
    // ksub=256 = 8-BIT codes, the FAISS-standard PQ shape (ksub=16
    // halves the code bytes but collapses recall on tight corpora);
    // sample sized for 256-way subspace k-means. The coarse fit is
    // the DISTRIBUTED trainer — nlist=1024 over 2M vectors is the
    // large-nlist regime it exists for (the driver form would
    // single-thread a 1024×16k k-means)
    val (cents, books16) =
      graft.similarity.Similarity.ivfPqTrainDistributed(
        corpus, "embedding", "vec_id", nlist = 1024, m = 8,
        ksub = 256, sampleSize = 16384, lloydIters = 3)
    val booksPq = graft.similarity.Similarity.pqCodebooks(
      corpus, "embedding", "vec_id", m = 8, ksub = 256,
      sampleSize = 16384)
    // stored artifacts (untimed builds)
    graft.similarity.Similarity.sq8CodeTable(corpus, "embedding",
        "vec_id")
      .withColumn("codes", col("codes").cast("array<tinyint>"))
      .write.mode("overwrite").parquet(s"$tmp/sq8")
    val sq8Stored = spark.read.parquet(s"$tmp/sq8")
      .withColumn("codes", col("codes").cast("array<int>"))
    graft.similarity.Similarity.ivfPqCodeTable(corpus, "embedding",
        "vec_id", cents, books16)
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$tmp/ivfpq")
    val ivfpqStored = spark.read.parquet(s"$tmp/ivfpq")
    // sign-bit binary quantization: 2 longs per 64-dim vector, the
    // 32x-compressed cheapest rung
    graft.similarity.Similarity.bqCodeTable(corpus, "embedding",
        "vec_id")
      .write.mode("overwrite").parquet(s"$tmp/bq")
    val bqStored = spark.read.parquet(s"$tmp/bq")
    // Matryoshka 16-dim prefixes: the 4x-smaller float shortlist tier
    graft.similarity.Similarity.prefixTable(corpus, "embedding",
        "vec_id", 16)
      .write.mode("overwrite").parquet(s"$tmp/mrl")
    val mrlStored = spark.read.parquet(s"$tmp/mrl")
    // plain PQ as the degenerate inverted file (nlist=1, zero
    // centroid → residual = the vector): the SAME stored-codes ADC
    // engine, so the pq rung reads stored codes like a real PQ index
    // instead of re-encoding the corpus per search — the recall/read
    // delta vs the ivfpq rung is then PURELY the inverted file
    val cents1 = Array(Array.fill(dim)(0.0))
    graft.similarity.Similarity.ivfPqCodeTable(corpus, "embedding",
        "vec_id", cents1, booksPq)
      .write.mode("overwrite").parquet(s"$tmp/pq")
    val pqStored = spark.read.parquet(s"$tmp/pq")
    // one ladder row: run the search, collect hits, print the row,
    // return the per-query hit sets for recall
    def row(label: String, truth: Map[Long, Set[Long]])
        (f: => org.apache.spark.sql.DataFrame)
        : Map[Long, Set[Long]] = {
      org.apache.spark.graft.ListenerBusBarrier.drain(
        spark.sparkContext)
      val i0 = inputB.get()
      val t0 = System.nanoTime()
      val hits = f.select(col("query_id").cast("long"),
          col("corpus_id").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, v) => q -> v.map(_._2).toSet }
      val secs = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBusBarrier.drain(
        spark.sparkContext)
      val recall =
        if (truth.isEmpty) 1.0
        else truth.map { case (q, ids) =>
          ids.count(hits.getOrElse(q, Set.empty)).toDouble / ids.size
        }.sum / truth.size
      println(f"$label%-14s recall@$k=$recall%5.3f  " +
        f"wall=$secs%6.1f s  read=${(inputB.get() - i0) / 1e6}%,.0f MB")
      hits
    }
    val S = graft.similarity.Similarity
    // exact same-metric ground truths — the ladder's two rung-1 rows
    val cosTruth = row("brute-cos", Map.empty) {
      S.bruteForceTopK(corpus, qDf, "embedding", "vec_id", "vec_id", k)
    }
    val l2Truth = row("brute-l2", Map.empty) {
      // exact squared-L2 brute force, composed inline (the library's
      // brute entry is cosine): one corpus scan, broadcast queries
      val q = broadcast(qDf.select(col("vec_id").as("query_id"),
        col("embedding").as("qv")))
      val scored = corpus
        .select(col("vec_id").as("corpus_id"), col("embedding").as("cv"))
        .crossJoin(q)
        .withColumn("d", aggregate(
          zip_with(col("cv"), col("qv"), (a, b) =>
            (a.cast("double") - b.cast("double")) *
              (a.cast("double") - b.cast("double"))),
          lit(0.0), (acc, v) => acc + v))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("d"), col("corpus_id"))
      scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select(col("query_id"), col("corpus_id"))
    }
    row("lsh", cosTruth) {
      S.lshTopK(corpus, qDf, "embedding", "vec_id", "vec_id", k,
        planes = 12, dim = dim)
    }
    row("ivf", cosTruth) {
      S.ivfTopKWithCentroids(corpus, qDf, "embedding", "vec_id",
        "vec_id", k, cents, nprobe = 32)
    }
    row("sq8", cosTruth) {
      S.sq8TopKFromCodes(sq8Stored, qDf, "embedding", "vec_id",
        "vec_id", k)
    }
    row("bq", cosTruth) {
      S.bqTopKFromBits(bqStored, qDf, "embedding", "vec_id",
        "vec_id", k)
    }
    row("bq-rescored", cosTruth) {
      // the production BQ shape: Hamming over-fetch 8x, exact cosine
      // rescore of just those candidates (pruned id fetch)
      S.bqTopKRescored(bqStored, corpus, qDf, "embedding", "vec_id",
        "vec_id", k, refineFactor = 8)
    }
    row("mrl-rescored", cosTruth) {
      // Matryoshka adaptive retrieval: 16-dim prefix shortlist read
      // from the stored artifact, exact full-dim rescore of the 8x
      // over-fetch
      S.prefixTopKRescored(mrlStored, corpus, qDf, "embedding",
        "vec_id", "vec_id", k, prefixDim = 16, refineFactor = 8)
    }
    row("pq", l2Truth) {
      S.ivfPqTopKFromCodes(pqStored, qDf, "embedding", "vec_id",
        k, cents1, booksPq, nprobe = 1)
    }
    row("ivfpq", l2Truth) {
      S.ivfPqTopKFromCodes(ivfpqStored, qDf, "embedding", "vec_id",
        k, cents, books16, nprobe = 32)
    }
    row("ivfpq-refined", l2Truth) {
      S.ivfPqTopKRefined(ivfpqStored, corpus, qDf, "embedding",
        "vec_id", "vec_id", k, cents, books16, nprobe = 32,
        refineFactor = 4)
    }
  }

  /** Link-graph PageRank at corpus scale: a deterministic power-law-ish
    * graph (stations × 10k nodes, 8 edges per node, cubed-uniform dst
    * so in-degree concentrates on low ids — the hub skew a real host
    * graph has), ranked with the exact-integer recurrence. Measures
    * the whole run (setup + all iterations) and the marginal cost of
    * 5 more iterations — per-iteration wall AND shuffle bytes are the
    * numbers that scale to a 100 TB crawl's host graph (the edge
    * table shuffles on src once per iteration, contributions shuffle
    * on dst; both hash-partitioned, no driver state beyond n). */
  private def graphRank(spark: SparkSession, stations: Int): Unit = {
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit =
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    val nNodes = stations.toLong * 10000L
    val nEdges = nNodes * 8L
    println(f"graph mode: $nNodes%,d nodes, $nEdges%,d edges")
    // deterministic hub-skewed graph: src uniform, dst = n*u^3 for a
    // hash-uniform u (cubing piles in-degree onto low ids)
    val u = pmod(xxhash64(col("id"), lit(7L)), lit(1000003L))
      .cast("double") / 1000003.0
    val edges = spark.range(0, nEdges, 1, 64)
      .select(pmod(xxhash64(col("id"), lit(3L)), lit(nNodes)).as("src"),
        floor(lit(nNodes.toDouble) * u * u * u).cast("long").as("dst"))
      .localCheckpoint(true)
    def run(label: String, iters: Int): Unit = {
      org.apache.spark.graft.ListenerBusBarrier.drain(
        spark.sparkContext)
      val s0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val top = graft.core.Graphs.pageRankMicros(edges, "src", "dst",
          iterations = iters)
        .orderBy(col("rank_micros").desc, col("node")).limit(5)
        .collect().map(r => s"${r.get(0)}:${r.getLong(1)}")
      val secs = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBusBarrier.drain(
        spark.sparkContext)
      val mb = (shuffleBytes.get() - s0) / 1e6
      println(f"$label%-28s $secs%7.1f s  $mb%,.0f MB shuffled  " +
        s"top5=${top.mkString(",")}")
    }
    run("pagerank: 5 iterations", 5)
    run("pagerank: 10 iterations", 10)
    // weighted form at the same scale: hash-derived 1..16 weights —
    // same two exchanges per round plus the one-off weight sum
    org.apache.spark.graft.ListenerBusBarrier.drain(spark.sparkContext)
    val s0 = shuffleBytes.get()
    val t0 = System.nanoTime()
    val wtop = graft.core.Graphs.weightedPageRankMicros(
        edges.withColumn("w",
          pmod(xxhash64(col("src"), col("dst")), lit(16L)) + 1L),
        "src", "dst", "w", iterations = 5)
      .orderBy(col("rank_micros").desc, col("node")).limit(5)
      .collect().map(r => s"${r.get(0)}:${r.getLong(1)}")
    val secs = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graft.ListenerBusBarrier.drain(spark.sparkContext)
    println(f"${"pagerank-weighted: 5 iters"}%-28s $secs%7.1f s  " +
      f"${(shuffleBytes.get() - s0) / 1e6}%,.0f MB shuffled  " +
      s"top5=${wtop.mkString(",")}")
  }

  /** The web-ingest curation chain at corpus scale (stations × 1000
    * docs): synthesized HTML pages → main-content extraction → URL
    * canonicalize + dedup → paragraph dedup → unigram seed/encode.
    * Every stage is the operator under its gate, measured end to end;
    * planted duplicate cohorts make the drop counts verifiable. */
  private def curationChain(spark: SparkSession, stations: Int): Unit = {
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%7.1f s  " +
        f"$n%,d rows")
    }
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit =
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def tShuffle(label: String)(f: => Long): Unit = {
      // deterministic drain, not sleeps — see the dedup-store twin
      org.apache.spark.graft.ListenerBusBarrier.drain(
        spark.sparkContext)
      val s0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val n = f
      val secs = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBusBarrier.drain(
        spark.sparkContext)
      val mb = (shuffleBytes.get() - s0) / 1e6
      println(f"$label%-34s $secs%7.1f s  $n%,d rows  " +
        f"$mb%,.0f MB shuffled")
    }
    val nDocs = stations * 1000L
    println(f"curation mode: $nDocs%,d synthesized pages")
    val words = array((0 until 512).map(i => lit(s"w$i")): _*)
    // every 7th page is a URL variant of its predecessor (same
    // canonical); every doc carries a shared viral paragraph on a
    // third of pages; nav/footer boilerplate everywhere
    val pages = spark.range(0, nDocs, 1, 64)
      .select(col("id").as("doc_id"),
        // doc_id > 0 guard: doc 0 has no predecessor to be a variant
        // of (CorpusDemo's ingest applies the same rule)
        when(pmod(col("id"), lit(7)) === 0 && col("id") > 0,
          col("id") - 1).otherwise(col("id")).as("urlseed"),
        concat_ws(" ",
          transform(sequence(lit(1), lit(40)), i =>
            element_at(words,
              (pmod(xxhash64(col("id"), i), lit(512)) + 1)
                .cast("int")))).as("body"))
      .select(col("doc_id"),
        concat(lit("http://"),
          when(pmod(col("urlseed"), lit(2)) === 0, lit("www."))
            .otherwise(lit("")),
          lit("site"), pmod(col("urlseed"), lit(997)).cast("string"),
          lit(".example.com/page/"),
          (col("urlseed") / lit(7)).cast("long").cast("string"),
          when(pmod(col("doc_id"), lit(7)) === 0,
            lit("?utm_source=feed")).otherwise(lit(""))).as("url"),
        concat(
          lit("<html><head><script>var x=1;</script></head><body>" +
            "<div><a href=\"/\">Home</a> <a href=\"/a\">About the " +
            "site</a></div><p>"),
          col("body"), lit("</p>"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            lit("<p>the shared viral paragraph that repeats across " +
              "a third of all pages in the corpus</p>"))
            .otherwise(lit("")),
          lit("<div><a href=\"/p\">Privacy policy</a>" +
            "<a href=\"/t\">Terms of use</a></div></body></html>"))
          .as("html"))
      .localCheckpoint()
    var extracted: org.apache.spark.sql.DataFrame = null
    t("html main-content extraction") {
      extracted = graft.text.Html.mainContent(pages, "html", "doc_id")
        .join(pages.select(col("doc_id"), col("url")), "doc_id")
        .localCheckpoint()
      extracted.count()
    }
    var urlKept: org.apache.spark.sql.DataFrame = null
    t("url canonicalize + dedup") {
      urlKept = graft.text.Urls.dedupByCanonicalUrl(extracted, "url",
          "doc_id")
        .where(!col("is_url_dup")).localCheckpoint()
      urlKept.count()
    }
    var paraKept: org.apache.spark.sql.DataFrame = null
    tShuffle("paragraph dedup (corpus-wide)") {
      // narrow-flag / local-rebuild plan: the shuffle-bytes column is
      // the point — hashes and drop indexes move, corpus text doesn't
      paraKept = graft.text.Curation.dedupParagraphs(
          urlKept.select(col("doc_id"), col("text")), "text",
          "doc_id", "\n")
        .localCheckpoint()
      paraKept.count()
    }
    var sentKept: org.apache.spark.sql.DataFrame = null
    tShuffle("sentence dedup (corpus-wide)") {
      // the ladder rung below paragraphs: first-occurrence keeper per
      // sentence hash over the NARROW explode; drop-index arrays
      // broadcast-join back and the text rebuilds row-locally from
      // the ORIGINAL text (the q148 engine at corpus scale)
      sentKept = graft.text.Curation.dedupSentences(
          paraKept.select(col("doc_id"), col("text")), "text",
          "doc_id", minSentChars = 40)
        .localCheckpoint()
      sentKept.count()
    }
    t("trained langid over the corpus (NB apply)") {
      // model trains once on the seed (sample-scale); application is
      // the corpus-scale path — a shuffle-free literal-map argmax
      import spark.implicits._
      val model = graft.text.LanguageId.train(
        graft.text.LanguageId.builtinSeed.toDF("lang", "text"),
        "text", "lang", nMin = 2, nMax = 3, topK = 1024)
      graft.text.LanguageId.applyModel(paraKept, "text", model)
        .groupBy(col("language")).count().count()
    }
    t("kn-bigram fluency cut (tail drop)") {
      // the CorpusDemo 6b shape at corpus scale: KN-bigram bits per
      // pair -> hierarchical buckets -> drop the least-fluent third
      graft.text.Curation.perplexityBucketsKn(
          paraKept.withColumn("lang_", lit("all")), "text", "doc_id",
          Seq("lang_"))
        .where(col("bucket") =!= "tail").count()
    }
    t("unigram seed vocab (4096 pieces)") {
      val counts = paraKept
        .select(explode(graft.text.TextAnalysis.tokens(
          lower(col("text")))).as("word"))
        .where(col("word") =!= "")
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      graft.text.Unigram.seedVocab(counts, "word", "freq",
        seedSize = 4096, maxPieceLen = 4).count()
    }
    t("unigram viterbi encode (seed MLE)") {
      val counts = paraKept
        .select(explode(graft.text.TextAnalysis.tokens(
          lower(col("text")))).as("word"))
        .where(col("word") =!= "")
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      val model = graft.text.Unigram.mleScores(
        graft.text.Unigram.seedVocab(counts, "word", "freq", 4096, 4))
      graft.text.Unigram.encode(paraKept, "text", "doc_id", model)
        .agg(sum(col("n_pieces"))).head.getLong(0)
    }
    t("unigram hard-EM round (distinct words)") {
      val counts = paraKept
        .select(explode(graft.text.TextAnalysis.tokens(
          lower(col("text")))).as("word"))
        .where(col("word") =!= "")
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
        .localCheckpoint()
      val model = graft.text.Unigram.mleScores(
        graft.text.Unigram.seedVocab(counts, "word", "freq", 4096, 4))
      graft.text.Unigram.hardEmRound(counts, "word", "freq", model)
        .length.toLong
    }
    // verifiable drops: every 7th page was a URL variant; the viral
    // paragraph survives exactly once
    val urlDropped = nDocs - urlKept.count()
    require(urlDropped == (nDocs - 1) / 7,
      s"url dedup dropped $urlDropped, expected ${(nDocs - 1) / 7}")
    val viral = paraKept
      .where(col("text").contains("shared viral paragraph")).count()
    require(viral == 1L, s"viral paragraph kept $viral times")
    println(s"url variants dropped: $urlDropped; viral paragraph " +
      "kept exactly once")
  }

  /** The dedup chain with STORED artifacts: each ingest product (docs,
    * shingle hashes, signature table, cluster labels) is written to
    * parquet and the next stage reads the stored table — nothing
    * corpus-scale is pinned in executor or driver memory, so the chain
    * runs at 10M docs where the in-memory harness needs a 24g heap at
    * 1M. Same operators, same 100%-recall gate. */
  private def dedupStored(spark: SparkSession, stations: Int): Unit = {
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%7.1f s  " +
        f"$n%,d rows")
    }
    val store = sys.env.getOrElse("SPARK_GRAFT_STORE", "/tmp/graft_store")
    val words = array((0 until 512).map(i => lit(s"w$i")): _*)
    val nDocs = stations * 1000L
    println(f"dedup-store mode: $nDocs%,d docs, artifacts under $store")
    t("write docs table") {
      spark.range(0, nDocs, 1, 64)
        .select(col("id").as("doc_id"),
          when(pmod(col("id"), lit(7)) === 0, col("id") - 1)
            .otherwise(col("id")).as("seed"))
        .select(col("doc_id"), concat_ws(" ",
          transform(sequence(lit(1), lit(60)), i =>
            element_at(words,
              (pmod(xxhash64(col("seed"), i), lit(512)) + 1).cast("int"))))
            .as("text"))
        .write.mode("overwrite").parquet(s"$store/docs")
      spark.read.parquet(s"$store/docs").count()
    }
    val docs = spark.read.parquet(s"$store/docs")
    t("write shingle hashes (ingest)") {
      graft.text.Dedup.shingleHashes(docs, "text", "doc_id")
        .write.mode("overwrite").parquet(s"$store/hashes")
      spark.read.parquet(s"$store/hashes").count()
    }
    val hashed = spark.read.parquet(s"$store/hashes")
    t("write signature table (ingest)") {
      graft.text.Dedup.signatureTable(hashed, "doc_id", numHashes = 32,
          checkpoint = false) // one consumer: the parquet write
        .write.mode("overwrite").parquet(s"$store/sigs")
      spark.read.parquet(s"$store/sigs").count()
    }
    val sigs = spark.read.parquet(s"$store/sigs")
    t("near-dup pairs from stored sigs") {
      graft.text.Dedup.nearDupPairsFromSigTable(sigs, "doc_id",
        minJaccard = 0.5, numHashes = 32).count()
    }
    t("planted-clone recall (must be 100%)") {
      val found = graft.text.Dedup.nearDupPairsFromSigTable(sigs,
        "doc_id", minJaccard = 0.5, numHashes = 32)
      val expected = docs
        .where(pmod(col("doc_id"), lit(7)) === 0 && col("doc_id") > 0)
        .select((col("doc_id") - 1).as("id_a"), col("doc_id").as("id_b"))
      val missed = expected
        .join(found, Seq("id_a", "id_b"), "left_anti").count()
      require(missed == 0,
        s"recall < 100%: $missed planted clone pairs missed")
      expected.count()
    }
    t("write cluster labels (ingest)") {
      graft.text.Clusters.assign(docs, "doc_id",
          graft.text.Dedup.nearDupPairsFromSigTable(sigs, "doc_id",
            minJaccard = 0.5, numHashes = 32))
        .write.mode("overwrite").parquet(s"$store/labels")
      spark.read.parquet(s"$store/labels").count()
    }
    val labels = spark.read.parquet(s"$store/labels")
    t("split from stored labels") {
      graft.text.Clusters.splitFromClusters(labels,
        valFrac = 0.1, testFrac = 0.1)
        .groupBy(col("split")).count().count()
    }
    t("keep-best from stored labels") {
      // the q119 keeper window directly over the STORED labels (no
      // closure recompute): one cluster-keyed window, family-bounded
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster_id"))
        .orderBy(length(col("text")).desc, col("doc_id"))
      labels.join(docs, "doc_id")
        .withColumn("keeper_rank", row_number().over(w))
        .where(col("keeper_rank") === 1).count()
    }
  }
}
