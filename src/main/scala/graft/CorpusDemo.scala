package graft

import graft.core.Tables
import graft.similarity.Similarity
import graft.text.{Clusters, Curation, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end CORPUS curation pipeline — the training-data shape in
  * miniature: `runMain graft.CorpusDemo [sfDir]`.
  *
  * The canonical pass a 100 TB pretraining corpus makes between
  * landing and tokenization, each stage one Spark job over the
  * corpus, never a driver loop:
  *
  *  0. web ingest: pages (a real crawl starts at `io.Warc`) →
  *     HTML main-content extraction (link-density blocks) →
  *     canonical-URL dedup → paragraph dedup — whole documents and
  *     repeated spans drop before any scoring touches them;
  *  1. score: language ID, quality, repetition signals — pure
  *     expressions, a single map pass;
  *  2. heuristic filter: Gopher/C4 document bounds (word counts,
  *     symbol/bullet/ellipsis signals, lorem/brace kill flags);
  *  3. deboiler: drop lines repeated across many documents
  *     (headers/footers/banners — RefinedWeb line removal);
  *  4. redact: PII scrubbing (emails/IPs/phones) — a pure map;
  *  5. filter: per-language quality percentile (sketch + broadcast
  *     thresholds) and a repetition cap;
  *  6. dedup, then perplexity-cut (the CCNet order — dedup first so
  *     duplicates can't double-count in the corpus LM): MinHash-LSH
  *     near-dup pairs → connected components → keep the BEST copy
  *     per duplicate family (quality order, not min-id), then drop
  *     the least-fluent third per language under the corpus' own
  *     unigram LM;
  *  7. decontaminate: drop documents overlapping the (broadcast)
  *     benchmark 13-gram set;
  *  8. semantic prune: SemDedup over the embeddings of surviving
  *     docs (auto-sized hyperplane clusters), then a per-source
  *     document cap (C4/Dolma) and DSIR importance resampling toward
  *     a target-domain sketch (hashed-ngram log-ratios +
  *     Gumbel-top-k);
  *  9. rebalance + sample: largest exact source mixture, applied as a
  *     deterministic stratified sample;
  * 10. chunk: overlapping token windows — the training examples;
  * 11. split: cluster-coherent train/val/test (no val/test chunk has
  *     a train near-duplicate, by construction);
  * 12. shard: deterministic epoch order (md5 shard + position) for
  *     the train chunks — the write layout IS the shuffle.
  */
object CorpusDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-corpus-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[corpus] $label%-42s ${(System.nanoTime() - t0) / 1e9}%6.1f s")
      r
    }

    val raw = Tables.table(spark, sfDir, "documents")

    // 0. web ingest: a real corpus lands as crawled pages (io.Warc
    //    on a production crawl). Wrap each doc in a synthetic page —
    //    nav/footer link farms, a URL with tracking params, every
    //    11th page a URL VARIANT of its predecessor — then run the
    //    ingest front: main-content extraction (link-density blocks)
    //    -> canonical-URL dedup -> paragraph dedup. Metadata columns
    //    rejoin the cleaned text.
    val docs = t("ingest: html extract -> url dedup -> para dedup") {
      val urlseed = when(pmod(col("doc_id"), lit(11)) === 0 &&
        col("doc_id") > 0, col("doc_id") - 1).otherwise(col("doc_id"))
      val crawled = raw.select(col("doc_id"),
        concat(lit("HTTP://"),
          when(pmod(urlseed, lit(2)) === 0, lit("www."))
            .otherwise(lit("")),
          lit("site"), pmod(urlseed, lit(97)).cast("string"),
          lit(".example.com/d/"), urlseed.cast("string"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            lit("?utm_source=crawl")).otherwise(lit("")))
          .as("url"),
        concat(lit("<html><head><script>nav();</script></head>" +
          "<body><div><a href=\"/\">Home</a> <a href=\"/a\">All " +
          "topics</a></div><p>"), col("text"),
          lit("</p><div><a href=\"/p\">Privacy terms</a>" +
            "<a href=\"/c\">Cookie settings</a></div></body></html>"))
          .as("html"))
      val extracted = graft.text.Html
        .mainContent(crawled, "html", "doc_id")
        .join(crawled.select(col("doc_id"), col("url")), "doc_id")
      val urlKept = graft.text.Urls
        .dedupByCanonicalUrl(extracted, "url", "doc_id")
        .where(!col("is_url_dup"))
      // hot-key monitor at the ingest edge: a Misra-Gries pass over
      // the canonical domains — ONE scan, k counters per task, no
      // shuffle — surfaces crawler traps / skewed hosts BEFORE they
      // skew the dedup joins (the skew-detection use HeavyHitters
      // documents). Guaranteed to contain every domain above
      // N/(k+1) of the crawl.
      val hot = graft.core.HeavyHitters.heavyHitters(
        urlKept.select(col("url_domain")), "url_domain", k = 8)
      println(s"[corpus] hot domains (MG lower bounds): " +
        hot.take(3).map(h => s"${h.item}>=${h.countMin}")
          .mkString(", "))
      val paraKept = Curation.dedupParagraphs(
        urlKept.select(col("doc_id"), col("text")), "text", "doc_id",
        "\n")
      raw.drop("text")
        .join(paraKept.select(col("doc_id"), col("text")), "doc_id")
        .localCheckpoint(false)
    }
    val total = docs.count()
    println(f"[corpus] ingest kept $total%,d of ${raw.count()}%,d " +
      "crawled pages (url variants dropped)")

    // 1. score every document in one map pass. Language ID runs the
    //    TRAINED char-n-gram Naive-Bayes (the production path, q138)
    //    — the model trains once on the labeled seed and rides the
    //    scan as a literal map, shuffle-free; the stopword heuristic
    //    only backstops rows the model can't score.
    val langModel = t("langid: train char-ngram NB on seed") {
      import spark.implicits._
      graft.text.LanguageId.train(
        graft.text.LanguageId.builtinSeed.toDF("lang", "text"),
        "text", "lang", nMin = 2, nMax = 3, topK = 1024)
    }
    val scored = t("score: lang/quality/repetition") {
      // the q150 margin gate, live in the chain: a prediction whose
      // total NB log-prob lead over the runner-up is under 1.0
      // (1e6 micros — the q150 threshold) routes to 'und' and falls
      // back to the stopword heuristic; margin_micro rides along so
      // downstream stages can re-filter at their own confidence bar
      graft.text.LanguageId.applyWithFallback(docs, "text", langModel,
          minMarginMicros = 1000000L)
        .withColumnRenamed("language", "lang_pred")
        .drop("score_micro", "scores_micro")
        .withColumn("tok_", TextAnalysis.tokens(lower(col("text"))))
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .withColumn("top_word_frac",
          TextAnalysis.topCount(col("tok_")).cast("double") /
            size(col("tok_")))
        .drop("tok_")
        .localCheckpoint(false)
    }
    // how often the margin gate fired: every row whose margin sits
    // under the threshold went to the stopword fallback — including
    // exact ties at margin 0, which are routed too (the > 0 cut would
    // undercount them; gramless docs also land here, but every demo
    // page has text)
    val routed = scored.where(col("margin_micro") < 1000000L).count()
    println(f"[corpus] margin gate routed $routed%,d low-confidence " +
      "predictions to the stopword fallback")

    // 2. heuristic document filter (relaxed word-count floor: the
    //    synthetic docs are short)
    val heuristic = t("heuristic: Gopher/C4 document bounds") {
      Curation.heuristicFilter(scored, "text",
        Curation.HeuristicBounds(minWords = 20))
    }

    // 3. line-level boilerplate removal — SKETCH-FIRST: the
    //    Misra-Gries pass (zero shuffles: one scan + a broadcast
    //    HashSet rebuild) removes every line whose sketch LOWER bound
    //    already proves df >= 10; the safe under-drop means a rare
    //    line can never die by mistake. At 100 TB this replaces
    //    dedupLines' explode+distinct+groupBy+join with two linear
    //    scans; the exact pass remains the verification twin (q94).
    val deboiled = t("deboiler: MG-sketch cross-doc repeated lines") {
      val cleaned = Curation.dedupLinesApprox(heuristic, "text",
        "doc_id", maxDocs = 10).select(col("doc_id"), col("text"))
      heuristic.drop("text").join(cleaned, Seq("doc_id"))
    }

    // 3b. SENTENCE dedup — the ladder rung between lines and
    //     paragraphs (paragraph dedup already ran at ingest): one
    //     canonical copy of every repeated sentence survives
    //     (syndicated disclaimers/lead sentences die here; paragraph
    //     granularity misses them when surrounding text differs).
    //     Runs AFTER the line-structured stages deliberately: the
    //     rebuild joins kept sentences with single spaces, so line
    //     structure is gone downstream — the heuristic filter's
    //     bullet/line signals and the deboiler's line split both
    //     need the newlines and therefore run first.
    val sentKept = t("sentence dedup: first-occurrence keeper") {
      val cleaned = Curation.dedupSentences(deboiled, "text",
        "doc_id", minSentChars = 40).select(col("doc_id"), col("text"))
      deboiled.drop("text").join(cleaned, Seq("doc_id"))
    }

    // 4. PII redaction — pure map, no row survives with raw PII
    val redacted = t("redact: emails/IPs/phones") {
      sentKept.withColumn("text", Curation.redactPii(col("text")))
    }

    // 5. quality filter: keep the top 80% per language, cap repetition.
    // The barrier matters: the dedup stage consumes this frame from
    // several branches (shingle scan, label join-back, keeper join)
    // and would otherwise re-run the whole score->deboiler->filter
    // chain per consumer.
    val filtered = t("filter: per-lang quality + repetition cap") {
      Curation.qualityFilter(redacted, "text", keepFraction = 0.8)
        .where(col("top_word_frac") <= 0.5)
        .localCheckpoint(false)
    }

    // 6. near-dup dedup BEFORE the LM cut (the CCNet order — dedup
    // first so duplicated text cannot double-count in the corpus LM):
    // pairs -> components -> keep the BEST copy per family (quality
    // desc, id tiebreak) — the production keeper choice, not min-id.
    // localCheckpoint: downstream stages and the final counts would
    // otherwise re-run the LSH join chain once per action.
    val deduped = t("dedup: LSH pairs -> clusters -> keep best copy") {
      val pairs = graft.text.Dedup.nearDupPairs(filtered, "text",
        "doc_id", minJaccard = 0.5, numHashes = 32)
      Clusters.assignKeepBest(filtered, "doc_id", pairs,
          order = Seq(col("quality").desc))
        .where(col("is_keeper") === 1)
        .drop("cluster_id", "cluster_size", "keeper_rank", "is_keeper")
        .localCheckpoint()
    }

    // 6b. CCNet perplexity split per language over the DEDUPED corpus
    //     (duplicates would otherwise inflate their own n-gram
    //     probabilities): the least-fluent third per language — the
    //     tail bucket — drops, scored by the KNESER-NEY BIGRAM LM
    //     (CCNet's actual filter is a smoothed n-gram model, not
    //     unigram frequency). Documents too short to form a bigram
    //     carry no fluency evidence and are kept. Hierarchical
    //     prefix-sum bucketing, no per-language sort task.
    val fluent = t("ppl: drop the KN-bigram tail bucket per language") {
      val buckets = Curation.perplexityBucketsKn(deduped, "text",
        "doc_id", Seq("lang_pred"))
      val drop = buckets.where(col("bucket") === "tail")
        .select(col("doc_id"))
      deduped.join(drop, Seq("doc_id"), "left_anti")
        .localCheckpoint(false)
    }

    // 7. decontaminate vs a probe set (here: the 10 lowest doc_ids)
    val clean = t("decontaminate vs benchmark grams") {
      val probes = docs.where(col("doc_id") < 10)
      val flags = Curation.decontaminate(
        fluent.where(col("doc_id") >= 10), probes, "text", "doc_id")
      fluent.join(flags.where(col("contaminated") === 0)
        .select(col("doc_id")), Seq("doc_id"), "left_semi")
    }

    // 8. semantic prune on the survivors' embeddings
    val pruned = t("semantic prune: semdedup on embeddings") {
      val emb = Tables.table(spark, sfDir, "embeddings")
        .join(clean.select(col("doc_id").as("vec_id")), Seq("vec_id"),
          "left_semi")
      val drops = Similarity.semDedupAuto(emb, "embedding", "vec_id",
          minCosine = 0.4)
        .where(col("dropped") === 1)
        .select(col("vec_id").as("doc_id"))
      clean.join(drops, Seq("doc_id"), "left_anti").localCheckpoint()
    }

    // 8a'. int8-quantized ANN probe over the survivors' embeddings:
    //      the memory-scaling retrieval form — integer dots over
    //      SQ8 codes, scales cancel out of cosine
    t("ann probe: sq8 top-5 over surviving embeddings") {
      val emb = Tables.table(spark, sfDir, "embeddings")
        .join(pruned.select(col("doc_id").as("vec_id")), Seq("vec_id"),
          "left_semi").localCheckpoint(false)
      Similarity.sq8TopK(emb, emb.orderBy(col("vec_id")).limit(4),
        "embedding", "vec_id", "vec_id", k = 5).count()
    }

    // 8a'-bis. the 32x tier below SQ8: sign-bit binary quantization
    //          with the oversample-then-rescore search — Hamming
    //          candidates over packed codes, exact cosine on only the
    //          over-fetched candidates
    t("ann probe: bq rescored top-5 over survivors") {
      val emb = Tables.table(spark, sfDir, "embeddings")
        .join(pruned.select(col("doc_id").as("vec_id")), Seq("vec_id"),
          "left_semi").localCheckpoint(false)
      Similarity.bqTopKRescored(
        Similarity.bqCodeTable(emb, "embedding", "vec_id"), emb,
        emb.orderBy(col("vec_id")).limit(4),
        "embedding", "vec_id", "vec_id", k = 5, refineFactor = 4).count()
    }

    // 8a''. cluster-aware probe: exact-integer k-means over the
    //       survivors' embeddings — cluster ids are the stratum key a
    //       label-free corpus uses for balanced caps/mixtures (the
    //       per-source cap below plays that role here because the
    //       fixture HAS labels)
    t("cluster: integer k-means topics over survivors") {
      val emb = Tables.table(spark, sfDir, "embeddings")
        .join(pruned.select(col("doc_id").as("vec_id")), Seq("vec_id"),
          "left_semi").localCheckpoint(false)
      val model = graft.similarity.KMeans.fit(emb, "embedding",
        "vec_id", k = 8, iters = 3)
      graft.similarity.KMeans.assign(emb, "embedding", model)
        .groupBy(col("cluster_id")).count().count()
    }

    // 8a'''. PERSISTED vector index over the survivors — the storage
    //        half of the ANN family, composed in the order the store
    //        doc prescribes: the text dedup/curation gates ran FIRST,
    //        so the index never holds a document they rejected.
    //        initialize trains + FREEZES the quantizer and lands the
    //        inverted file partitionBy(centroid_id); the sample
    //        searches read nprobe cell DIRECTORIES of stored codes —
    //        never an embedding — and the refined search re-scores
    //        its over-fetched candidates against exact vectors (the
    //        FAISS refine step, the production recall knob).
    t("index: IVF-PQ vector store + sample searches") {
      val emb = Tables.table(spark, sfDir, "embeddings")
        .join(pruned.select(col("doc_id").as("vec_id")), Seq("vec_id"),
          "left_semi").localCheckpoint(false)
      val vdir = java.nio.file.Files
        .createTempDirectory("corpus_demo_vectors").toString
      val store = new graft.streaming.VectorIndexStore(spark, vdir,
        nlist = 8, m = 8, ksub = 16)
      store.initialize(emb)
      val q = emb.orderBy(col("vec_id")).limit(4).localCheckpoint(false)
      val hits = store.topK(q, "vec_id", k = 5, nprobe = 2).count()
      val refined = store.topKRefined(q, "vec_id", k = 5, emb,
        nprobe = 2, refineFactor = 4).count()
      println(f"[corpus] vector store: $hits%,d ADC hits, " +
        f"$refined%,d refined hits for 4 queries")
    }

    // 8b. BM25 relevance probe: rank the survivors against a domain
    //     sketch (here: the probe docs double as the sketch) — the
    //     retrieval signal a curation pass uses to up-weight on-domain
    //     documents; only the per-query top hits materialize
    t("retrieve: BM25 top-k vs domain sketch") {
      Curation.bm25TopK(pruned, docs.where(col("doc_id") < 3),
        "text", "doc_id", "doc_id", k = 5).count()
    }

    // 8b'. hybrid retrieval: RRF-fuse the lexical BM25 ranking with
    //      the semantic SQ8 ranking — rank-only fusion (no score
    //      calibration), agreement between lists outranks either
    //      list's head. The production RAG/curation retrieval stack
    //      in one line per leg.
    t("retrieve: RRF hybrid (BM25 + sq8 vectors)") {
      val lex = Curation.bm25TopK(pruned,
          docs.where(col("doc_id") < 3), "text", "doc_id", "doc_id",
          k = 20)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val emb = Tables.table(spark, sfDir, "embeddings")
        .join(pruned.select(col("doc_id").as("vec_id")), Seq("vec_id"),
          "left_semi").localCheckpoint(false)
      val sem = Similarity.sq8TopK(emb, emb.where(col("vec_id") < 3),
          "embedding", "vec_id", "vec_id", k = 20)
        .select(col("query_id"), col("corpus_id").as("doc_id"),
          col("rank"))
      Curation.rrfFuse(Seq(lex, sem), "query_id", "doc_id", k = 5)
        .count()
    }

    // 8c. per-domain cap: no single source may dominate the mixture
    //     the later stages balance (C4/Dolma step; longest-first cut)
    val capped = t("cap: per-source document limit") {
      Curation.capPerKey(pruned, Seq("source"), n = 40,
        order = Seq(col("n_chars").desc, col("doc_id")))
        .drop("domain_rank")
    }

    // 8d. DSIR data selection toward a target domain: importance
    //     weights from hashed-ngram target/raw log-ratios (src0 docs
    //     double as the target sketch), then Gumbel-top-k resampling
    //     — keeps the corpus-sized half of the selection distributed;
    //     only the ≤4096-bucket ratio table is small
    val selected = t("select: DSIR importance resample") {
      val target = capped.where(col("source") === "src0")
      val w = Curation.importanceWeights(capped, target, "text",
        "doc_id")
      Curation.weightedSample(
        capped.join(w, Seq("doc_id")), "weight_micro",
        Seq("doc_id"), n = (capped.count() * 4 / 5).toInt.max(1))
        .drop("n_feats", "weight_micro")
    }

    // 9. rebalance to a target source mixture, applied as a
    //    deterministic stratified sample (weights are domain-scale:
    //    collect is one row per source)
    val sampled = t("rebalance + sample: source mixture") {
      val srcs = selected.select(col("source")).distinct()
        .collect().map(_.getString(0)).sorted
      val target = srcs.map(_ -> 1.0 / srcs.length).toMap
      val weights = Curation.mixtureWeights(selected, "source", target)
        .select(col("source"), col("keep_fraction"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      Curation.stratifiedSample(selected, "source", weights,
        idCols = Seq("doc_id"))
    }

    // 9b. tokenizer prep on the FINAL mixture: BPE merges learned at
    //     distinct-word scale, then every document tokenized with the
    //     broadcast rank table — the fertility number (pieces/token)
    //     is the signal tokenizer teams tune against
    t("tokenize: 16 BPE merges + corpus piece count") {
      val merges = graft.text.Bpe.train(sampled, "text", numMerges = 16)
      graft.text.Bpe.encode(sampled, "text", "doc_id", merges)
        .agg(sum(col("n_pieces"))).head().getLong(0)
    }

    // 10. chunk the survivors into overlapping training windows
    val chunks = t("chunk: token windows for training") {
      Curation.chunkTokens(sampled, "text", Seq("doc_id"),
        maxTokens = 64, stride = 48)
    }

    // 11. leakage-free split: residual sub-threshold near-dup families
    //     (dedup kept one rep per >=0.5 family; 0.3-0.5 survives) land
    //     atomically in one split, so no val/test chunk has a train
    //     near-duplicate
    val split = t("split: cluster-coherent train/val/test") {
      val pairs = graft.text.Dedup.nearDupPairs(sampled, "text",
        "doc_id", minJaccard = 0.3, numHashes = 32)
      Clusters.coherentSplit(sampled, "doc_id", pairs,
        valFrac = 0.05, testFrac = 0.05).select(col("doc_id"),
        col("split")).localCheckpoint()
    }

    // 12. epoch order: deterministic shard + position for the train
    //     chunks — the write layout is the shuffle
    val sharded = t("shard: deterministic epoch order") {
      Curation.trainingOrder(
        chunks.join(split.where(col("split") === "train"), "doc_id"),
        Seq("doc_id", "chunk_idx"), numShards = 16)
    }

    // 12b. materialize the epoch as the loader-facing layout: one
    //      hive directory per shard, rows pos-sorted inside every
    //      file — a data loader streams shard=K in training order
    //      with no sort
    t("shard: write training-shard layout") {
      val sdir = java.nio.file.Files
        .createTempDirectory("corpus_demo_shards").toString
      graft.core.Tables.writeTrainingShards(sharded, s"$sdir/epoch0")
      spark.read.parquet(s"$sdir/epoch0").count()
    }

    val counts = Seq(
      "input" -> total, "heuristic-filtered" -> heuristic.count(),
      "quality-filtered" -> filtered.count(),
      "deduped" -> deduped.count(),
      "ppl-head+middle" -> fluent.count(),
      "decontaminated" -> clean.count(),
      "semantically-pruned" -> pruned.count(),
      "domain-capped" -> capped.count(),
      "dsir-selected" -> selected.count(),
      "sampled" -> sampled.count())
    counts.foreach { case (k, v) => println(f"[corpus] $k%-22s $v%,10d") }
    println(f"[corpus] ${"training-chunks"}%-22s ${chunks.count()}%,10d")
    val bySplit = split.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"[corpus] split sizes          $bySplit")
    val nShards = sharded.select(col("shard")).distinct().count()
    println(f"[corpus] ${"train-shards"}%-22s $nShards%,10d")
    require(counts.map(_._2).sliding(2).forall(p => p(1) <= p(0)),
      "each stage must only shrink the corpus")
    spark.stop()
  }
}
