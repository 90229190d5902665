package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus curation for training-data pipelines: quality-threshold
  * filtering and deterministic stratified sampling — the two standard
  * steps between dedup and tokenization at 100 TB.
  *
  * Scale shape: one aggregation pass to derive thresholds (map-side
  * combined percentile sketches), a broadcast join to apply them, and
  * hash-derived per-row uniforms for sampling — no sort of the corpus,
  * no driver-side data beyond the per-group threshold table. */
object Curation {

  /** Operators below inject working columns (`toks_`, `lines_`, …)
    * into the input frame; an input that already carries one of those
    * names would be silently clobbered. Same contract as
    * `TimeSeries.asofJoin`'s reserved-name guard. */
  private def requireFresh(df: DataFrame, names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has reserved working column(s): ${clash.mkString(", ")}")
  }

  /** Keep the top `keepFraction` of documents by `TextAnalysis
    * .qualityScore`, with the cutoff computed PER LANGUAGE (so one
    * dominant language doesn't set the bar for all) via
    * `percentile_approx` — a mergeable sketch, one shuffle of sketch
    * state, thresholds broadcast back. `accuracy` trades sketch memory
    * for cutoff precision (10000 ≈ ±0.01% rank error). */
  def qualityFilter(df: DataFrame, textCol: String,
      keepFraction: Double, byLanguage: Boolean = true,
      accuracy: Int = 10000): DataFrame = {
    require(keepFraction > 0 && keepFraction <= 1, "keepFraction in (0,1]")
    requireFresh(df, "lang_", "q_", "q_min_")
    val scored = df
      .withColumn("lang_", TextAnalysis.languageId(col(textCol)))
      .withColumn("q_", TextAnalysis.qualityScore(col(textCol)))
    val groups = if (byLanguage) Seq(col("lang_")) else Nil
    val thresholds = scored
      .groupBy(groups: _*)
      .agg(percentile_approx(col("q_"), lit(1.0 - keepFraction),
        lit(accuracy)).as("q_min_"))
    val joined = if (byLanguage)
      scored.join(broadcast(thresholds), Seq("lang_"))
    else scored.crossJoin(broadcast(thresholds))
    joined.where(col("q_") >= col("q_min_"))
      .drop("lang_", "q_", "q_min_")
  }

  /** Deterministic stratified sample: per-stratum keep fractions
    * applied with a hash-derived uniform per row — identical output
    * under any partitioning, retry, or AQE re-plan (unlike
    * `DataFrame.stat.sampleBy`'s rand()). Strata absent from
    * `fractions` are dropped. `idCols` must identify a row stably
    * (they seed the hash). */
  def stratifiedSample(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], idCols: Seq[String],
      seed: Long = 42L,
      draw: (Long, Seq[Column]) => Column = xxUniform): DataFrame = {
    require(idCols.nonEmpty, "idCols must identify rows")
    require(fractions.values.forall(f => f >= 0 && f <= 1),
      "fractions in [0,1]")
    requireFresh(df, "frac_")
    val frac = fractions.foldLeft(lit(null).cast("double")) {
      case (acc, (k, f)) => when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    val u = draw(seed, idCols.map(col))
    df.withColumn("frac_", frac)
      .where(col("frac_").isNotNull && u < col("frac_"))
      .drop("frac_")
  }

  /** [[stratifiedSample]]'s default per-row uniform: xxhash64 of
    * (seed, id columns) into (0, 1) — one 64-bit hash, Spark-only.
    * Pass [[graft.functions.Draws.md5Uniform]] as `draw` instead for
    * a cross-engine-replayable sample (the q99 oracle-twin pattern);
    * both are deterministic under any partitioning or retry. */
  def xxUniform(seed: Long, cols: Seq[Column]): Column =
    (pmod(xxhash64(lit(seed) +: cols: _*),
      lit(Long.MaxValue)).cast("double") + 0.5) /
      (Long.MaxValue.toDouble + 1.0)

  /** Bounds for [[heuristicStats]]' keep decision — the published
    * Gopher/C4 document-level defaults. */
  final case class HeuristicBounds(
      minWords: Long = 50, maxWords: Long = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineFrac: Double = 0.9,
      maxEllipsisLineFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8)

  /** Gopher/C4-style heuristic quality statistics per document, plus a
    * `keep` verdict against `bounds`: word count, mean word length,
    * symbol-to-word ratio (#, ellipses), bullet / ellipsis-terminated /
    * punctuation-terminated line fractions, alphabetic-word fraction,
    * and the C4 "lorem ipsum" / curly-brace kill flags.
    *
    * Scale shape: every stat is a per-row array expression over the
    * materialized token and line arrays — shuffle-free, codegen'd, a
    * pure map over any partitioning of a 100 TB corpus. */
  def heuristicStats(df: DataFrame, textCol: String,
      bounds: HeuristicBounds = HeuristicBounds()): DataFrame = {
    // guard the OUTPUT names too: `keep` lands via withColumn and the
    // stats land via select-append, either of which would silently
    // clobber / duplicate a same-named caller column
    requireFresh(df, "toks_", "lines_", "n_words", "mean_word_len",
      "symbol_word_ratio", "n_lines", "frac_lines_end_punct",
      "frac_bullet_lines", "frac_ellipsis_lines", "frac_alpha_words",
      "has_lorem", "has_brace", "keep")
    val t = col(textCol)
    val withArr = df
      .withColumn("toks_", TextAnalysis.tokens(t))
      .withColumn("lines_", split(t, "\n"))
    val toks = col("toks_")
    val lines = col("lines_")
    val nWords = size(toks).cast("long")
    val nWords1 = greatest(nWords, lit(1L))
    val meanWordLen = round(
      aggregate(toks, lit(0L), (acc, x) => acc + length(x))
        .cast("double") / nWords1, 6)
    def occurrences(lit_ : String) =
      (length(t) - length(replace(t, lit(lit_)))) / lit_.length
    val symbolRatio = round(
      (occurrences("#") + occurrences("...") + occurrences("…"))
        / nWords1, 6)
    val nLines = size(lines).cast("long")
    def lineFrac(p: Column => Column) = round(
      size(filter(lines, p)).cast("double") / nLines, 6)
    val endPunct = lineFrac(l =>
      substring(rtrim(l), -1, 1).isin(".", "!", "?", "\"", "'"))
    val bullet = lineFrac(l =>
      substring(ltrim(l), 1, 1).isin("-", "*", "•"))
    val ellipsis = lineFrac(l =>
      endswith(rtrim(l), lit("...")) || endswith(rtrim(l), lit("…")))
    val alphaFrac = round(
      size(filter(toks, x => x.rlike("[A-Za-z]"))).cast("double") / nWords1,
      6)
    val lorem = contains(lower(t), lit("lorem ipsum")).cast("long")
    val brace = contains(t, lit("{")).cast("long")
    val stats = withArr.select(df.columns.map(col) ++ Seq(
      nWords.as("n_words"),
      meanWordLen.as("mean_word_len"),
      symbolRatio.as("symbol_word_ratio"),
      nLines.as("n_lines"),
      endPunct.as("frac_lines_end_punct"),
      bullet.as("frac_bullet_lines"),
      ellipsis.as("frac_ellipsis_lines"),
      alphaFrac.as("frac_alpha_words"),
      lorem.as("has_lorem"),
      brace.as("has_brace")): _*)
    stats.withColumn("keep",
      (col("n_words").between(bounds.minWords, bounds.maxWords) &&
        col("mean_word_len").between(bounds.minMeanWordLen,
          bounds.maxMeanWordLen) &&
        col("symbol_word_ratio") <= bounds.maxSymbolWordRatio &&
        col("frac_bullet_lines") <= bounds.maxBulletLineFrac &&
        col("frac_ellipsis_lines") <= bounds.maxEllipsisLineFrac &&
        col("frac_alpha_words") >= bounds.minAlphaWordFrac &&
        col("has_lorem") === 0 && col("has_brace") === 0).cast("long"))
  }

  /** Apply [[heuristicStats]] and keep only surviving documents, with
    * the original schema. */
  def heuristicFilter(df: DataFrame, textCol: String,
      bounds: HeuristicBounds = HeuristicBounds()): DataFrame =
    heuristicStats(df, textCol, bounds)
      .where(col("keep") === 1)
      .select(df.columns.map(col): _*)

  /** Benchmark decontamination: flag corpus documents sharing any word
    * `k`-gram with a probe set (the eval benchmarks). Returns one row
    * per corpus document: (idCol, n_shared, contaminated) where
    * n_shared counts DISTINCT shared k-grams.
    *
    * Scale shape: the probe side is an eval suite — thousands of
    * documents, not terabytes — so its distinct k-gram set is
    * broadcast and the corpus is matched with a broadcast inner join
    * on the exploded grams (no shuffle of corpus text), followed by
    * one count-per-doc shuffle of only the matching (doc, gram) rows,
    * which decontamination keeps tiny by construction. */
  def decontaminate(corpus: DataFrame, probes: DataFrame,
      textCol: String, idCol: String, k: Int = 13): DataFrame = {
    requireFresh(corpus, "tok_", "gram_", "n_shared")
    requireFresh(probes, "tok_", "gram_")
    def grams(df: DataFrame, keep: Seq[String]) =
      distinctGrams(df, textCol, keep, k)
    val probeGrams = grams(probes, Nil).distinct()
    val shared = grams(corpus, Seq(idCol))
      .join(broadcast(probeGrams), Seq("gram_"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
    corpus.select(col(idCol))
      .join(shared, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).cast("long")
          .as("contaminated"))
  }

  /** One row per distinct word `k`-gram of each document (lowercased
    * whitespace tokens; texts shorter than `k` yield their one
    * truncated shingle, matching [[TextAnalysis.shinglesFromTokens]]).
    * Shared front half of [[decontaminate]] / [[contaminationReport]]. */
  private def distinctGrams(df: DataFrame, textCol: String,
      keep: Seq[String], k: Int): DataFrame = df
    .withColumn("tok_", TextAnalysis.tokens(lower(col(textCol))))
    .select(keep.map(col) :+
      explode(array_distinct(
        TextAnalysis.shinglesFromTokens(col("tok_"), k))).as("gram_"): _*)

  /** Graded contamination report — [[decontaminate]]'s boolean flag is
    * the DECISION; this is the evidence used to SET the threshold:
    * per corpus document, how many of its distinct word `k`-grams
    * appear anywhere in the probe/eval set, and what fraction of the
    * document that is. Returns (idCol, n_grams, n_shared,
    * contamination_micro) where contamination_micro =
    * round(n_shared·1e6/n_grams) — an exact integer, so the gate
    * hash-checks without float-order caveats. The standard workflow
    * (e.g. GPT-3 appendix C, PaLM contamination analysis) bins this
    * fraction to choose between dropping a document and merely
    * flagging it.
    *
    * Scale shape: identical to [[decontaminate]] — probe grams
    * broadcast, corpus matches die map-side, PLUS one extra
    * map-side-combined count of each document's distinct-gram total
    * (corpus-token scale, the same cost as the match scan). */
  def contaminationReport(corpus: DataFrame, probes: DataFrame,
      textCol: String, idCol: String, k: Int = 13): DataFrame = {
    requireFresh(corpus, "tok_", "gram_", "n_grams", "n_shared",
      "contamination_micro")
    requireFresh(probes, "tok_", "gram_")
    val corpusGrams = distinctGrams(corpus, textCol, Seq(idCol), k)
      // two consumers (total + matched counts): materialize the
      // tokenize+shingle work once instead of re-scanning the corpus
      .localCheckpoint(false)
    val totals = corpusGrams.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"))
    val probeGrams = distinctGrams(probes, textCol, Nil, k).distinct()
    val shared = corpusGrams
      .join(broadcast(probeGrams), Seq("gram_"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
    totals.join(shared, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        round(coalesce(col("n_shared"), lit(0L)) * lit(1e6) /
          col("n_grams")).cast("long").as("contamination_micro"))
  }

  /** PII patterns. Deliberately restricted to syntax with identical
    * semantics in Java regex and RE2 (no lookaround, no backrefs), so
    * detection matches across engines and redaction is reproducible. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Per-document PII match counts (emails, IPv4 addresses, phone-like
    * numbers). Pure row expressions — shuffle-free at any scale. */
  def piiStats(df: DataFrame, textCol: String): DataFrame = {
    def n(pat: String) =
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long")
    df.withColumn("n_emails", n(emailPattern))
      .withColumn("n_ipv4", n(ipv4Pattern))
      .withColumn("n_phones", n(phonePattern))
  }

  /** Redact PII in place: emails first (they may embed dotted-digit
    * hosts), then phone numbers, then IPv4 — the order is part of the
    * contract so output is reproducible across engines and retries. */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, emailPattern, "<EMAIL>")
    val p = regexp_replace(e, phonePattern, "<PHONE>")
    regexp_replace(p, ipv4Pattern, "<IP>")
  }

  /** Split each document into overlapping fixed-size token windows —
    * the standard step that turns a filtered corpus into training
    * examples. Window starts step by `stride` while they land inside
    * the document; the last window may be shorter than `maxTokens`.
    * Returns `idCols` + (chunk_idx, n_tokens, chunk_text).
    *
    * Scale shape: explode-only — each row fans out to
    * ceil(n_tokens/stride) chunk rows with no shuffle; downstream
    * writers see chunks co-partitioned with their documents. */
  def chunkTokens(df: DataFrame, textCol: String, idCols: Seq[String],
      maxTokens: Int = 128, stride: Int = 64): DataFrame = {
    require(maxTokens > 0 && stride > 0 && stride <= maxTokens,
      "need 0 < stride <= maxTokens")
    requireFresh(df, "toks_", "start_", "chunk_")
    // empty/whitespace-only (or null) documents produce NO chunks —
    // split of "" yields [""], which would otherwise leak a phantom
    // 1-token empty training example
    val withToks = df.withColumn("toks_", TextAnalysis.tokens(col(textCol)))
      .where(size(col("toks_")) > 1 ||
        element_at(col("toks_"), 1) =!= "")
    val starts = sequence(lit(0),
      greatest(size(col("toks_")) - 1, lit(0)), lit(stride))
    withToks
      .select(idCols.map(col) :+ col("toks_") :+
        explode(starts).as("start_"): _*)
      .select(idCols.map(col) ++ Seq(
        (col("start_") / stride).cast("long").as("chunk_idx"),
        slice(col("toks_"), col("start_") + 1, lit(maxTokens))
          .as("chunk_")): _*)
      .select(idCols.map(col) ++ Seq(
        col("chunk_idx"),
        size(col("chunk_")).cast("long").as("n_tokens"),
        concat_ws(" ", col("chunk_")).as("chunk_text")): _*)
  }

  /** SENTENCE-RESPECTING chunking — the boundary-aware variant of
    * [[chunkTokens]]: the document splits into sentences
    * ([[TextAnalysis.sentences]]) and consecutive sentences pack
    * greedily into windows of ≤ `maxTokens` whitespace tokens (a new
    * chunk starts when the next sentence would overflow a non-empty
    * one; a single oversized sentence gets its own chunk rather than
    * being torn). Training examples then never cut mid-sentence —
    * the chunking long-context pipelines actually want, vs
    * [[chunkTokens]]' blind strided windows. Returns (idCols…,
    * chunk_idx, n_tokens, chunk_text); sentence-less documents
    * produce no chunks.
    *
    * A pure row-local fold (`aggregate` over the sentence array — the
    * `packGreedy` recurrence without its shuffle, since chunks never
    * cross documents): shuffle-free over any partitioning. */
  def chunkBySentences(df: DataFrame, textCol: String,
      idCols: Seq[String], maxTokens: Int = 128): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    requireFresh(df, "sents_", "packed_", "chunk_")
    val stype =
      "struct<chunks:array<string>,cur:string,n:int>"
    val packed = aggregate(col("sents_"),
      struct(array().cast("array<string>").as("chunks"),
        lit("").as("cur"), lit(0).as("n")).cast(stype),
      (acc, s) => {
        val t = size(TextAnalysis.tokens(s))
        val chunks = acc.getField("chunks")
        val cur = acc.getField("cur")
        val n = acc.getField("n")
        when(n > 0 && n + t > maxTokens,
          struct(concat(chunks, array(cur)), s, t).cast(stype))
          .otherwise(struct(chunks,
            when(cur === "", s).otherwise(concat(cur, lit(" "), s)),
            n + t).cast(stype))
      },
      acc => when(acc.getField("cur") === "", acc.getField("chunks"))
        .otherwise(concat(acc.getField("chunks"),
          array(acc.getField("cur")))))
    df.withColumn("sents_", TextAnalysis.sentences(col(textCol)))
      .withColumn("packed_", packed)
      .select(idCols.map(col) :+
        posexplode(col("packed_")).as(Seq("chunk_idx", "chunk_")): _*)
      .select(idCols.map(col) ++ Seq(
        col("chunk_idx").cast("long").as("chunk_idx"),
        TextAnalysis.tokenCount(col("chunk_")).cast("long")
          .as("n_tokens"),
        col("chunk_").as("chunk_text")): _*)
  }

  /** Per-document top term by smoothed TF-IDF
    * (`tf/len · (ln((1+N)/(1+df))+1)`), with the score in integer
    * micro-units so ranking and cross-engine comparison are immune to
    * last-ulp float noise. Returns (idCol, top_term, tfidf_micro, tf).
    *
    * Scale shape: one explode → (doc, term) map-side-combined count;
    * document frequency derives from that same table (second combine);
    * idf joins back as a hash join on term (the vocabulary may exceed
    * broadcast size at 100 TB — AQE downgrades to broadcast when it
    * doesn't); the final per-doc argmax is a map-side-combined min of
    * a sort-key struct, not a window. */
  def tfIdfTopTerms(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    requireFresh(df, "toks_")
    tfIdfTopTermsFromTokens(
      df.withColumn("toks_", TextAnalysis.tokens(lower(col(textCol)))),
      "toks_", idCol)
  }

  /** [[tfIdfTopTerms]] over a frame that already carries the
    * lowercased token array in `toksCol` — the stored-ingest-artifact
    * entry point (a production corpus tokenizes once at ingest; every
    * token-driven consumer reads the stored arrays instead of
    * re-splitting the text), same pattern as
    * [[graft.text.Dedup.nearDupPairsFromSigTable]]. */
  def tfIdfTopTermsFromTokens(df: DataFrame, toksCol: String,
      idCol: String): DataFrame = {
    requireFresh(df.drop(toksCol), "dl_", "micro_")
    val n = df.select(count(lit(1)).as("n_"))
    val terms = df
      .select(col(idCol), size(col(toksCol)).as("dl_"),
        explode(col(toksCol)).as("term"))
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(first(col("dl_")).as("dl_"), count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df_"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("micro_", round((col("tf").cast("double") / col("dl_")) *
        (log((lit(1.0) + col("n_")) / (lit(1.0) + col("df_"))) + 1.0)
        * 1e6).cast("long"))
    scored.groupBy(col(idCol))
      .agg(min(struct((-col("micro_")).as("nmicro"), (-col("tf")).as("ntf"),
        col("term").as("term"))).as("best_"))
      .select(col(idCol),
        col("best_.term").as("top_term"),
        (-col("best_.nmicro")).as("tfidf_micro"),
        (-col("best_.ntf")).as("tf"))
  }

  /** Corpus vocabulary builder: the top-`k` whitespace tokens by
    * frequency with their dense rank — the vocabulary/merges-prep pass
    * before tokenizer (BPE) training. Returns (rank, token, cnt),
    * ties broken lexicographically.
    *
    * Scale shape: one explode into a map-side-combined token count
    * (vocabulary-scale rows reach the shuffle, not corpus-scale), then
    * `orderBy(...).limit(k)` — Spark's distributed TakeOrdered, each
    * partition keeps k candidates and only n_partitions×k rows reach
    * the driver-side merge, no global sort. The rank window runs over
    * the k survivors only. */
  def vocabTopK(df: DataFrame, textCol: String, k: Int): DataFrame =
    vocabTopKFromTokens(
      df.select(TextAnalysis.tokens(col(textCol)).as("toks_")),
      "toks_", k)

  /** [[vocabTopK]] over a pre-tokenized frame (RAW tokens — vocabulary
    * building is case-preserving) — see [[tfIdfTopTermsFromTokens]]
    * for the stored-artifact rationale. */
  def vocabTopKFromTokens(df: DataFrame, toksCol: String,
      k: Int): DataFrame = {
    require(k > 0)
    val counts = df
      .select(explode(col(toksCol)).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val top = counts.orderBy(col("cnt").desc, col("token")).limit(k)
    top.withColumn("rank", row_number()
        .over(Window.orderBy(col("cnt").desc, col("token"))).cast("long"))
      .select(col("rank"), col("token"), col("cnt"))
  }

  /** Semantic decontamination: flag corpus documents whose EMBEDDING
    * is close to any probe (eval-benchmark) embedding — catches
    * paraphrased contamination that k-gram [[decontaminate]] misses.
    * Returns (idCol, n_close_probes, contaminated).
    *
    * Scale shape: the probe suite is eval-scale, so it broadcasts and
    * the corpus is scanned ONCE with the codegen'd dot product (norms
    * hoisted per side) — the same asymmetric few-queries × huge-corpus
    * plan as brute-force ANN; only matching pairs reach the per-doc
    * count shuffle. */
  def decontaminateSemantic(corpus: DataFrame, probes: DataFrame,
      vecCol: String, idCol: String, minCosine: Double): DataFrame = {
    import graft.similarity.Similarity.{dot, norm}
    // zero-norm vectors have no cosine direction: 0/0 = NaN, and NaN
    // is GREATER than any threshold under Spark's ordering — without
    // this filter a zero-norm corpus doc matches every probe, and one
    // zero-norm probe flags the ENTIRE corpus contaminated (same guard
    // as Similarity.semDedup)
    val c = corpus.select(col(idCol), col(vecCol).as("v_"))
      .withColumn("nrm_", norm(col("v_")))
      .where(col("nrm_") > 0)
    val p = probes.select(col(vecCol).as("pv_"))
      .withColumn("pnrm_", norm(col("pv_")))
      .where(col("pnrm_") > 0)
    val close = c.crossJoin(broadcast(p))
      .where(dot(col("v_"), col("pv_")) / (col("nrm_") * col("pnrm_"))
        >= minCosine)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_close_probes"))
    corpus.select(col(idCol))
      .join(close, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_close_probes"), lit(0L)).as("n_close_probes"),
        (coalesce(col("n_close_probes"), lit(0L)) > 0).cast("long")
          .as("contaminated"))
  }

  /** Exactly `n` rows per stratum, chosen by a deterministic hash
    * order (md5 over seed + id columns): unlike [[stratifiedSample]]'s
    * binomial keep-rates this hits the count exactly — the eval-set /
    * holdout construction primitive. Identical output on any engine
    * that can md5 a string, under any partitioning.
    *
    * Scale shape: one shuffle on the stratum key for the rank window;
    * the per-stratum sort is the price of exact-N (use
    * [[stratifiedSample]] when approximate rates suffice). */
  def exactSamplePerStratum(df: DataFrame, strataCol: String, n: Int,
      idCols: Seq[String], seed: Long = 42L): DataFrame = {
    require(n > 0 && idCols.nonEmpty)
    requireFresh(df, "rank_")
    val r = md5(concat_ws("|",
      lit(seed.toString) +: idCols.map(c => col(c).cast("string")): _*))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(r +: idCols.map(col): _*)
    df.withColumn("rank_", row_number().over(w))
      .where(col("rank_") <= n)
      .drop("rank_")
  }

  /** Deterministic epoch shuffle-and-shard for training order: every
    * row gets a `shard` in [0, numShards) and a dense `pos` within its
    * shard, both derived from md5 over (seed, id columns) — a global
    * pseudo-random permutation that is reproducible under any
    * partitioning, AQE re-plan, or task retry, and re-drawable per
    * epoch by bumping `seed`. The standard last step that turns a
    * curated corpus into N training files consumed in order.
    *
    * Scale shape: shard assignment is a pure row expression; the only
    * shuffle is the hash exchange on `shard` that the per-shard
    * `row_number` needs — exactly the write path's clustering (one
    * shard = one training file), so the sort is reused by the sink.
    * Shards stay balanced by hash uniformity; pick numShards ≈ corpus
    * size / file-size target. */
  def trainingOrder(df: DataFrame, idCols: Seq[String], numShards: Int,
      seed: Long = 42L): DataFrame = {
    require(numShards > 0 && idCols.nonEmpty)
    // shard/pos are OUTPUT columns: an input already carrying them
    // (e.g. a frame pre-sharded for packing) would be silently
    // overwritten by the md5-derived values
    requireFresh(df, "h_", "shard", "pos")
    val h = md5(concat_ws("|",
      lit(seed.toString) +: idCols.map(c => col(c).cast("string")): _*))
    val shard = pmod(conv(substring(col("h_"), 1, 8), 16, 10)
      .cast("long"), lit(numShards.toLong)).cast("int")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("h_") +: idCols.map(col): _*)
    df.withColumn("h_", h)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .drop("h_")
  }

  /** Greedy next-fit sequence packing: walk each key's rows in
    * (orderCols) order, accumulating `sizeCol` into the current pack
    * until the next row would exceed `budget`, then open a new pack —
    * the standard step that turns chunks into fixed-token-budget
    * training sequences. Adds (pack_id, pack_offset); rows larger than
    * `budget` get a pack of their own. A sequential recurrence (the
    * reset depends on the running value), so like [[graft.core
    * .TimeSeries.ewma]] it uses the secondary-sort pattern: one hash
    * shuffle on `keyCols`, in-partition sort, one streaming state
    * pass. Deterministic under any partitioning. */
  def packGreedy(df: DataFrame, sizeCol: String, budget: Long,
      keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    require(budget > 0 && keyCols.nonEmpty && orderCols.nonEmpty)
    val sIdx = df.columns.indexOf(sizeCol)
    require(sIdx >= 0, "missing column")
    // null sizes pack as 0 tokens (kept, costless) rather than NPE-ing
    // a task
    def size(r: org.apache.spark.sql.Row): Long =
      if (r.isNullAt(sIdx)) 0L else r.getAs[Number](sIdx).longValue()
    // state = (pack, fill). In the step case the current pack is by
    // construction non-empty (init handled the first row), so the
    // split guard is plain `fill + s > budget` — the earlier bug was
    // an extra `fill > 0` PREcondition that let an over-budget row
    // join a pack opened by a zero-size (null) row, violating the
    // oversized-rows-stand-alone contract. For all-positive sizes the
    // guards are identical (every non-empty pack has fill >= 1), which
    // is why the q91 recursive-CTE oracle's fill > 0 walk still
    // matches over chunked text (chunks are never 0 tokens).
    graft.core.SequentialScan.perKey[(Long, Long)](df, keyCols,
      orderCols,
      Seq(org.apache.spark.sql.types.StructField("pack_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("pack_offset",
          org.apache.spark.sql.types.LongType))) { r =>
      ((0L, size(r)), Seq(0L, 0L))
    } { case ((pack, fill), r) =>
      val s = size(r)
      val (p2, off) =
        if (fill + s > budget) (pack + 1, 0L) else (pack, fill)
      ((p2, off + s), Seq(p2, off))
    }
  }

  /** CCNet/RefinedWeb-style LINE-level boilerplate removal: a line
    * (trimmed, at least `minLineChars` chars) that appears in >=
    * `maxDocs` DISTINCT documents is boilerplate (headers, footers,
    * cookie banners, nav text) and is dropped from EVERY document.
    * Returns (idCol, n_lines, n_dropped, textCol) with the surviving
    * lines rejoined in original order — documents with no boilerplate
    * reconstruct byte-identically.
    *
    * Scale shape — TEXT NEVER CROSSES AN EXCHANGE: the explode is
    * NARROW (id, position, 64-bit line hash, trimmed length — no line
    * text), MATERIALIZED once (lazy localCheckpoint) because it feeds
    * both the document-frequency branch and the drop-decision join
    * (the multi-consumer trap `Dedup.signatureBandsFromHashes`
    * documents). Document frequency is two map-side-combined shuffles
    * on the hash ((hash, doc) dedup, then count); membership joins the
    * narrow rows against the over-threshold hash set (boilerplate is
    * by definition a small, high-frequency set — AQE broadcasts it);
    * the drop decisions aggregate to ONE per-doc sorted drop-index
    * array — a frame of only the documents that lose a line — which
    * broadcast-joins back to the ORIGINAL row, and the text is rebuilt
    * ROW-LOCALLY by re-splitting the original text and skipping the
    * dropped positions (split is deterministic, so the rebuild sees
    * exactly the exploded lines). The corpus text is read where it
    * already sits; only hashes and indexes move — precise contract
    * (boilerplate can touch EVERY doc, making the drop frame
    * corpus-row-scale): see the rebuildByIndex note — zero text
    * exchanges while the drop-index frame broadcasts, at most ONE
    * beyond that, zero again on an id-bucketed corpus.
    * A 64-bit hash collision could merge two line groups
    * (over-dropping the rarer line); at curation thresholds that risk
    * is accepted for the 10× lighter shuffle. `idCol` must be unique
    * per row (one document per row — the join-back keys on it). */
  def dedupLines(df: DataFrame, textCol: String, idCol: String,
      maxDocs: Long = 10, minLineChars: Int = 1): DataFrame = {
    require(maxDocs >= 2, "maxDocs < 2 would drop every repeated line")
    requireFresh(df, "idx_", "lh_", "len_", "bl_", "drop_",
      "dropidx_", "units_")
    // null text folds to "" BEFORE the split: split(null) explodes to
    // zero rows, which would silently drop the document from the
    // output (violating one-row-per-doc; join-back callers would lose
    // it). An empty line is never boilerplate, so the doc survives
    // with text = "".
    val parts = split(coalesce(col(textCol), lit("")), "\n")
    val narrow = df
      .select(col(idCol), posexplode(parts))
      .select(col(idCol), col("pos").as("idx_"),
        xxhash64(trim(col("col"))).as("lh_"),
        length(trim(col("col"))).as("len_"))
      .localCheckpoint(false) // feeds DF branch + decision join once
    val boiler = narrow
      .where(col("len_") >= minLineChars)
      .select(col("lh_"), col(idCol)).distinct()
      .groupBy(col("lh_")).agg(count(lit(1)).as("df_"))
      .where(col("df_") >= maxDocs)
      .select(col("lh_"), lit(1).as("bl_"))
    val flagged = narrow.join(boiler, Seq("lh_"), "left")
      .withColumn("drop_",
        col("bl_").isNotNull && col("len_") >= minLineChars)
    rebuildByIndex(df, dropIndexes(flagged, idCol), textCol, idCol,
      parts, joinSep = "\n", nCol = "n_lines")
  }

  // per-doc sorted drop-index array from a flagged narrow frame —
  // only documents that lose something get a row, at ~40 bytes per
  // affected doc. NOT always broadcast-scale: ubiquitous boilerplate
  // (the dedupLines regime) can touch nearly every document, so the
  // join-back's exchange behavior is data-dependent — see
  // rebuildByIndex
  private def dropIndexes(flagged: DataFrame, idCol: String): DataFrame =
    flagged.where(col("drop_"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("idx_"))).as("dropidx_"))

  // the shared text-local rebuild: left-join the per-doc drop-index
  // frame to the ORIGINAL rows and re-split the original text,
  // skipping dropped positions — the re-split reproduces the exploded
  // units exactly (deterministic segmentation of ORIGINAL text; only
  // re-segmenting REBUILT text is non-invertible). Text-exchange
  // contract, precisely: while the drop-index frame broadcasts
  // (~40 B/affected doc — AQE broadcasts it far beyond toy sizes),
  // text NEVER crosses an exchange; when drops outgrow the broadcast
  // threshold (every-doc-affected regimes), the join degrades to AT
  // MOST ONE text exchange — still half the old regroup plan's two —
  // and to ZERO if the corpus is already partitioned/bucketed on
  // idCol (the exchange is elided by the existing distribution)
  private def rebuildByIndex(df: DataFrame, drops: DataFrame,
      textCol: String, idCol: String, units: Column, joinSep: String,
      nCol: String): DataFrame = {
    // array_contains(null, i) is null and a null lambda predicate
    // EXCLUDES the element — docs with no drops would lose every unit
    // without the coalesce
    val dropArr = coalesce(col("dropidx_"),
      array().cast("array<int>"))
    df.join(drops, Seq(idCol), "left")
      // two-step projection ON PURPOSE: `units` (a regex-heavy
      // split/segmentation) feeds both size() and filter() below;
      // aliasing it first keeps CollapseProject from inlining one
      // copy per consumer (it only collapses multiply-referenced
      // aliases when they're cheap), so the segmentation runs ONCE
      // per row instead of twice
      .select(col(idCol), col("dropidx_"), units.as("units_"))
      .select(col(idCol),
        size(col("units_")).cast("long").as(nCol),
        // size() of the already-null-coalesced array, NOT
        // coalesce(size(NULL), 0): under legacy sizeOfNull (ANSI
        // off) size(NULL) is -1, not null, and every no-drop doc
        // would report n_dropped = -1 — the config-robust form
        // StreamingCuration already uses
        size(dropArr).cast("long").as("n_dropped"),
        concat_ws(joinSep,
          filter(col("units_"), (x, i) => !array_contains(dropArr, i)))
          .as(textCol))
  }

  /** SKETCH-ACCELERATED boilerplate removal — [[dedupLines]] without
    * its shuffle: candidate lines come from a Misra–Gries pass over
    * per-document-DISTINCT trimmed lines
    * ([[graft.core.HeavyHitters]]), so document frequency is what's
    * counted; a line drops only when its sketch LOWER bound already
    * proves `df ≥ maxDocs` — the SAFE direction (a rare line can
    * never be mistaken for boilerplate; a true boilerplate line can
    * at worst survive when the sketch slack `N/(k+1)` swallows it —
    * size `sketchK` to the boilerplate budget). Plan: ONE
    * mapPartitions scan for the sketch (primitive-key Misra-Gries
    * over the lines' 64-BIT HASHES — `HeavyHitters
    * .heavyHittersLongsExploded`; sketching hashes instead of line
    * text halves the scan cost and ships ≤ partitions·k LONGS to the
    * driver, and the 64-bit-collision risk it adds — two line groups
    * merging, the rarer over-dropped — is EXACTLY the trade
    * [[dedupLines]] already accepts by keying its shuffle on
    * `xxhash64(line)`), then ONE `mapPartitions` rebuild probing the
    * sorted candidate-hash array with a binary search — O(log k),
    * zero allocation per line (the earlier `typedLit`/
    * `array_contains` formulation was an O(|candidates|) LINEAR scan
    * per line, the exact literal-collection trap the langid scaladoc
    * measured at 30×). Lines under `minLineChars` are filtered BEFORE
    * the sketch — they can never be boilerplate, so they must not eat
    * counters or slack. All trims/hashes happen in Column land
    * (byte-exact parity with [[dedupLines]]); the rebuild only
    * consults precomputed arrays. Zero shuffles end to end, vs
    * [[dedupLines]]' narrow explode + distinct + groupBy + decision
    * join (hash/index rows only since the text-free rewrite — but
    * still tens of MB per million documents on a real cluster's
    * network, vs literally nothing here). Same output schema.
    *
    * Sizing `sketchK`: MG finds every item with true df >
    * N/(sketchK+1), N = total qualifying distinct-per-doc lines; a
    * planted line with df `f` is GUARANTEED dropped when
    * `f − N/(sketchK+1) ≥ maxDocs`. Size sketchK to the boilerplate
    * budget — e.g. 13M lines with 4k banners at df≈244 needs
    * sketchK ≥ 2^17 (slack 99), not the 2^14 default (slack 794
    * swallows the banners entirely). */
  def dedupLinesApprox(df: DataFrame, textCol: String, idCol: String,
      maxDocs: Long = 10, minLineChars: Int = 1,
      sketchK: Int = 1 << 14): DataFrame = {
    require(maxDocs >= 2, "maxDocs < 2 would drop every repeated line")
    requireFresh(df, "lines_", "lh_", "q_")
    val spark = df.sparkSession
    // per-doc DISTINCT qualifying line hashes feed the sketch (df
    // semantics: a line repeated inside one doc counts once)
    val qualifying = array_distinct(filter(transform(
      split(coalesce(col(textCol), lit("")), "\n"), l => trim(l)),
      l => length(l) >= minLineChars))
    val hits = graft.core.HeavyHitters.heavyHittersLongsExploded(
      df.select(transform(qualifying, l => xxhash64(l)).as("arr_")),
      col("arr_"), sketchK)
    val boiler = hits.filter(_.countMin >= maxDocs).map(_.item)
      .sorted.toArray
    val bc = spark.sparkContext.broadcast(boiler)
    val prepared = df
      .select(col(idCol),
        split(coalesce(col(textCol), lit("")), "\n").as("lines_"))
      .select(col(idCol), col("lines_"),
        transform(col("lines_"), l => xxhash64(trim(l))).as("lh_"),
        transform(col("lines_"),
          l => length(trim(l)) >= minLineChars).as("q_"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      prepared.schema.head,
      org.apache.spark.sql.types.StructField("n_lines",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_dropped",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField(textCol,
        org.apache.spark.sql.types.StringType)))
    prepared.mapPartitions { rows =>
      val set = bc.value
      rows.map { r =>
        val lines = r.getSeq[String](1)
        val lhs = r.getSeq[Long](2)
        val qs = r.getSeq[Boolean](3)
        val kept = new scala.collection.mutable.ArrayBuffer[String](
          lines.length)
        var i = 0
        while (i < lines.length) {
          if (!(qs(i) &&
              java.util.Arrays.binarySearch(set, lhs(i)) >= 0))
            kept += lines(i)
          i += 1
        }
        org.apache.spark.sql.Row(r.get(0), lines.length.toLong,
          (lines.length - kept.length).toLong, kept.mkString("\n"))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Dolma-style PARAGRAPH-level dedup: the corpus keeps exactly ONE
    * copy of every distinct (trimmed) paragraph — the FIRST occurrence
    * in (idCol, position) order — and every later occurrence is
    * dropped from its document's text. This is the other half of
    * line-level curation: [[dedupLines]] removes high-frequency
    * boilerplate (df ≥ threshold, ALL copies die); paragraph dedup
    * removes REPEATED CONTENT (every duplicate after the first dies,
    * the canonical copy survives) — the Dolma/BFF recipe for memorized
    * spans that document-level near-dup misses because the containing
    * documents differ.
    *
    * Scale shape — TEXT NEVER CROSSES AN EXCHANGE (the [[dedupLines]]
    * narrow-flag/local-rebuild plan): the explode carries (id,
    * position, 64-bit trimmed-paragraph hash, trimmed length) — no
    * paragraph text; the first-occurrence keeper per hash is ONE
    * map-side-combined `min(struct(id, idx))` groupBy; the keeper
    * (distinct-paragraph-scale) flows back through a hash-partitioned
    * equi-join against the NARROW rows only; the drop decisions
    * aggregate to a per-doc drop-index array (only documents that
    * lose a paragraph) that joins back to the ORIGINAL row
    * (broadcast while it fits — see the rebuildByIndex contract:
    * zero text exchanges then, at most one beyond), and the text
    * rebuilds row-locally by re-splitting the original text. No
    * window over the corpus, nothing driver-side. A 64-bit collision merges two paragraph
    * groups (the rarer one over-dropped); at curation scale that risk
    * buys the text-free shuffles, same trade as [[dedupLines]].
    *
    * `sep` is a LITERAL separator (regex-quoted before the split),
    * default blank-line paragraphs; paragraphs shorter than
    * `minParaChars` after trim are never deduped (empty/whitespace
    * fragments are structure, not content). Returns one row per doc:
    * (idCol, n_paras, n_dropped, textCol rebuilt with `sep`).
    * `idCol` must be unique per row. */
  def dedupParagraphs(df: DataFrame, textCol: String, idCol: String,
      sep: String = "\n\n", minParaChars: Int = 1): DataFrame = {
    requireFresh(df, "idx_", "ph_", "len_", "kid_", "kidx_",
      "drop_", "dropidx_", "units_")
    val narrow = explodeParagraphsNarrow(df, textCol, idCol, sep)
      // feeds the keeper branch + the decision join once (the
      // multi-consumer re-execution trap dedupLines documents)
      .localCheckpoint(false)
    val keeper = narrow
      .where(col("len_") >= minParaChars)
      .groupBy(col("ph_"))
      .agg(min(struct(col(idCol).as("kid_"), col("idx_").as("kidx_")))
        .as("k_"))
      .select(col("ph_"), col("k_.kid_").as("kid_"),
        col("k_.kidx_").as("kidx_"))
    val flagged = narrow.join(keeper, Seq("ph_"), "left")
      .withColumn("drop_", col("kid_").isNotNull &&
        !(col(idCol) === col("kid_") && col("idx_") === col("kidx_")))
    rebuildByIndex(df, dropIndexes(flagged, idCol), textCol, idCol,
      split(coalesce(col(textCol), lit("")),
        java.util.regex.Pattern.quote(sep)),
      joinSep = sep, nCol = "n_paras")
  }

  /** SENTENCE-level dedup — the missing rung of the Dolma/CCNet
    * line → sentence → paragraph → document curation ladder:
    * the corpus keeps exactly ONE copy of every distinct sentence
    * ([[TextAnalysis.sentences]] segmentation, already trimmed) — the
    * FIRST occurrence in (idCol, position) order — and every later
    * occurrence is dropped from its document. [[dedupLines]] kills
    * high-frequency boilerplate (ALL copies), [[dedupParagraphs]]
    * dedups blank-line blocks; this catches the repeated SENTENCE
    * (legal disclaimers, lead sentences syndicated across outlets,
    * memorized quotes) that paragraph granularity misses because the
    * surrounding paragraphs differ.
    *
    * Same scale shape as [[dedupParagraphs]] — TEXT NEVER CROSSES AN
    * EXCHANGE: the explode carries (id, position, 64-bit sentence
    * hash, length) — no sentence text; the first-occurrence keeper
    * per hash is ONE map-side-combined `min(struct(id, idx))` groupBy;
    * drop decisions aggregate to a per-doc drop-index array that
    * joins back to the ORIGINAL row (broadcast while it fits — the
    * rebuildByIndex contract: zero text exchanges then, at most one
    * beyond), and the text rebuilds row-locally by RE-SEGMENTING THE
    * ORIGINAL text and skipping the dropped positions. (Segmenting ORIGINAL text is deterministic,
    * so the rebuild sees exactly the exploded sentences; the
    * non-invertibility lesson — see [[dedupSentencesWithIndex]] —
    * only forbids re-segmenting REBUILT text.) Sentences shorter than
    * `minSentChars` are never deduped. Documents with no sentences
    * (empty/null text) survive with text = "". Returns one row per
    * doc: (idCol, n_sentences, n_dropped, textCol rebuilt with a
    * single space — segmentation already trimmed inter-sentence
    * whitespace). `idCol` must be unique per row. */
  def dedupSentences(df: DataFrame, textCol: String, idCol: String,
      minSentChars: Int = 1): DataFrame =
    rebuildSentences(df, flagSentences(df, textCol, idCol,
      minSentChars, storedHashes = None), textCol, idCol)

  /** [[dedupSentences]] PLUS the kept-sentence index from the same
    * single computation: (cleaned corpus, [[sentenceHashes]]-schema
    * rows of exactly the sentences the cleaned corpus kept). The
    * index comes from the keeper decision itself, NEVER by
    * re-segmenting the rebuilt text — segmentation is not invertible
    * (rejoining "He said no." + "3 dogs barked." puts the dot before
    * whitespace+digit, the no./st. protection suppresses the
    * boundary, and ONE merged hash would be stored for two kept
    * sentences, breaking the streaming store's one-canonical-copy
    * convergence). `sent_idx` is the sentence's position in the
    * ORIGINAL document. */
  def dedupSentencesWithIndex(df: DataFrame, textCol: String,
      idCol: String, minSentChars: Int = 1): (DataFrame, DataFrame) = {
    val flagged = flagSentences(df, textCol, idCol, minSentChars,
      storedHashes = None)
    (rebuildSentences(df, flagged, textCol, idCol),
      keptSentenceHashes(flagged, idCol, minSentChars))
  }

  // NARROW exploded sentences (id, position, hash, length — no
  // sentence text) with the corpus-wide (and, when storedHashes is
  // given, stored-membership) drop decision — the shared core of
  // dedupSentences / dedupSentencesAgainst and their WithIndex forms.
  // localCheckpoint'd: every caller consumes it from >= 2 branches
  // (rebuild + index, keeper + decision join — the multi-consumer
  // re-execution trap dedupLines documents). `storedHashes` may be
  // the full stored table (exact membership join) or a PRE-CONFIRMED
  // known-hash set from the sharded-Bloom front (see
  // [[dedupSentencesAgainstWithIndexSharded]]) — both arrive as a
  // (sent_chars, sent_hash)-schema frame.
  private def flagSentences(df: DataFrame, textCol: String,
      idCol: String, minSentChars: Int,
      storedHashes: Option[DataFrame]): DataFrame =
    flagSentencesResolved(df, textCol, idCol, minSentChars,
      storedHashes.map { stored => (_: DataFrame) =>
        stored.where(col("sent_chars") >= minSentChars)
          .select(col("sent_hash").as("sh_")).distinct()
      })

  // the shared core with a PLUGGABLE known-membership resolver: the
  // resolver receives the already-materialized narrow explode (so a
  // sharded-Bloom front can derive its probe hashes WITHOUT a second
  // segmentation pass over the batch text) and returns the resolved
  // known-hash frame (single `sh_` column, distinct).
  private def flagSentencesResolved(df: DataFrame, textCol: String,
      idCol: String, minSentChars: Int,
      resolveKnown: Option[DataFrame => DataFrame]): DataFrame = {
    requireFresh(df, "idx_", "sh_", "len_", "kid_", "kidx_",
      "drop_", "known_", "dropidx_", "units_")
    val narrow = explodeSentencesNarrow(df, textCol, idCol)
      .localCheckpoint(false)
    val keeper = narrow
      .where(col("sh_").isNotNull && col("len_") >= minSentChars)
      .groupBy(col("sh_"))
      .agg(min(struct(col(idCol).as("kid_"), col("idx_").as("kidx_")))
        .as("k_"))
      .select(col("sh_"), col("k_.kid_").as("kid_"),
        col("k_.kidx_").as("kidx_"))
    val joined = narrow.join(keeper, Seq("sh_"), "left")
    val withKnown = resolveKnown match {
      case Some(resolve) =>
        val known = resolve(narrow).withColumn("known_", lit(1))
        joined.join(known, Seq("sh_"), "left")
          .withColumn("drop_", col("known_").isNotNull ||
            (col("kid_").isNotNull &&
              !(col(idCol) === col("kid_") &&
                col("idx_") === col("kidx_"))))
      case None =>
        joined.withColumn("drop_", col("kid_").isNotNull &&
          !(col(idCol) === col("kid_") && col("idx_") === col("kidx_")))
    }
    // the WithIndex callers consume this from two branches (rebuild +
    // index) — barrier so the keeper join runs once
    withKnown.localCheckpoint(false)
  }

  // the sentence face of rebuildByIndex: re-segment the ORIGINAL text
  // row-locally and skip dropped positions (deterministic — only
  // REBUILT text is non-invertible to re-segment)
  private def rebuildSentences(df: DataFrame, flagged: DataFrame,
      textCol: String, idCol: String): DataFrame =
    rebuildByIndex(df, dropIndexes(flagged, idCol), textCol, idCol,
      TextAnalysis.sentences(col(textCol)), joinSep = " ",
      nCol = "n_sentences")

  // only sentences AT OR ABOVE minSentChars enter the index: shorter
  // ones are never deduped (flagSentences' keeper filter), so storing
  // them would bloat the narrow table with one "Thanks."-style row
  // per document and buy nothing — a store built at minSentChars = X
  // therefore answers membership only for probes with
  // minSentChars >= X (SentenceIndexStore fixes one X per store)
  private def keptSentenceHashes(flagged: DataFrame, idCol: String,
      minSentChars: Int): DataFrame =
    flagged.where(col("sh_").isNotNull && !col("drop_") &&
        col("len_") >= minSentChars)
      .select(col(idCol), col("idx_").as("sent_idx"),
        col("len_").as("sent_chars"),
        col("sh_").as("sent_hash"))

  /** The stored-artifact half of sentence dedup — the
    * [[paragraphHashes]] convention one granularity down: one row per
    * (idCol, sentence position) with the sentence's 64-bit hash,
    * computed ONCE at ingest and persisted, so incremental dedup
    * ([[dedupSentencesAgainst]]) and membership filters read a narrow
    * (id, idx, chars, hash) table instead of re-segmenting corpus
    * text. */
  def sentenceHashes(df: DataFrame, textCol: String, idCol: String)
      : DataFrame =
    explodeSentencesNarrow(df, textCol, idCol)
      .where(col("sh_").isNotNull)
      .select(col(idCol), col("idx_").as("sent_idx"),
        col("len_").as("sent_chars"), col("sh_").as("sent_hash"))

  // NARROW sentence explode — (id, idx_, sh_, len_), never the
  // sentence text (the text-free-shuffle contract of the ladder)
  private def explodeSentencesNarrow(df: DataFrame, textCol: String,
      idCol: String): DataFrame = df
    .select(col(idCol),
      posexplode_outer(TextAnalysis.sentences(col(textCol))))
    .select(col(idCol), col("pos").as("idx_"),
      // null-sentence rows (doc had no sentences) must NOT join any
      // keeper/membership table: xxhash64(null) is the seed constant,
      // which a real sentence could collide with — keep the key null
      when(col("col").isNotNull, xxhash64(col("col"))).as("sh_"),
      length(col("col")).as("len_"))

  /** Incremental sentence dedup for a delta batch against a STORED
    * corpus — [[dedupParagraphsAgainst]] at sentence granularity: any
    * incoming sentence whose hash exists in `storedHashes` (a
    * [[sentenceHashes]] table, `sent_chars >= minSentChars`) drops,
    * and within the delta the corpus-wide first-occurrence rule
    * applies — ingest order never changes what the merged corpus
    * would have kept (the spec proves two-step ≡ one-pass). Exact
    * membership via a hash-partitioned join against the stored side's
    * distinct hashes (narrow, co-partitioned on the key — NOT a
    * broadcast, it is corpus-proportional). Returns the
    * [[dedupSentences]] schema for the delta rows. */
  def dedupSentencesAgainst(delta: DataFrame, storedHashes: DataFrame,
      textCol: String, idCol: String, minSentChars: Int = 1)
      : DataFrame =
    rebuildSentences(delta, flagSentences(delta, textCol, idCol,
      minSentChars, Some(storedHashes)), textCol, idCol)

  /** [[dedupSentencesAgainst]] PLUS the kept-sentence index from the
    * same single computation — the streaming fold-back form (see
    * [[dedupSentencesWithIndex]] for why the index must come from the
    * keeper decision, not from re-segmenting rebuilt text). */
  def dedupSentencesAgainstWithIndex(delta: DataFrame,
      storedHashes: DataFrame, textCol: String, idCol: String,
      minSentChars: Int = 1): (DataFrame, DataFrame) = {
    val flagged = flagSentences(delta, textCol, idCol, minSentChars,
      Some(storedHashes))
    (rebuildSentences(delta, flagged, textCol, idCol),
      keptSentenceHashes(flagged, idCol, minSentChars))
  }

  /** [[dedupSentencesAgainstWithIndex]] fronted by a SHARDED Bloom
    * probe — the per-micro-batch scale path the streaming store's
    * contract declares mandatory at sentence granularity: instead of
    * hash-joining the full stored table every batch
    * (corpus-proportional), the delta's DISTINCT sentence hashes
    * (batch-scale) probe the (shard, bloom_bytes) table built by
    * [[sentenceBloomShards]] — each task holds ONE shard's sketch —
    * and only the flagged MAYBEs are exactly confirmed against the
    * stored table via a BROADCAST semi-join (the stored side is
    * scanned but never shuffled; parquet pruning applies). Bloom
    * filters have NO false negatives, so the confirmed-known set is
    * exactly the exact join's — output is identical, spec-pinned.
    * The stored table and the shard filters must cover the same kept
    * sentences (the store grows both per batch). */
  def dedupSentencesAgainstWithIndexSharded(delta: DataFrame,
      storedHashes: DataFrame, shardBlooms: DataFrame, shards: Int,
      textCol: String, idCol: String, minSentChars: Int = 1)
      : (DataFrame, DataFrame) = {
    // the resolver reads the probe hashes off the SAME materialized
    // narrow explode flagSentencesResolved builds — no second
    // segmentation pass over the batch text
    val resolver = (narrow: DataFrame) => {
      val deltaHashes = narrow
        .where(col("sh_").isNotNull && col("len_") >= minSentChars)
        .select(col("sh_").as("sent_hash")).distinct()
      val maybe = maybeKnownHashes(deltaHashes, "sent_hash",
        shardBlooms, shards)
      val eligible = storedHashes
        .where(col("sent_chars") >= minSentChars)
        .select(col("sent_hash"))
      confirmKnownHashes(eligible, "sent_hash", maybe)
        .select(col("sent_hash").as("sh_"))
    }
    val flagged = flagSentencesResolved(delta, textCol, idCol,
      minSentChars, Some(resolver))
    (rebuildSentences(delta, flagged, textCol, idCol),
      keptSentenceHashes(flagged, idCol, minSentChars))
  }

  /** The stored-artifact half of paragraph dedup: one row per
    * (idCol, paragraph position) with the trimmed paragraph's 64-bit
    * hash — computed ONCE at ingest and persisted, so incremental
    * dedup ([[dedupParagraphsAgainst]]) and membership filters read a
    * narrow (id, idx, hash) table instead of re-splitting corpus text
    * (the `shingleHashes` / `signatureTable` convention). */
  def paragraphHashes(df: DataFrame, textCol: String, idCol: String,
      sep: String = "\n\n"): DataFrame =
    explodeParagraphsNarrow(df, textCol, idCol, sep)
      .select(col(idCol), col("idx_").as("para_idx"),
        col("len_").as("para_chars"), col("ph_").as("para_hash"))

  // NARROW paragraph explode — (id, idx_, ph_, len_) over trimmed
  // paragraphs, never the paragraph text
  private def explodeParagraphsNarrow(df: DataFrame, textCol: String,
      idCol: String, sep: String): DataFrame = df
    // null text folds to "" BEFORE the split — split(null) explodes to
    // zero rows and would silently lose the document (dedupLines doc)
    .select(col(idCol),
      posexplode(split(coalesce(col(textCol), lit("")),
        java.util.regex.Pattern.quote(sep))))
    .select(col(idCol), col("pos").as("idx_"),
      xxhash64(trim(col("col"))).as("ph_"),
      length(trim(col("col"))).as("len_"))

  /** Incremental paragraph dedup for a delta batch against a STORED
    * corpus: any incoming paragraph whose hash exists in
    * `storedHashes` (a [[paragraphHashes]] table, `para_chars >=
    * minParaChars`) is dropped, and within the delta itself the
    * corpus-wide first-occurrence rule applies — so ingest order
    * never changes what the merged corpus would have kept. EXACT
    * membership via a hash-partitioned left-anti-style join (the
    * stored side projected to distinct hashes — narrow, co-partitioned
    * on the join key); same shape as `Dedup.nearDupsAgainstCorpus`.
    * Returns the [[dedupParagraphs]] schema for the delta rows. */
  def dedupParagraphsAgainst(delta: DataFrame, storedHashes: DataFrame,
      textCol: String, idCol: String, sep: String = "\n\n",
      minParaChars: Int = 1): DataFrame = {
    requireFresh(delta, "idx_", "ph_", "len_", "kid_",
      "kidx_", "drop_", "known_", "dropidx_", "units_")
    val narrow = explodeParagraphsNarrow(delta, textCol, idCol, sep)
      .localCheckpoint(false)
    val known = storedHashes
      .where(col("para_chars") >= minParaChars)
      .select(col("para_hash").as("ph_")).distinct()
      .withColumn("known_", lit(1))
    val keeper = narrow
      .where(col("len_") >= minParaChars)
      .groupBy(col("ph_"))
      .agg(min(struct(col(idCol).as("kid_"), col("idx_").as("kidx_")))
        .as("k_"))
      .select(col("ph_"), col("k_.kid_").as("kid_"),
        col("k_.kidx_").as("kidx_"))
    val flagged = narrow.join(keeper, Seq("ph_"), "left")
      .join(known, Seq("ph_"), "left")
      .withColumn("drop_", col("known_").isNotNull ||
        (col("kid_").isNotNull &&
          !(col(idCol) === col("kid_") && col("idx_") === col("kidx_"))))
    rebuildByIndex(delta, dropIndexes(flagged, idCol), textCol, idCol,
      split(coalesce(col(textCol), lit("")),
        java.util.regex.Pattern.quote(sep)),
      joinSep = sep, nCol = "n_paras")
  }

  /** [[dedupParagraphsAgainst]] fronted by a SHARDED Bloom probe —
    * the sentence ladder's `dedupSentencesAgainstWithIndexSharded`
    * shape at paragraph granularity, for the streaming store's
    * per-micro-batch path: instead of hash-joining the batch's
    * exploded paragraphs against the FULL stored table every batch
    * (the stored side re-shuffles per batch — corpus-proportional
    * network every few seconds), the delta's DISTINCT paragraph
    * hashes (batch-scale) probe the (shard, bloom_bytes) table
    * ([[paragraphBloomShards]]; the filters must cover exactly the
    * stored paragraphs at or above `minParaChars` — the store grows
    * both together) and only the flagged MAYBEs are exactly confirmed
    * against the stored table via the pruned-IN / broadcast-semi-join
    * confirm (stored side scanned, never shuffled; row groups pruned
    * over a hash-sorted base). Bloom filters have NO false negatives,
    * so the output is identical to the exact join — spec-pinned. */
  def dedupParagraphsAgainstSharded(delta: DataFrame,
      storedHashes: DataFrame, shardBlooms: DataFrame, shards: Int,
      textCol: String, idCol: String, sep: String = "\n\n",
      minParaChars: Int = 1): DataFrame = {
    requireFresh(delta, "idx_", "ph_", "len_", "kid_",
      "kidx_", "drop_", "known_", "dropidx_", "units_")
    val narrow = explodeParagraphsNarrow(delta, textCol, idCol, sep)
      .localCheckpoint(false)
    val deltaHashes = narrow
      .where(col("len_") >= minParaChars)
      .select(col("ph_").as("para_hash")).distinct()
    val maybe = maybeKnownHashes(deltaHashes, "para_hash",
      shardBlooms, shards)
    val eligible = storedHashes
      .where(col("para_chars") >= minParaChars)
      .select(col("para_hash"))
    val known = confirmKnownHashes(eligible, "para_hash", maybe)
      .select(col("para_hash").as("ph_"))
      .withColumn("known_", lit(1))
    val keeper = narrow
      .where(col("len_") >= minParaChars)
      .groupBy(col("ph_"))
      .agg(min(struct(col(idCol).as("kid_"), col("idx_").as("kidx_")))
        .as("k_"))
      .select(col("ph_"), col("k_.kid_").as("kid_"),
        col("k_.kidx_").as("kidx_"))
    val flagged = narrow.join(keeper, Seq("ph_"), "left")
      .join(known, Seq("ph_"), "left")
      .withColumn("drop_", col("known_").isNotNull ||
        (col("kid_").isNotNull &&
          !(col(idCol) === col("kid_") && col("idx_") === col("kidx_"))))
    rebuildByIndex(delta, dropIndexes(flagged, idCol), textCol, idCol,
      split(coalesce(col(textCol), lit("")),
        java.util.regex.Pattern.quote(sep)),
      joinSep = sep, nCol = "n_paras")
  }

  /** Build a Bloom filter over a stored [[paragraphHashes]] table —
    * the BFF ("Bloom filter filtering") fast path for ingest-time
    * paragraph membership when even the narrow hash table is too big
    * to join per micro-batch. Mergeable per-partition filters
    * tree-aggregate to one driver-side sketch of ~1.2 bytes/item at
    * 1% fpp (10⁹ stored paragraphs ≈ 1.2 GB — size `expectedItems`
    * deliberately); broadcast it to [[flagMaybeKnownParagraphs]].
    * NO false negatives: a stored paragraph is always flagged. */
  def paragraphBloom(storedHashes: DataFrame, expectedItems: Long,
      fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter =
    storedHashes.stat.bloomFilter("para_hash", expectedItems, fpp)

  /** Flag each delta paragraph that MIGHT exist in the corpus the
    * Bloom filter was built over ([[paragraphBloom]]): the approximate
    * twin of [[dedupParagraphsAgainst]]'s exact join — one broadcast
    * sketch probe per row, NO shuffle and NO stored-table scan at
    * apply time, at the price of `fpp` over-dropping (never
    * under-dropping: no false negatives, the guarantee dedup cares
    * about). `mapPartitions` over the hashed rows, like `Bpe.encode` —
    * not a UDF. Returns the [[paragraphHashes]] schema plus
    * `maybe_known`; paragraphs under `minParaChars` are never
    * flagged. */
  def flagMaybeKnownParagraphs(delta: DataFrame, textCol: String,
      idCol: String, bloom: org.apache.spark.util.sketch.BloomFilter,
      sep: String = "\n\n", minParaChars: Int = 1): DataFrame = {
    val spark = delta.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(bloom)
    paragraphHashes(delta, textCol, idCol, sep)
      .select(col(idCol).cast("long"), col("para_idx"),
        col("para_chars"), col("para_hash"))
      .as[(java.lang.Long, Int, Int, Long)]
      .mapPartitions { rows =>
        val b = bc.value
        rows.map { case (id, idx, chars, h) =>
          (id, idx, chars, h,
            chars >= minParaChars && b.mightContainLong(h))
        }
      }
      .toDF(idCol, "para_idx", "para_chars", "para_hash", "maybe_known")
  }

  /** SHARDED Bloom filters over a stored [[paragraphHashes]] table —
    * the scale form of [[paragraphBloom]]: one driver sketch is fine
    * to ~10⁹ stored paragraphs (~1.2 GB at 1% fpp) but a real 100 TB
    * ingest stores 10¹¹-10¹² paragraphs, whose single sketch fits on
    * no driver OR executor. Here the hash space splits into `shards`
    * ranges (`pmod(para_hash, shards)`), each shard's filter is built
    * by ONE streaming pass over its own rows (`groupByKey.mapGroups`
    * — per-task memory = one shard's sketch, sized
    * `expectedItems / shards`), and the result is a (shard,
    * bloom_bytes) TABLE that lives where tables live. Same
    * no-false-negative guarantee per shard. Filters built with the
    * same (expectedItems, fpp, shards) are bit-compatible and merge
    * per shard via [[mergeBloomShards]] — the growing-index path. */
  def paragraphBloomShards(storedHashes: DataFrame, shards: Int,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    require(shards > 0, "shards must be positive")
    val spark = storedHashes.sparkSession
    import spark.implicits._
    val perShard = math.max(1L, expectedItems / shards)
    storedHashes
      .select(pmod(col("para_hash"), lit(shards)).cast("int")
        .as("shard"), col("para_hash"))
      .as[(Int, Long)]
      .groupByKey(_._1)
      .mapGroups { (shard, rows) =>
        val b = org.apache.spark.util.sketch.BloomFilter
          .create(perShard, fpp)
        rows.foreach(r => b.putLong(r._2))
        val out = new java.io.ByteArrayOutputStream()
        b.writeTo(out)
        (shard, out.toByteArray)
      }
      .toDF("shard", "bloom_bytes")
  }

  // OR-merge one shard's serialized sub-filter rows into a single
  // filter (None for an empty shard). Bit-compatibility is the
  // paragraphBloomShards contract; every probe/merge path shares this
  // loop so a fix (e.g. corrupt-filter handling) lands once.
  private def mergeFilterRows(rows: Iterator[Array[Byte]])
      : Option[org.apache.spark.util.sketch.BloomFilter] = {
    val filters = rows.map(b =>
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(b)))
    if (!filters.hasNext) None
    else {
      val first = filters.next()
      filters.foreach(first.mergeInPlace)
      Some(first)
    }
  }

  /** Merge a multi-row-per-shard (shard, bloom_bytes) table (e.g. one
    * sub-filter per ingest batch) into one filter per shard. All rows
    * of a shard must come from the same (expectedItems, fpp, shards)
    * build — Bloom OR-merge requires identical bit size and hash
    * count, and [[paragraphBloomShards]] guarantees it. */
  def mergeBloomShards(shardBlooms: DataFrame): DataFrame = {
    val spark = shardBlooms.sparkSession
    import spark.implicits._
    shardBlooms.select(col("shard").cast("int"), col("bloom_bytes"))
      .as[(Int, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (shard, rows) =>
        val merged = mergeFilterRows(rows.map(_._2)).get // non-empty
        val out = new java.io.ByteArrayOutputStream()
        merged.writeTo(out)
        (shard, out.toByteArray)
      }
      .toDF("shard", "bloom_bytes")
  }

  /** [[flagMaybeKnownParagraphs]] against a SHARDED (shard,
    * bloom_bytes) table — [[flagMaybeKnownHashes]] (the scan-probe:
    * distinct batch hashes broadcast over an in-place scan of the
    * filter table; only one shard's sub-filter is ever deserialized
    * per row, so per-task memory stays one sketch and nothing
    * capacity-sized crosses an exchange or the driver) joined back to
    * the per-paragraph rows. A shard with no filter row flags
    * nothing (no stored paragraph hashes there — vacuously unknown);
    * a hash is flagged iff ANY sub-filter row of its shard contains
    * it — the OR-merge's no-false-negative semantics without the
    * merge pass (the bit-union could only ADD false positives), so
    * the per-batch sub-filter layout `ParagraphIndexStore` writes is
    * consumed raw. Same output schema as
    * [[flagMaybeKnownParagraphs]]. */
  def flagMaybeKnownParagraphsSharded(delta: DataFrame,
      textCol: String, idCol: String, shardBlooms: DataFrame,
      shards: Int, sep: String = "\n\n", minParaChars: Int = 1)
      : DataFrame = {
    require(shards > 0, "shards must be positive")
    // one segmentation pass feeds both the distinct probe (eager —
    // flagMaybeKnownHashes collects it) and the per-row flag join
    val ph = paragraphHashes(delta, textCol, idCol, sep)
      .localCheckpoint(false)
    val (flagsRaw, flagsLocal) = maybeKnownHashesImpl(
      ph.where(col("para_chars") >= minParaChars)
        .select(col("para_hash")).distinct(),
      "para_hash", shardBlooms, shards)
    val flags = flagsRaw.withColumn("mk_", lit(true))
    // NUMERIC ids normalize to long like the monolithic
    // flagMaybeKnownParagraphs (whose typed encoder forces the cast);
    // any other id type passes through UNCHANGED — a blind cast would
    // silently null e.g. string ids, corrupting the join-back, and
    // the monolithic variant cannot carry those ids at all
    val idOut =
      if (delta.schema(idCol).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType])
        col(idCol).cast("long").as(idCol)
      else col(idCol)
    val joined =
      if (flagsLocal) ph.join(broadcast(flags), Seq("para_hash"), "left")
      else ph.join(flags, Seq("para_hash"), "left")
    joined.select(idOut, col("para_idx"),
        col("para_chars"), col("para_hash"),
        (col("para_chars") >= minParaChars &&
          coalesce(col("mk_"), lit(false))).as("maybe_known"))
  }

  /** SHARDED Bloom filters over a stored [[sentenceHashes]] table —
    * [[paragraphBloomShards]] one granularity down (the builders are
    * shape-compatible; this delegates through the column rename its
    * scaladoc prescribes). At sentence granularity the sharding is
    * mandatory, never optional: a 100 TB ingest stores 10-100× more
    * sentences than paragraphs. */
  def sentenceBloomShards(storedHashes: DataFrame, shards: Int,
      expectedItems: Long, fpp: Double = 0.01): DataFrame =
    paragraphBloomShards(
      storedHashes.select(col("sent_hash").as("para_hash")),
      shards, expectedItems, fpp)

  /** Probe a frame of 64-bit hashes against a SHARDED (shard,
    * bloom_bytes) table — the granularity-agnostic core of
    * [[flagMaybeKnownParagraphsSharded]]. The probe set (DISTINCT,
    * batch-scale — the caller owns that contract) is collected,
    * grouped by `pmod(hash, shards)`, and BROADCAST to a scan of the
    * filter table: each task probes its local sub-filter rows against
    * the broadcast hashes of that row's shard and emits the hits.
    * The filter table is scanned IN PLACE — the previous cogroup
    * formulation co-partitioned hashes WITH filters and therefore
    * shuffled the capacity-sized bloom table (~160 MB at the stores'
    * defaults, and growing one sub-filter per batch) through an
    * exchange on EVERY call, i.e. every micro-batch; now only the
    * batch-scale probe set and the batch-scale hit set move. A hash
    * is maybe-known iff ANY sub-filter row of its shard contains it —
    * the OR-merge's no-false-negative semantics without materializing
    * the merge (the bit-union merge could only ADD false positives
    * relative to this per-row probe);
    * rows of other shards are never probed, so the per-shard
    * fpp contract is unchanged, and a shard with no filter rows flags
    * nothing. Returns (hashCol, maybe_known); no false negatives.
    * EAGER (the probe set collects at call time) — BATCH frames only;
    * a streaming `hashes` frame is illegal here, exactly as it was
    * for the cogroup this replaces. */
  def flagMaybeKnownHashes(hashes: DataFrame, hashCol: String,
      shardBlooms: DataFrame, shards: Int): DataFrame = {
    val (hitsRaw, isLocal) =
      maybeKnownHashesImpl(hashes, hashCol, shardBlooms, shards)
    val hits = hitsRaw.withColumn("mk_", lit(true))
    // over-cap fallback hits are corpus-scale and distributed — a
    // forced broadcast there would rebuild exactly the driver-memory
    // hazard the cap exists to avoid
    val joined =
      if (isLocal) hashes.join(broadcast(hits), Seq(hashCol), "left")
      else hashes.join(hits, Seq(hashCol), "left")
    joined.select(col(hashCol),
      coalesce(col("mk_"), lit(false)).as("maybe_known"))
  }

  /** The scan-probe's HIT SET alone, as a LOCAL relation of the
    * maybe-known hashes — what the per-batch ingest paths consume
    * directly: [[flagMaybeKnownHashes]]' flag view joins back through
    * the caller's `hashes` lineage, so filtering it for the maybes
    * would re-execute the batch-distinct shuffle a second time per
    * micro-batch. Eager end to end (probe set collected + broadcast,
    * hit set collected back, broadcast destroyed before returning —
    * a per-batch broadcast leaked to the ContextCleaner otherwise);
    * batch frames only.
    *
    * GUARDED against batch-scale turning out to be corpus-scale (the
    * first micro-batch of an un-rate-limited stream commonly carries
    * the whole source backlog): the collect is bounded at
    * [[MaxProbeCollect]] rows via a CollectLimit — which stops pulling
    * partitions once the cap is crossed — and an over-cap probe set
    * falls back to the DISTRIBUTED co-grouped probe (the pre-scan-probe
    * topology: hashes and filters co-partitioned on the shard key, so
    * the filter table shuffles once but nothing touches the driver).
    * Over the cap the returned hits are therefore a distributed frame,
    * not a local relation — degradation flows through the cluster, not
    * through driver memory. */
  def maybeKnownHashes(hashes: DataFrame, hashCol: String,
      shardBlooms: DataFrame, shards: Int): DataFrame =
    maybeKnownHashesImpl(hashes, hashCol, shardBlooms, shards)._1

  // (hits, isLocal): isLocal=false signals the over-cap distributed
  // fallback, whose hits must NOT be force-broadcast by callers
  private def maybeKnownHashesImpl(hashes: DataFrame, hashCol: String,
      shardBlooms: DataFrame, shards: Int): (DataFrame, Boolean) = {
    require(shards > 0, "shards must be positive")
    val spark = hashes.sparkSession
    import spark.implicits._
    val all: Array[Long] = hashes.select(col(hashCol))
      .limit(MaxProbeCollect + 1).as[Long].collect()
    if (all.length > MaxProbeCollect)
      return (maybeKnownHashesDistributed(hashes, hashCol, shardBlooms,
        shards), false)
    if (all.isEmpty) // empty batch: nothing can hit —
      // skip the (linear-in-sub-filters) scan entirely
      return (spark.createDataset(Seq.empty[Long]).toDF(hashCol), true)
    // primitive two-pass shard grouping: a per-shard ArrayBuffer[Long]
    // boxes every element (~3× the footprint at the cap)
    def shardOf(h: Long): Int = (((h % shards) + shards) % shards).toInt
    val counts = new Array[Int](shards)
    all.foreach(h => counts(shardOf(h)) += 1)
    val byShard = Array.tabulate(shards)(s => new Array[Long](counts(s)))
    val pos = new Array[Int](shards)
    all.foreach { h =>
      val s = shardOf(h); byShard(s)(pos(s)) = h; pos(s) += 1
    }
    val bc = spark.sparkContext.broadcast(byShard)
    try {
      val hits = shardBlooms
        .select(col("shard").cast("int"), col("bloom_bytes"))
        .as[(Int, Array[Byte])]
        .mapPartitions { rows =>
          val probes = bc.value
          rows.flatMap { case (s, bytes) =>
            if (s < 0 || s >= probes.length || probes(s).isEmpty)
              Iterator.empty
            else {
              val bloom = org.apache.spark.util.sketch.BloomFilter
                .readFrom(new java.io.ByteArrayInputStream(bytes))
              probes(s).iterator.filter(bloom.mightContainLong)
            }
          }
        }.collect().distinct
      (spark.createDataset(hits.toIndexedSeq).toDF(hashCol), true)
    } finally bc.destroy()
  }

  // The over-cap distributed probe: the scan-probe's predecessor
  // topology, kept as the graceful-degradation path. Hashes and
  // filters co-group on the shard key, each task OR-merges ONE shard's
  // sub-filter rows and streams that shard's hashes through it — the
  // capacity-sized filter table crosses an exchange (the cost the
  // scan-probe avoids in the common regime), but nothing
  // corpus-proportional is collected or broadcast. SEMANTICS: no
  // false negatives, but the bit-UNION merge can flag a hash no
  // single sub-filter held (its k positions split across rows), so
  // the maybe set is an fpp-bounded SUPERSET of the in-cap per-row
  // scan's — the exact confirm downstream erases the difference
  // (spec-pinned). The hits are pinned (lazy localCheckpoint): the
  // confirm's limit-probe and its semi-join both consume them, and
  // without the pin the cogroup would shuffle the filter table twice
  // per batch.
  private def maybeKnownHashesDistributed(hashes: DataFrame,
      hashCol: String, shardBlooms: DataFrame, shards: Int): DataFrame = {
    val spark = hashes.sparkSession
    import spark.implicits._
    val rows = hashes
      .select(col(hashCol),
        pmod(col(hashCol), lit(shards)).cast("int").as("shard_"))
      .as[(Long, Int)]
      .groupByKey(_._2)
    val blooms = shardBlooms
      .select(col("shard").cast("int"), col("bloom_bytes"))
      .as[(Int, Array[Byte])]
      .groupByKey(_._1)
    rows.cogroup(blooms) { (_, rs, bs) =>
      val bloom = mergeFilterRows(bs.map(_._2))
      rs.collect { case (h, _)
        if bloom.exists(_.mightContainLong(h)) => h }
    }.toDF(hashCol).distinct().localCheckpoint(false)
  }

  /** Exact membership confirm of a batch-scale `maybe` key set (one
    * `keyCol` column, e.g. the sharded-Bloom front's flagged MAYBEs
    * or the URL store's batch canonicals) against a stored narrow
    * table (pre-filtered, projected to `keyCol`): returns the
    * DISTINCT confirmed subset. The maybe set is batch-scale by the
    * caller's contract (it was broadcast before), so collect it ONCE
    * and confirm via a PUSHABLE chunked IN predicate on the stored
    * scan instead of a semi-join: over a key-SORTED base build
    * ([[graft.streaming.StorePaths.CompactTable]] `sortCol`) parquet
    * min/max row-group stats then prune everything outside the probe
    * set — the per-batch read stops being O(index). The confirm runs
    * EAGERLY so the raised IN-pushdown threshold (default 10 would
    * degrade a large IN to a useless min/max RANGE over random
    * hashes) is scoped to this one scan, and is serialized through a
    * JVM-wide lock so concurrent stores on ONE session cannot race a
    * restore into another confirm's planning window (the raise
    * direction is harmless to bystander queries; a mid-planning
    * restore would silently degrade a sibling probe to the range
    * push). The confirmed set (≤ maybe, batch-scale) re-enters the
    * plan as a local relation. Degenerate regimes, in order: above
    * the PUSHDOWN cap (16k) a broadcast semi-join builds on the
    * ALREADY COLLECTED set — never re-executing the maybe lineage
    * (the bloom probe would otherwise run twice per batch in exactly
    * the heavy regime) — stored side scanned, never shuffled; above
    * the COLLECT cap (4M, see [[MaxProbeCollect]]) nothing is
    * collected at all and a distributed semi-join takes over — there
    * the maybe lineage DOES re-execute once for the join (pinned with
    * a lazy localCheckpoint so it is the last run), the price of not
    * holding a corpus-scale set on the driver. */
  private def confirmKnownKeys[T](stored: DataFrame, keyCol: String,
      maybe: DataFrame)(
      implicit enc: org.apache.spark.sql.Encoder[T]): DataFrame =
    confirmKnownKeysImpl(stored, keyCol, maybe)(enc)._1

  // (confirmed, isLocal): isLocal=false signals the over-collect-cap
  // distributed fallback — a corpus-scale frame callers must NOT
  // force-broadcast (the maybeKnownHashesImpl convention)
  private def confirmKnownKeysImpl[T](stored: DataFrame, keyCol: String,
      maybe: DataFrame)(
      implicit enc: org.apache.spark.sql.Encoder[T])
      : (DataFrame, Boolean) = {
    val spark = stored.sparkSession
    // bounded collect (see maybeKnownHashes): an over-cap maybe set —
    // the whole-backlog first batch of an un-rate-limited stream —
    // degrades to a distributed semi-join instead of OOMing the
    // driver. The maybe lineage necessarily re-executes once for the
    // join (the limit-probe only ran it partially); the lazy
    // localCheckpoint pins THAT execution so downstream consumers of
    // the confirmed frame cannot run the whole probe chain again.
    val maybeArr = maybe.limit(MaxProbeCollect + 1).as[T].collect()
    if (maybeArr.length > MaxProbeCollect)
      return (stored
        .join(maybe.distinct().localCheckpoint(false), Seq(keyCol),
          "left_semi")
        .select(col(keyCol)).distinct(), false)
    val maybeLocal = spark.createDataset(maybeArr.toIndexedSeq)
      .toDF(keyCol)
    if (maybeArr.isEmpty) (maybeLocal, true)
    else if (maybeArr.length <= MaxProbePushdown) {
      val confirmed = confirmLock(spark).synchronized {
        withSessionConf(spark,
          "spark.sql.parquet.pushdown.inFilterThreshold",
          ProbePushdownChunk.toString) {
          stored
            .where(chunkedIn(col(keyCol), maybeArr.toIndexedSeq))
            .select(col(keyCol)).distinct()
            .as[T].collect()
        }
      }
      (spark.createDataset(confirmed.toIndexedSeq).toDF(keyCol), true)
    } else
      (stored
        .join(broadcast(maybeLocal), Seq(keyCol), "left_semi")
        .select(col(keyCol)).distinct(), true)
  }

  private def confirmKnownHashes(stored: DataFrame, hashCol: String,
      maybe: DataFrame): DataFrame =
    confirmKnownKeys(stored, hashCol, maybe)(
      org.apache.spark.sql.Encoders.scalaLong)

  /** Fetch the FULL ROWS of `stored` whose `keyCol` is in the
    * batch-scale `keys` set — the row-fetch sibling of
    * [[confirmKnownKeys]] for consumers that need the stored payload,
    * not just membership (e.g. the corpus-index verify side's
    * shingle-set rows). Key type is whatever `keys`' single column
    * holds. Small key sets take the pruned chunked-IN scan; because
    * the fetched rows are too fat to collect, the scan is pinned with
    * an EAGER `localCheckpoint` INSIDE the conf-raised window (a
    * lazily returned frame would re-plan under the restored threshold
    * when composed downstream, silently degrading the IN to the
    * useless range push). Bounded: ≤ cap ROWS per call WHEN `keyCol`
    * is unique in `stored` (the doc-table contract — one row per
    * corpus id); a multi-row-per-key table would materialize every
    * matching row, so state-check that before reusing this for one.
    * The checkpointing scan runs INSIDE the shared conf lock, so
    * concurrent stores on one session serialize behind it — the
    * fetch is candidate-scale (sub-second at sane batch sizes), and
    * the alternative (a cloned session per call) costs more than it
    * saves. Above the cap: a left-semi join against the
    * already-collected local key set — stored scanned, never
    * shuffled. */
  private[graft] def fetchByKeys(stored: DataFrame, keyCol: String,
      keys: DataFrame): DataFrame = {
    val spark = stored.sparkSession
    // bounded collect (see maybeKnownHashes): over-cap key sets take a
    // distributed semi-join — stored scanned, keys shuffled, driver
    // untouched
    val keyArr: IndexedSeq[Any] = keys.select(col(keyCol)).distinct()
      .limit(MaxProbeCollect + 1)
      .collect().map(_.get(0)).toIndexedSeq
    if (keyArr.length > MaxProbeCollect)
      // the keys lineage re-executes once for the join (the
      // limit-probe ran it partially); pin that run so downstream
      // consumers of the fetched rows don't trigger another
      return stored.join(
        keys.select(col(keyCol)).distinct().localCheckpoint(false),
        Seq(keyCol), "left_semi")
    if (keyArr.isEmpty) stored.limit(0)
    else if (keyArr.length <= MaxProbePushdown)
      confirmLock(spark).synchronized {
        withSessionConf(spark,
          "spark.sql.parquet.pushdown.inFilterThreshold",
          ProbePushdownChunk.toString) {
          stored.where(chunkedIn(col(keyCol), keyArr))
            .localCheckpoint(true)
        }
      }
    else {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        keys.select(col(keyCol)).schema.head))
      val local = spark.createDataFrame(
        java.util.Arrays.asList(keyArr.map(
          v => org.apache.spark.sql.Row(v)): _*), schema)
      stored.join(broadcast(local), Seq(keyCol), "left_semi")
    }
  }

  /** [[confirmKnownKeys]] over STRING keys — the URL store's
    * canonical-url membership. */
  private[graft] def confirmKnownStrings(stored: DataFrame,
      keyCol: String, maybe: DataFrame): DataFrame =
    confirmKnownKeys(stored, keyCol, maybe)(
      org.apache.spark.sql.Encoders.STRING)

  /** [[confirmKnownStrings]] exposing the (confirmed, isLocal) pair —
    * for callers that broadcast the confirmed set into a downstream
    * join and must NOT when the over-cap fallback made it a
    * corpus-scale distributed frame (UrlIndexStore's per-batch
    * membership anti-join). */
  private[graft] def confirmKnownStringsImpl(stored: DataFrame,
      keyCol: String, maybe: DataFrame): (DataFrame, Boolean) =
    confirmKnownKeysImpl(stored, keyCol, maybe)(
      org.apache.spark.sql.Encoders.STRING)

  // Serializes the conf-raised confirm windows across threads — see
  // confirmKnownKeys. PER SparkSession (the overridden conf is
  // session-scoped, so two stores on DIFFERENT sessions have nothing
  // to race on and should not serialize behind each other's scans);
  // keyed weakly so a lock entry cannot pin a closed session. Within
  // one session the whole eager scan stays inside the critical
  // section — planning happens at execution, so the raised threshold
  // must be live for the scan's entire lifetime. Known residual: a
  // USER change of the same conf on that session during the window is
  // restored over (documented; the raise direction is harmless to
  // bystander queries).
  private val confirmLocks =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Object])
  private def confirmLock(spark: SparkSession): Object =
    confirmLocks.synchronized {
      val cur = confirmLocks.get(spark)
      if (cur != null) cur
      else { val o = new Object; confirmLocks.put(spark, o); o }
    }

  /** Probe-set ceiling for the pushable-IN exact-confirm path. Probes
    * are CHUNKED into `ProbePushdownChunk`-sized INs combined with an
    * OR, because parquet-mr evaluates a pushed IN as a LEFT-DEEP
    * or-chain recursively — several stack frames per term, so even
    * ~2k terms in ONE In overflow a default executor thread stack
    * (measured twice: StackOverflowError in the row-group stats
    * visitor at ~10k and again at ~2k). Chunking bounds the recursion
    * at ~(#chunks + chunk) frames regardless of probe count, while
    * each chunk evaluates post-scan as an O(1) InSet. The overall cap
    * bounds the row-group/page statistics evaluation cost (the whole
    * predicate tree is visited per row group) and the Catalyst plan
    * size; beyond it the confirm falls back to the broadcast
    * semi-join full scan. At the stores' default 1% bloom fpp the
    * maybe set is ~0.01 × batch-distinct + true duplicates, so
    * batches up to ~1M distinct new units stay under the cap (drop
    * the fpp to widen it). */
  private val MaxProbePushdown: Int = 16384
  private val ProbePushdownChunk: Int = 256

  /** Driver-side ceiling for the per-batch probe/key/maybe collects
    * ([[maybeKnownHashes]], `confirmKnownKeys`, [[fetchByKeys]]).
    * "Batch-scale" is a caller contract, but the first micro-batch of
    * an un-rate-limited stream commonly carries the WHOLE source
    * backlog — corpus-scale — and an unconditional collect is then a
    * driver OOM. The collects are bounded with a CollectLimit (which
    * stops pulling partitions once the cap is crossed); over the cap
    * each path degrades to its distributed predecessor topology
    * (co-grouped bloom probe / shuffle semi-join) — slower per batch,
    * but it flows through the cluster, never the driver. 4M longs is
    * 32 MB primitive on the driver plus the same broadcast — modest
    * against default driver heaps, far above any sanely rate-limited
    * batch (set `maxOffsetsPerTrigger`/`maxFilesPerTrigger` on ingest
    * sources regardless: the cap is a guard rail, not a license).
    * `var` ONLY so the spec can lower it and exercise the over-cap
    * fallbacks at test scale — production code must not write it. */
  private[graft] var MaxProbeCollect: Int = 4 << 20

  // the chunked pushable membership predicate: OR of ≤chunk-sized INs
  private def chunkedIn(key: Column, values: Seq[Any]): Column =
    values.grouped(ProbePushdownChunk)
      .map(c => key.isInCollection(c))
      .reduce(_ || _)

  // run `body` with one session conf temporarily overridden —
  // restored (or unset) in a finally, so the override cannot leak
  // into queries planned after the eager confirm scan
  private def withSessionConf[A](spark: SparkSession, key: String,
      value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** CCNet-style unigram language-model score: train a unigram LM on
    * the corpus itself (count / total), then score each document by
    * its total log2 probability and bits-per-token — the standard
    * perplexity-ish quality signal for corpus filtering.
    *
    * Per-TERM log-probs quantize to integer micros before the per-doc
    * sum (`sum(tf · micro_w)` over bigints), so document scores are
    * exactly reproducible across engines and partitionings — no
    * float-summation-order dependence. Returns (idCol, n_tokens,
    * logprob_micro, bits_per_token).
    *
    * Scale shape: same as TF-IDF — one explode, two map-side-combined
    * groupBys (doc-term TF, term vocabulary), a hash join on term, and
    * a broadcast one-row total. */
  def unigramLogProb(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    requireFresh(df, "toks_")
    unigramLogProbFromTokens(
      df.withColumn("toks_", TextAnalysis.tokens(lower(col(textCol)))),
      "toks_", idCol)
  }

  /** [[unigramLogProb]] over a pre-tokenized (lowercased) frame — see
    * [[tfIdfTopTermsFromTokens]] for the stored-artifact rationale. */
  def unigramLogProbFromTokens(df: DataFrame, toksCol: String,
      idCol: String): DataFrame = {
    requireFresh(df.drop(toksCol), "dl_", "micro_")
    val terms = df
      .select(col(idCol), size(col(toksCol)).as("dl_"),
        explode(col(toksCol)).as("term"))
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(first(col("dl_")).as("dl_"), count(lit(1)).as("tf"))
    // NO barrier on tf despite two consumers (vocabulary + per-doc
    // join): tf ends in an Exchange, and AQE's shuffle-stage cache
    // dedupes canonically-equal exchanges at runtime — measured: ONE
    // explode map stage executes for both branches even though the
    // plan string prints the subtree twice. A checkpoint here would
    // pin a corpus-token-scale table in executor memory (measured
    // OOM at 1M docs). The dedupLines-style trap only bites NARROW
    // shared subtrees with no exchange boundary to reuse.
    val vocab = tf.groupBy(col("term")).agg(sum(col("tf")).as("c_"))
    val total = vocab.select(sum(col("c_")).as("t_"))
    val scoredTerms = vocab.crossJoin(broadcast(total))
      .withColumn("micro_",
        round(log2(col("c_").cast("double") / col("t_")) * 1e6)
          .cast("long"))
      .select(col("term"), col("micro_"))
    tf.join(scoredTerms, "term")
      .groupBy(col(idCol))
      .agg(first(col("dl_")).as("n_tokens"),
        sum(col("tf") * col("micro_")).as("logprob_micro"))
      .select(col(idCol), col("n_tokens").cast("long").as("n_tokens"),
        col("logprob_micro"),
        round(-col("logprob_micro") /
          (col("n_tokens") * lit(1e6)), 6).as("bits_per_token"))
  }

  /** Interpolated bigram LM scoring — the distributed core of a
    * CCNet/KenLM-style perplexity filter: every in-document bigram
    * (v, w) scores `log2(λ·c(v,w)/c(v) + (1−λ)·c(w)/T)` against the
    * corpus' own counts, summed per document in exact integer micros
    * (order-independent, like [[unigramLogProb]]). Returns (idCol,
    * n_pairs, logprob_micro, bits_per_pair); documents shorter than 2
    * tokens get 0 pairs and null bits. High bits_per_pair = the
    * document's word transitions are improbable under the corpus LM —
    * the standard gibberish/boilerplate signal.
    *
    * Scale shape: bigrams come from zipping each token array with its
    * own tail — a pure row expression, no window, ONE explode; then
    * two map-side-combined counts (bigram, context), the q88-style
    * vocabulary join (hash join at vocabulary scale, AQE broadcasts
    * when small), and a broadcast 1-row total. */
  def bigramLogProb(df: DataFrame, textCol: String, idCol: String,
      lambda: Double = 0.9): DataFrame = {
    requireFresh(df, "toks_")
    bigramLogProbFromTokens(
      df.withColumn("toks_", TextAnalysis.tokens(lower(col(textCol)))),
      "toks_", idCol, lambda)
  }

  /** [[bigramLogProb]] over a pre-tokenized (lowercased) frame — see
    * [[tfIdfTopTermsFromTokens]] for the stored-artifact rationale. */
  def bigramLogProbFromTokens(df: DataFrame, toksCol: String,
      idCol: String, lambda: Double = 0.9): DataFrame = {
    require(lambda > 0 && lambda < 1, "lambda in (0,1)")
    requireFresh(df.drop(toksCol), "pv_", "wv_", "bg_", "prev_",
      "term_", "micro_", "np_")
    // two token consumers with DIFFERENT downstream exchanges (bigram
    // pairs, unigram vocabulary) — the inline-tokenize convenience
    // form re-tokenizes once per consumer. Deliberately NOT
    // checkpointed: on the stored-artifact FromTokens path (the
    // 100 TB shape) the second consumer is a cheap parquet re-scan,
    // and a barrier would pin a corpus-token-scale table instead
    val toks = df
    val n = size(col(toksCol))
    val pairRows = toks
      .withColumn("pv_", slice(col(toksCol), lit(1),
        greatest(n - 1, lit(0))))
      .withColumn("wv_", slice(col(toksCol), lit(2),
        greatest(n - 1, lit(0))))
      .select(col(idCol), explode(arrays_zip(col("pv_"), col("wv_")))
        .as("bg_"))
      .select(col(idCol), col("bg_.pv_").as("prev_"),
        col("bg_.wv_").as("term_"))
    // per-doc bigram term frequencies; distinct-bigram corpus
    // counts. No barrier on tf2 (two consumers): AQE's stage cache
    // reuses its shuffle across both branches (measured — see
    // unigramLogProbFromTokens), and a checkpoint pins a pairs-scale
    // table (measured OOM at 1M docs)
    val tf2 = pairRows.groupBy(col(idCol), col("prev_"), col("term_"))
      .agg(count(lit(1)).as("tf2"))
    val bc = tf2.groupBy(col("prev_"), col("term_"))
      .agg(sum(col("tf2")).as("c2"))
    val ctx = bc.groupBy(col("prev_")).agg(sum(col("c2")).as("cv"))
    // unigram vocabulary over ALL positions + corpus total (q88 shape)
    val uni = toks.select(explode(col(toksCol)).as("term_"))
      .groupBy(col("term_")).agg(count(lit(1)).as("cw"))
    val total = uni.select(sum(col("cw")).as("t_"))
    val scored = bc.join(ctx, "prev_").join(uni, "term_")
      .crossJoin(broadcast(total))
      .withColumn("micro_",
        round(log2(lit(lambda) * (col("c2").cast("double") / col("cv")) +
          lit(1.0 - lambda) * (col("cw").cast("double") / col("t_")))
          * 1e6).cast("long"))
      .select(col("prev_"), col("term_"), col("micro_"))
    val perDoc = tf2.join(scored, Seq("prev_", "term_"))
      .groupBy(col(idCol))
      .agg(sum(col("tf2")).as("np_"),
        sum(col("tf2") * col("micro_")).as("lp_"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("np_"), lit(0L)).cast("long").as("n_pairs"),
        coalesce(col("lp_"), lit(0L)).cast("long").as("logprob_micro"),
        when(col("np_").isNotNull,
          round(-col("lp_") / (col("np_") * lit(1e6)), 6))
          .as("bits_per_pair"))
  }

  /** Interpolated KNESER-NEY bigram scoring — the smoothing the
    * production perplexity filters actually run (CCNet's KenLM):
    * instead of mixing in raw unigram frequency ([[bigramLogProb]]'s
    * add-λ interpolation), the backoff weight is the CONTINUATION
    * probability (how many distinct contexts a word follows), with an
    * absolute discount D = n1/(n1+2·n2) estimated from the corpus'
    * own count-of-counts:
    *
    *   P(w|v) = (max(c(vw) − D, 0) + D · N1+(v·) · N1+(·w)/B) / c(v·)
    *
    * where N1+(v·) = distinct continuations of v, N1+(·w) = distinct
    * contexts of w, B = distinct bigrams. Every quantity is one
    * map-side-combined groupBy over the DISTINCT-BIGRAM table (the
    * corpus-scale tables join on their keys — nothing broadcast
    * except the 1-row D/B aggregate); per-pair scores quantize to
    * integer micro-log2 before the per-doc sum (q103's determinism
    * contract — the double arithmetic is written in the same
    * operation order as the SQL oracle, so micros match bit-for-bit).
    * Scores observed bigrams (the q103 scope). Returns (idCol,
    * n_pairs, logprob_micro, bits_per_pair). */
  def knBigramLogProb(df: DataFrame, textCol: String,
      idCol: String): DataFrame =
    knBigramLogProbFromTokens(
      df.select(col(idCol),
        TextAnalysis.tokens(lower(col(textCol))).as("toks_")),
      "toks_", idCol)

  /** [[knBigramLogProb]] over a pre-tokenized frame (the stored
    * tokenization artifact, like every `*FromTokens`). */
  def knBigramLogProbFromTokens(df: DataFrame, toksCol: String,
      idCol: String): DataFrame = {
    requireFresh(df.drop(toksCol), "pv_", "wv_", "bg_", "prev_",
      "term_", "micro_", "np_")
    val n = size(col(toksCol))
    val pairRows = df
      .withColumn("pv_", slice(col(toksCol), lit(1),
        greatest(n - 1, lit(0))))
      .withColumn("wv_", slice(col(toksCol), lit(2),
        greatest(n - 1, lit(0))))
      .select(col(idCol), explode(arrays_zip(col("pv_"), col("wv_")))
        .as("bg_"))
      .select(col(idCol), col("bg_.pv_").as("prev_"),
        col("bg_.wv_").as("term_"))
    // no barrier on tf2 (two consumers): AQE's stage cache reuses
    // the shuffle, so the pair explode runs once (measured: one
    // 34 MB map stage for both consumers at 200k docs); a
    // checkpoint pins a pairs-scale table (measured 1M-doc OOM)
    val tf2 = pairRows.groupBy(col(idCol), col("prev_"), col("term_"))
      .agg(count(lit(1)).as("tf2"))
    val bc = tf2.groupBy(col("prev_"), col("term_"))
      .agg(sum(col("tf2")).as("c2"))
      .localCheckpoint(false) // five consumers below
    val ctx = bc.groupBy(col("prev_"))
      .agg(sum(col("c2")).as("cv"),
        count(lit(1)).as("n1v")) // N1+(v·): distinct continuations
    val cont = bc.groupBy(col("term_"))
      .agg(count(lit(1)).as("n1w")) // N1+(·w): distinct contexts
    // global: distinct-bigram total + count-of-counts discount
    val glob = bc.agg(
        count(lit(1)).cast("double").as("bb_"),
        sum(when(col("c2") === 1, 1L).otherwise(0L)).as("nn1_"),
        sum(when(col("c2") === 2, 1L).otherwise(0L)).as("nn2_"))
      .select(col("bb_"),
        // degenerate corpora (no count-1/2 bigrams) fall back to the
        // conventional D = 0.5 — mirrored in the oracle CASE
        when(col("nn1_") + lit(2L) * col("nn2_") === 0L, lit(0.5))
          .otherwise(col("nn1_").cast("double") /
            (col("nn1_") + lit(2L) * col("nn2_")).cast("double"))
          .as("dd_"))
    val scored = bc.join(ctx, "prev_").join(cont, "term_")
      .crossJoin(broadcast(glob))
      .withColumn("micro_",
        round(log2(
          (greatest(col("c2").cast("double") - col("dd_"), lit(0.0)) +
            col("dd_") * col("n1v").cast("double") *
              (col("n1w").cast("double") / col("bb_"))) /
            col("cv").cast("double")) * 1e6).cast("long"))
      .select(col("prev_"), col("term_"), col("micro_"))
    val perDoc = tf2.join(scored, Seq("prev_", "term_"))
      .groupBy(col(idCol))
      .agg(sum(col("tf2")).as("np_"),
        sum(col("tf2") * col("micro_")).as("lp_"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("np_"), lit(0L)).cast("long").as("n_pairs"),
        coalesce(col("lp_"), lit(0L)).cast("long").as("logprob_micro"),
        when(col("np_").isNotNull,
          round(-col("lp_") / (col("np_") * lit(1e6)), 6))
          .as("bits_per_pair"))
  }

  /** TRIGRAM Kneser-Ney — [[knBigramLogProb]] with the proper
    * recursive backoff (Chen & Goodman 1998): the highest order uses
    * raw counts, the bigram level uses CONTINUATION counts
    * ĉ(vw) = N1+(·vw) (how many distinct contexts the bigram
    * completes — the "novel continuation" estimate), each with its
    * own count-of-counts discount:
    *
    *   P3(w|uv) = (max(c(uvw)−D3, 0) + D3·N1+(uv·)·P2(w|v)) / c(uv·)
    *   P2(w|v)  = (max(ĉ(vw)−D2, 0) + D2·N1c(v·)·(N1c(·w)/B̂)) / ĉ(v·)
    *
    * with N1c/B̂ counted over the continuation-bigram space. Every
    * quantity is a map-side-combined groupBy over the distinct
    * trigram/bigram tables; only the 1-row (D3, D2, B̂) global
    * broadcasts. Scores observed trigrams (every referenced
    * denominator is ≥ 1 by construction: the trigram's own existence
    * puts mass in each table). Double arithmetic is written in the
    * same operation order as the SQL oracle — micro-log2 scores match
    * bit-for-bit. Returns (idCol, n_triples, logprob_micro,
    * bits_per_triple). */
  def knTrigramLogProb(df: DataFrame, textCol: String,
      idCol: String): DataFrame =
    knTrigramLogProbFromTokens(
      df.select(col(idCol),
        TextAnalysis.tokens(lower(col(textCol))).as("toks_")),
      "toks_", idCol)

  /** [[knTrigramLogProb]] over a pre-tokenized frame. */
  def knTrigramLogProbFromTokens(df: DataFrame, toksCol: String,
      idCol: String): DataFrame = {
    requireFresh(df.drop(toksCol), "u_", "v_", "w_", "tg_", "micro_",
      "np_")
    val n = size(col(toksCol))
    val tripleRows = df
      .withColumn("uv_", slice(col(toksCol), lit(1),
        greatest(n - 2, lit(0))))
      .withColumn("vv_", slice(col(toksCol), lit(2),
        greatest(n - 2, lit(0))))
      .withColumn("wv_", slice(col(toksCol), lit(3),
        greatest(n - 2, lit(0))))
      .select(col(idCol), explode(arrays_zip(col("uv_"), col("vv_"),
        col("wv_"))).as("tg_"))
      .select(col(idCol), col("tg_.uv_").as("u_"),
        col("tg_.vv_").as("v_"), col("tg_.wv_").as("w_"))
    // no barrier on tf3 (two consumers): AQE's stage cache dedupes
    // its shuffle — the triple explode runs once either way
    // (measured on the bigram twin)
    val tf3 = tripleRows.groupBy(col(idCol), col("u_"), col("v_"),
        col("w_"))
      .agg(count(lit(1)).as("tf3"))
    // distinct trigrams with counts — everything derives from this
    val tc = tf3.groupBy(col("u_"), col("v_"), col("w_"))
      .agg(sum(col("tf3")).as("c3"))
      .localCheckpoint(false)
    val ctx3 = tc.groupBy(col("u_"), col("v_"))
      .agg(sum(col("c3")).as("cuv"), count(lit(1)).as("n1uv"))
    // continuation bigram table: ĉ(vw) = distinct u per (v, w)
    val cb = tc.groupBy(col("v_"), col("w_"))
      .agg(count(lit(1)).as("chat"))
      .localCheckpoint(false)
    val ctx2 = cb.groupBy(col("v_"))
      .agg(sum(col("chat")).as("chv"), count(lit(1)).as("n1cv"))
    val cont2 = cb.groupBy(col("w_")).agg(count(lit(1)).as("n1cw"))
    val glob3 = tc.agg(
        sum(when(col("c3") === 1, 1L).otherwise(0L)).as("a1_"),
        sum(when(col("c3") === 2, 1L).otherwise(0L)).as("a2_"))
      .select(when(col("a1_") + lit(2L) * col("a2_") === 0L, lit(0.5))
        .otherwise(col("a1_").cast("double") /
          (col("a1_") + lit(2L) * col("a2_")).cast("double"))
        .as("d3_"))
    val glob2 = cb.agg(
        count(lit(1)).cast("double").as("bhat_"),
        sum(when(col("chat") === 1, 1L).otherwise(0L)).as("b1_"),
        sum(when(col("chat") === 2, 1L).otherwise(0L)).as("b2_"))
      .select(col("bhat_"),
        when(col("b1_") + lit(2L) * col("b2_") === 0L, lit(0.5))
          .otherwise(col("b1_").cast("double") /
            (col("b1_") + lit(2L) * col("b2_")).cast("double"))
          .as("d2_"))
    val scored = tc
      .join(ctx3, Seq("u_", "v_"))
      .join(cb, Seq("v_", "w_"))
      .join(ctx2, Seq("v_"))
      .join(cont2, Seq("w_"))
      .crossJoin(broadcast(glob3)).crossJoin(broadcast(glob2))
      .withColumn("p2_",
        (greatest(col("chat").cast("double") - col("d2_"), lit(0.0)) +
          col("d2_") * col("n1cv").cast("double") *
            (col("n1cw").cast("double") / col("bhat_"))) /
          col("chv").cast("double"))
      .withColumn("micro_",
        round(log2(
          (greatest(col("c3").cast("double") - col("d3_"), lit(0.0)) +
            col("d3_") * col("n1uv").cast("double") * col("p2_")) /
            col("cuv").cast("double")) * 1e6).cast("long"))
      .select(col("u_"), col("v_"), col("w_"), col("micro_"))
    val perDoc = tf3.join(scored, Seq("u_", "v_", "w_"))
      .groupBy(col(idCol))
      .agg(sum(col("tf3")).as("np_"),
        sum(col("tf3") * col("micro_")).as("lp_"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("np_"), lit(0L)).cast("long").as("n_triples"),
        coalesce(col("lp_"), lit(0L)).cast("long").as("logprob_micro"),
        when(col("np_").isNotNull,
          round(-col("lp_") / (col("np_") * lit(1e6)), 6))
          .as("bits_per_triple"))
  }

  /** Okapi BM25 retrieval score of every corpus document against a
    * probe/query set — the ranking primitive for description-driven
    * curation ("keep documents matching this domain sketch") and a
    * sharper complement to [[decontaminate]]'s binary k-gram overlap.
    * Score = Σ over shared terms of
    * `ln((N − df + 0.5)/(df + 0.5) + 1) · tf·(k1+1)/(tf + k1·(1 − b +
    * b·dl/avgdl))` (the Lucene always-positive idf form); per-term
    * scores quantize to integer micros before the per-doc sum, so the
    * result is summation-order independent and cross-engine exact.
    * Returns one row per corpus document: (idCol, n_matched,
    * bm25_micro).
    *
    * Scale shape: the probe side is query-scale, so its distinct term
    * set broadcasts and corpus tokens are filtered map-side BEFORE the
    * (doc, term) shuffle — only matching rows ever shuffle (the
    * decontaminate plan, plus scoring). Document frequency of a query
    * term derives from those same matched rows (df = #docs containing
    * the term), never from a full-vocabulary aggregation; N and the
    * average document length come from one column-pruned count/sum
    * pass, exact-integer so both engines divide the same values. */
  /** Every working and output name the BM25 pair of operators can
    * inject — an `idCol`/`queryIdCol` equal to one of these would be
    * silently replaced (e.g. by the final `rank` withColumn) or die
    * with an ambiguous-reference error far from the cause. */
  private val bm25Reserved = Seq("toks_", "dl_", "term", "micro_",
    "qid_", "tf", "df_", "n_", "sdl_", "bm_", "n_matched",
    "bm25_micro", "rank", "query_id")

  /** Shared BM25 front half: (matched per-(doc, term) frequencies,
    * per-term document frequency, corpus stats). The union of probe
    * terms filters corpus tokens map-side before the only token-scale
    * shuffle; the matched frame materializes once (it feeds df and
    * scoring); N/avgdl are exact long count/sum from one pruned pass
    * so both engines' doubles divide identical integers. */
  private def bm25Matched(corpus: DataFrame, probeTerms: DataFrame,
      textCol: String, idCol: String)
      : (DataFrame, DataFrame, DataFrame) =
    bm25MatchedFromTokens(
      corpus.select(col(idCol),
        TextAnalysis.tokens(lower(col(textCol))).as("toks_")),
      "toks_", probeTerms, idCol)

  private def bm25MatchedFromTokens(corpus: DataFrame, toksCol: String,
      probeTerms: DataFrame, idCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val toks = corpus
      .select(col(idCol), size(col(toksCol)).cast("long").as("dl_"),
        explode(col(toksCol)).as("term"))
    val stats = corpus
      .select(size(col(toksCol)).cast("long").as("dl_"))
      .agg(count(lit(1)).as("n_"), sum(col("dl_")).as("sdl_"))
    val tfDoc = toks.join(broadcast(probeTerms), "term")
      .groupBy(col(idCol), col("term"))
      .agg(first(col("dl_")).as("dl_"), count(lit(1)).as("tf"))
      .localCheckpoint(false)
    // (doc, term) rows are already distinct -> df is a direct count
    val dfreq = tfDoc.groupBy(col("term")).agg(count(lit(1)).as("df_"))
    (tfDoc, dfreq, stats)
  }

  /** The per-term integer-micro BM25 score over a frame carrying
    * (tf, dl_, df_, n_, sdl_) — ONE definition so [[bm25Score]] and
    * [[bm25TopK]] can never drift on the arithmetic or its operation
    * order (which the DuckDB oracles replay expression-for-
    * expression). */
  private def bm25Micro(k1: Double, b: Double): Column = {
    val avgdl = col("sdl_").cast("double") / col("n_")
    round(
      log((col("n_") - col("df_") + 0.5) / (col("df_") + 0.5) + 1.0) *
        (col("tf") * lit(k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) +
          lit(b) * col("dl_") / avgdl)) * 1e6).cast("long")
  }

  def bm25Score(corpus: DataFrame, queries: DataFrame, textCol: String,
      idCol: String, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    requireFresh(corpus, "toks_")
    bm25ScoreFromTokens(
      corpus.select(col(idCol),
        TextAnalysis.tokens(lower(col(textCol))).as("toks_")),
      "toks_", queries, textCol, idCol, k1, b)
  }

  /** [[bm25Score]] with the CORPUS side pre-tokenized (lowercased) —
    * see [[tfIdfTopTermsFromTokens]] for the stored-artifact
    * rationale; the query side is query-scale and tokenizes inline. */
  def bm25ScoreFromTokens(corpus: DataFrame, toksCol: String,
      queries: DataFrame, queryTextCol: String, idCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k1 > 0 && b >= 0 && b <= 1, "k1 > 0, b in [0,1]")
    requireFresh(corpus.drop(toksCol),
      bm25Reserved.filterNot(_ == "toks_"): _*)
    require(!bm25Reserved.contains(idCol),
      s"idCol $idCol collides with a reserved BM25 working/output name")
    val qterms = queries
      .select(explode(array_distinct(
        TextAnalysis.tokens(lower(col(queryTextCol))))).as("term"))
      .distinct()
    val (tfDoc, dfreq, stats) =
      bm25MatchedFromTokens(corpus, toksCol, qterms, idCol)
    val scored = tfDoc.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("micro_", bm25Micro(k1, b))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matched"), sum(col("micro_")).as("bm_"))
    corpus.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        coalesce(col("bm_"), lit(0L)).as("bm25_micro"))
  }

  /** Per-query BM25 top-k retrieval — the lexical twin of the ANN
    * top-k family ([[graft.similarity.Similarity]]): for every query
    * row, the `k` best-scoring corpus documents under the same
    * integer-micro BM25 arithmetic as [[bm25Score]], ranked with a
    * deterministic (score desc, doc id asc) tiebreak. Returns
    * (query_id, idCol, n_matched, bm25_micro, rank).
    *
    * Scale shape: the distinct union of query terms broadcasts and
    * filters corpus tokens map-side (only matching rows shuffle); the
    * matched (doc, term) frequency frame aggregates ONCE at token
    * scale, materializes, and feeds document frequency AND all
    * queries — the per-query expansion joins qids onto the AGGREGATED
    * frame (matched-vocabulary scale), so adding queries never
    * re-touches corpus tokens; the final top-k is a window
    * partitioned by query — few queries × ≤ matched docs each, never
    * corpus-wide. */
  def bm25TopK(corpus: DataFrame, queries: DataFrame, textCol: String,
      idCol: String, queryIdCol: String, k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    requireFresh(corpus, "toks_")
    bm25TopKFromTokens(
      corpus.select(col(idCol),
        TextAnalysis.tokens(lower(col(textCol))).as("toks_")),
      "toks_", queries, textCol, idCol, queryIdCol, k, k1, b)
  }

  /** [[bm25TopK]] with the corpus side pre-tokenized (lowercased) —
    * see [[tfIdfTopTermsFromTokens]] for the stored-artifact
    * rationale. */
  def bm25TopKFromTokens(corpus: DataFrame, toksCol: String,
      queries: DataFrame, queryTextCol: String, idCol: String,
      queryIdCol: String, k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    require(k1 > 0 && b >= 0 && b <= 1, "k1 > 0, b in [0,1]")
    requireFresh(corpus.drop(toksCol),
      bm25Reserved.filterNot(_ == "toks_"): _*)
    require(!bm25Reserved.contains(idCol) &&
      !bm25Reserved.contains(queryIdCol),
      s"idCol/queryIdCol collides with a reserved BM25 name")
    val qterms = queries
      .select(col(queryIdCol).as("qid_"),
        explode(array_distinct(
          TextAnalysis.tokens(lower(col(queryTextCol))))).as("term"))
      .distinct()
    val (tfDoc, dfreq, stats) = bm25MatchedFromTokens(corpus, toksCol,
      qterms.select(col("term")).distinct(), idCol)
    // expand to queries at matched-VOCABULARY scale, not token scale
    val scored = tfDoc.join(broadcast(qterms), "term")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("micro_", bm25Micro(k1, b))
      .groupBy(col("qid_"), col(idCol))
      .agg(count(lit(1)).as("n_matched"),
        sum(col("micro_")).as("bm25_micro"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid_"))
          .orderBy(col("bm25_micro").desc, col(idCol))).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid_").as("query_id"), col(idCol),
        col("n_matched"), col("bm25_micro"), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the HYBRID
    * retrieval step every production RAG/curation stack runs: fuse a
    * lexical ranking ([[bm25TopK]]) with a semantic one (the
    * `similarity` top-k family) without score calibration, because
    * RRF consumes only RANKS: a document's fused score is
    * `Σ_lists round(1e6 / (c + rank))` over the lists that contain
    * it (INTEGER micros, so the sum is order-independent and
    * cross-engine exact — the engine-wide float-hash rule; c = 60,
    * the published constant, damps the head so one list's #1 cannot
    * drown agreement further down). Documents surfacing in SEVERAL
    * lists outrank single-list hits at comparable ranks — exactly
    * the property hybrid retrieval wants.
    *
    * Inputs: each ranking carries (queryIdCol, docIdCol, rank) —
    * rank 1-based, the shape every top-k engine here emits. Returns
    * (queryIdCol, docIdCol, rrf_micro, n_lists, rank ≤ k), ties on
    * the fused score broken by docIdCol.
    *
    * Scale shape: the inputs are per-query TOP-K′ lists (rank-list
    * scale by construction — the corpus-scale work already happened
    * inside the retrievers), so the union + one groupBy + one
    * per-query window are candidate-scale; nothing here touches a
    * corpus. The contribution is FLOOR(1e6/(c+rank)), not ROUND:
    * `2e6 = 2⁷·5⁶` has odd divisors (at c = 60, rank 68 → 1e6/128 =
    * 7812.5 EXACTLY), so a ROUND here would sit on a half-way case
    * whose tie rule differs across engines — the q145 failure class;
    * floor of the identical IEEE quotient has no tie rule at all
    * (the KMeans.quantizeFloor argument). The spec pins the 7812.5
    * case explicitly. */
  def rrfFuse(rankings: Seq[DataFrame], queryIdCol: String,
      docIdCol: String, k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k > 0 && c >= 1, "k must be positive, c >= 1")
    val contribs = rankings.map(_.select(col(queryIdCol),
      col(docIdCol),
      floor(lit(1e6) / (lit(c) + col("rank").cast("double")))
        .cast("long").as("rrf_m_")))
    val fused = contribs.reduce(_.unionByName(_))
      .groupBy(col(queryIdCol), col(docIdCol))
      .agg(sum(col("rrf_m_")).as("rrf_micro"),
        count(lit(1)).as("n_lists"))
    fused
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryIdCol))
          .orderBy(col("rrf_micro").desc, col(docIdCol))).cast("long"))
      .where(col("rank") <= k)
  }

  /** Per-domain document cap (the C4/Dolma curation step): keep at
    * most `n` rows per `keyCols` group, preferring `order` (e.g.
    * quality desc) — callers append a unique id to `order` for a
    * deterministic cut. Guards against a single template-heavy domain
    * dominating the mixture. One keyed window; a mega-domain
    * concentrates its rows in one sort partition, so at fleet scale
    * pair this with an upstream exact/near dedup (which removes most
    * of a degenerate domain's mass) — the window itself spills rather
    * than fails. Adds `domain_rank` (1-based) to the kept rows. */
  def capPerKey(df: DataFrame, keyCols: Seq[String], n: Int,
      order: Seq[Column]): DataFrame = {
    require(n > 0 && keyCols.nonEmpty && order.nonEmpty)
    requireFresh(df, "domain_rank")
    df.withColumn("domain_rank", row_number().over(
        Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*))
        .cast("long"))
      .where(col("domain_rank") <= n)
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): estimate each
    * raw document's target-vs-raw log-likelihood ratio under hashed
    * n-gram bag-of-features models. Features are
    * [[hashedNgramBuckets]] (unigrams + bigrams hashed into `buckets`
    * bins); each distribution is the add-one-smoothed bucket
    * frequency of its corpus; per-BUCKET log-ratios quantize to
    * integer micros so the per-document sum
    * `Σ_f log(p_target(f)/p_raw(f))` is summation-order independent
    * and cross-engine exact. Returns (idCol, n_feats, weight_micro);
    * docs with no features get 0/0.
    *
    * Scale shape: the raw side's feature arrays materialize once
    * (they feed the raw bucket counts AND the per-doc scoring); both
    * count aggregations are map-side-combined explodes whose shuffle
    * carries at most `buckets` rows; the bucket-ratio table is ≤
    * `buckets` rows by construction, so it BROADCASTS to the scoring
    * join regardless of corpus size. One token-scale shuffle total. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      textCol: String, idCol: String, buckets: Int = 4096,
      bucketOf: (Column, Int) => Column =
        (f, b) => pmod(xxhash64(f), lit(b)).cast("int")): DataFrame = {
    require(buckets > 0)
    requireFresh(raw, "bk_", "b_", "toks__", "micro_", "n_feats",
      "weight_micro")
    // alias the token array BEFORE feature building: passing the
    // split expression straight into hashedNgramBuckets inlines it
    // into the per-bigram lambdas (O(tokens²) per doc — measured 10×
    // on this very operator); the multi-referenced alias blocks
    // CollapseProject, the same barrier the q96 gate uses
    def feats(df: DataFrame, cols: Seq[Column]): DataFrame =
      df.select(cols :+
        TextAnalysis.tokens(col(textCol)).as("toks__"): _*)
        .select(cols :+ hashedNgramBuckets(col("toks__"), buckets,
          bucketOf).as("bk_"): _*)
    val rawFeats = feats(raw, Seq(col(idCol))).localCheckpoint(false)
    def counts(df: DataFrame) =
      df.select(explode(col("bk_")).as("b_"))
        .groupBy(col("b_")).agg(count(lit(1)).as("c"))
    val cr = counts(rawFeats).localCheckpoint(false)
    // both count frames feed two consumers each (their total and the
    // ratio join); ≤ `buckets` rows, so the barrier is cheap and the
    // target corpus is tokenized+hashed once instead of twice.
    // The target side needs only COUNTS (no per-doc arrays), so it
    // explodes the feature STRINGS and hashes per exploded row — the
    // hash runs as a codegen'd row expression instead of inside the
    // interpreted transform() lambda, which under the fused
    // explode-aggregate measured ~6× slower (5.9 s → 0.9 s at sf0.1);
    // same per-occurrence bucket multiset, bit-identical counts
    val ct = target
      .select(TextAnalysis.tokens(col(textCol)).as("toks__"))
      .select(explode(ngramFeatureStrings(col("toks__"))).as("f_"))
      .select(bucketOf(col("f_"), buckets).as("b_"))
      .groupBy(col("b_")).agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    // exact long totals -> both engines' doubles divide identical ints
    val nr = cr.agg(sum(col("c")).as("nr"))
    val nt = ct.agg(sum(col("c")).as("nt"))
    val ratio = cr.withColumnRenamed("c", "cr")
      .join(ct.withColumnRenamed("c", "ct"), Seq("b_"), "full")
      .crossJoin(broadcast(nr)).crossJoin(broadcast(nt))
      .select(col("b_"),
        round((log((coalesce(col("ct"), lit(0L)) + 1.0) /
            (col("nt") + lit(buckets))) -
          log((coalesce(col("cr"), lit(0L)) + 1.0) /
            (col("nr") + lit(buckets)))) * 1e6)
          .cast("long").as("micro_"))
    val perDoc = rawFeats
      .select(col(idCol), explode(col("bk_")).as("b_"))
      .join(broadcast(ratio), "b_")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        sum(col("micro_")).as("weight_micro"))
    raw.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("weight_micro"), lit(0L)).as("weight_micro"))
  }

  /** Gumbel-top-k weighted sampling without replacement (equivalent
    * to Efraimidis–Spirakis A-Res): each row draws
    * `u = uniform(seed, idCols)` and the `n` largest
    * `logWeight + Gumbel(u)` keys win, where `Gumbel(u) =
    * −ln(−ln u)` — inclusion odds scale with `exp(logWeight)`.
    * Built to consume [[importanceWeights]]' `weight_micro` (a
    * LOG-ratio in micros) directly — the DSIR resampling step — and
    * deliberately stays in LOG space: exponentiating a log-ratio
    * before keying (the literal A-Res key `ln(u)·w^{-1}`) overflows
    * any fixed-point representation for strongly off-domain
    * documents. The key is `weight_micro + round(Gumbel·1e6)` — a
    * LONG sum of the stored weight and the micro-quantized noise, so
    * the draw is deterministic under any partitioning, overflow-safe
    * across the whole log-ratio range, and replayable cross-engine.
    * One distributed TakeOrdered with an id tiebreak — no global
    * sort. */
  def weightedSample(df: DataFrame, logWeightMicroCol: String,
      idCols: Seq[String], n: Int, seed: Long = 42L,
      draw: (Long, Seq[Column]) => Column =
        graft.functions.Draws.md5Uniform): DataFrame = {
    require(n > 0 && idCols.nonEmpty)
    requireFresh(df, "key_")
    val u = draw(seed, idCols.map(col))
    val key = col(logWeightMicroCol) +
      round(-log(-log(u)) * 1e6).cast("long")
    df.withColumn("key_", key)
      .orderBy(col("key_").desc +: idCols.map(col): _*)
      .limit(n)
      .drop("key_")
  }

  /** Largest exact-mixture rebalance: given target shares per stratum
    * (summing to 1), the biggest subsample whose composition matches the
    * target keeps `c·T_s` docs of stratum s where
    * `c = min_s n_s / T_s` — strata outside the target drop. Returns one
    * row per stratum: (stratum, n_docs, target_share, keep_fraction,
    * n_keep). Apply with [[stratifiedSample]].
    *
    * Scale shape: one count aggregation; the min-ratio scalar joins
    * back via broadcast — the strata table is domain-scale, not
    * data-scale. */
  def mixtureWeights(df: DataFrame, strataCol: String,
      target: Map[String, Double]): DataFrame = {
    require(target.nonEmpty && target.values.forall(_ > 0),
      "target shares must be positive")
    require(math.abs(target.values.sum - 1.0) < 1e-6,
      s"target shares must sum to 1 (got ${target.values.sum}) — a " +
        "mis-normalized target silently yields a different mixture")
    // Every target stratum gets a row even when absent from the data
    // (n_docs = 0): its ratio 0/T_s drives c to 0, so the result is
    // the mathematically correct empty sample — NOT a silently
    // off-mixture one that ignores the missing stratum.
    val sp = df.sparkSession
    import sp.implicits._
    val targetDf = target.toSeq.sorted.toDF(strataCol, "target_share")
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"))
    val t = targetDf.join(counts, Seq(strataCol), "left")
      .withColumn("n_docs", coalesce(col("n_docs"), lit(0L)))
    val c = t.select(
      min(col("n_docs") / col("target_share")).as("c_"))
    t.crossJoin(broadcast(c))
      .select(col(strataCol), col("n_docs"),
        col("target_share"),
        when(col("n_docs") === 0, lit(0.0))
          .otherwise(round(col("c_") * col("target_share") /
            col("n_docs"), 6)).as("keep_fraction"),
        floor(col("c_") * col("target_share")).cast("long").as("n_keep"))
  }

  /** Distill an expensive per-document quality signal into a cheap
    * linear scorer — the missing TRAINING half of [[linearScore]]'s
    * apply-only story: fit `y ≈ b0 + b1·x1 + b2·x2` by distributed
    * closed-form least squares ([[graft.stats.Fitting.fitPlaneMicro]]
    * — one 9-sum aggregation, nothing collected but the Gram row),
    * then score every row with the fitted plane as a pure row
    * expression. The canonical use: y = LM bits-per-token (two
    * corpus-scale shuffles to compute), x = cheap scan-only
    * heuristics — after fitting once, a 100 TB rescore is a single
    * codegen'd scan. All columns integral micros; returns the id,
    * the inputs, `yhat_micro` and `resid_micro` (exact longs).
    *
    * Returns the fitted (b0, b1, b2) alongside the scored frame so
    * callers can ship the weights to [[linearScore]]-style appliers
    * without refitting. */
  def distillScore(df: DataFrame, idCol: String, x1Col: String,
      x2Col: String, yCol: String, ridge: Double = 0.0)
      : ((Double, Double, Double), DataFrame) = {
    requireFresh(df, "yhat_micro", "resid_micro")
    val (b0, b1, b2) =
      graft.stats.Fitting.fitPlaneMicro(df, x1Col, x2Col, yCol, ridge)
    val yhat = round(lit(b0) +
      lit(b1) * col(x1Col).cast("double") +
      lit(b2) * col(x2Col).cast("double")).cast("long")
    ((b0, b1, b2), df
      .withColumn("yhat_micro", yhat)
      .withColumn("resid_micro",
        col(yCol).cast("long") - col("yhat_micro")))
  }

  /** Hashed unigram+bigram feature buckets for a linear text
    * classifier — the fastText-style feature pipeline (bag of words +
    * word bigrams, hashing-trick bucketed). Returns an `array<int>` of
    * bucket ids in document order: the tokens then the `n-1` bigrams.
    * `bucketOf` maps a feature string to `[0, buckets)`; the default is
    * xxhash64 (8-byte, codegen'd) — pass an md5-composed variant for
    * cross-engine-portable gates.
    *
    * Takes a MATERIALIZED token-array column (an attribute, not an
    * inline `split(...)`): a lambda over an inline split re-evaluates
    * the split per bigram element — O(tokens²) per row, the same trap
    * `Dedup.ngramJaccardPairs` documents. [[linearScore]] does the
    * two-step for you. */
  def hashedNgramBuckets(toks: Column, buckets: Int,
      bucketOf: (Column, Int) => Column =
        (f, b) => pmod(xxhash64(f), lit(b)).cast("int")): Column = {
    require(buckets > 0, "buckets must be positive")
    transform(ngramFeatureStrings(toks), f => bucketOf(f, buckets))
  }

  /** The unhashed feature STRINGS of [[hashedNgramBuckets]] — the
    * tokens then the n−1 space-joined bigrams, document order. Kept
    * separate so consumers that only need bucket COUNTS can
    * `explode` the strings and hash per exploded ROW: a hash inside
    * the `transform` lambda is interpreter-evaluated per element
    * (higher-order functions don't codegen), and under a fused
    * explode that path measured ~6× slower than hashing the exploded
    * column with the codegen'd row expression
    * ([[importanceWeights]]' target side, 5.9 s → 0.9 s at sf0.1).
    * Same token-array-attribute contract as [[hashedNgramBuckets]]. */
  def ngramFeatureStrings(toks: Column): Column = {
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", slice(toks, i, lit(2)))))
      .otherwise(array().cast("array<string>"))
    concat(toks, bigrams)
  }

  /** Apply a trained linear quality classifier (fastText-style:
    * mean-pooled hashed n-gram embedding of dimension 1 + bias) to
    * every document. `weights(k)` is the scalar weight of feature
    * bucket `k`; the score is
    * `bias + mean(weights(bucket(feature)))` over unigrams+bigrams.
    * Returns (idCol, n_feats, score).
    *
    * Scale shape: the model rides the plan as a LITERAL array (a few
    * KB to a few MB — fastText quality-filter models are exactly
    * this), so scoring 100 TB is ONE codegen'd scan: no join, no
    * shuffle, no UDF; the fold over feature buckets is a higher-order
    * `aggregate` inside whole-stage codegen. This is the
    * apply-the-classifier half of the standard quality-filtering
    * loop (the training half is sklearn/fastText-offline, model
    * shipped as an array). */
  /** Exact per-stratum quantile bucketing of an INTEGER score column
    * (CCNet's head/middle/tail perplexity split generalized): row r
    * lands in bucket `labels(j)` for the first `j` with
    * `cum(r) <= fracs(j) · total(stratum)`, where `cum` counts rows of
    * the stratum scoring <= r's score — so ties (equal scores) always
    * share a bucket and the result is independent of partitioning and
    * engine. Returns the input plus a `bucket` column; rows whose
    * score or stratum is NULL keep their row with a NULL bucket
    * (they can't rank) rather than silently vanishing.
    *
    * Scale shape — a hierarchical prefix sum, NOT a corpus sort:
    * (1) per-(stratum, score) histogram: one map-side-combined groupBy
    *     whose output is distinct-score scale, not row scale;
    * (2) scores coarse-binned by `score >> binShift`; bin subtotals
    *     prefix-summed per stratum (a window over <= 2^(63-binShift)
    *     bin rows — thousands, never data-scale);
    * (3) within-bin prefix sums, partitioned by (stratum, bin), each
    *     partition holding only one bin's distinct scores;
    * (4) bucket labels join back to rows by (stratum, score) — a hash
    *     join at distinct-score scale.
    * No task ever sorts more than one bin of one stratum, so the
    * operator survives a stratum with billions of rows — the case
    * where "window over the stratum" (the naive plan) is a one-task
    * sort cliff. */
  def quantileBuckets(df: DataFrame, scoreCol: String,
      strataCols: Seq[String], fracs: Seq[Double], labels: Seq[String],
      binShift: Int = 20): DataFrame = {
    require(strataCols.nonEmpty, "strataCols must be non-empty")
    require(fracs.nonEmpty && labels.length == fracs.length + 1,
      "need labels.length == fracs.length + 1")
    require(fracs.head > 0 && fracs.last < 1 &&
      fracs.zip(fracs.tail).forall { case (a, b) => a < b },
      "fracs must be strictly increasing within (0, 1)")
    require(binShift >= 0 && binShift < 63)
    requireFresh(df, "s_", "bin_", "cnt_", "bc_", "base_", "cum_",
      "tot_", "bucket")
    val sCols = strataCols.map(col)
    // rows with a NULL score or NULL stratum can't rank — keep them
    // OUT of the histogram so they don't inflate tot_ or (sorting
    // first in the ascending window) shift every real bin's base_
    // prefix sum; the final LEFT join restores them with bucket=null
    val rankable = (col(scoreCol).isNotNull +: sCols.map(_.isNotNull))
      .reduce(_ && _)
    val hist = df.where(rankable)
      .groupBy(sCols :+ col(scoreCol).cast("long").as("s_"): _*)
      .agg(count(lit(1)).as("cnt_"))
      // three consumers (bin totals, within-bin cumsum, stratum
      // totals): materialize the distinct-score histogram once
      .localCheckpoint(false)
    // arithmetic shift: preserves score order for negative micros too
    val binned = hist.withColumn("bin_", shiftright(col("s_"), binShift))
    val binBase = binned
      .groupBy(sCols :+ col("bin_"): _*).agg(sum(col("cnt_")).as("bc_"))
      .withColumn("base_", coalesce(
        sum(col("bc_")).over(Window.partitionBy(sCols: _*)
          .orderBy(col("bin_"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(sCols :+ col("bin_") :+ col("base_"): _*)
    val cum = binned.join(binBase, strataCols :+ "bin_")
      .withColumn("cum_", col("base_") +
        sum(col("cnt_")).over(
          Window.partitionBy(sCols :+ col("bin_"): _*)
            .orderBy(col("s_"))))
    // stratum totals are strata-scale — broadcast to the label step
    val tot = hist.groupBy(sCols: _*).agg(sum(col("cnt_")).as("tot_"))
    val first = when(col("cum_") <= lit(fracs.head) * col("tot_"),
      lit(labels.head))
    val labelExpr = fracs.tail.zip(labels.tail.init).foldLeft(first) {
      case (acc, (f, lab)) =>
        acc.when(col("cum_") <= lit(f) * col("tot_"), lit(lab))
    }.otherwise(lit(labels.last))
    val scoreBuckets = cum.join(broadcast(tot), strataCols)
      .select(sCols :+ col("s_") :+ labelExpr.as("bucket"): _*)
    // LEFT join: a null score/stratum key matches nothing, so those
    // rows surface with bucket = null instead of being dropped
    df.withColumn("s_", col(scoreCol).cast("long"))
      .join(scoreBuckets, strataCols :+ "s_", "left")
      .drop("s_")
  }

  /** CCNet-style perplexity bucketing: score every document by the
    * corpus' own unigram LM ([[unigramLogProb]]), quantize to integer
    * micro-bits-per-token, and split each stratum (CCNet: the
    * language) into head/middle/tail at the 1/3 and 2/3 quantiles —
    * head = most fluent under the LM. The tail bucket is what
    * CCNet-derived pipelines drop or down-weight. Whitespace-only
    * documents carry one empty pseudo-token under the whitespace
    * split (matching the SQL split semantics the oracles replay), so
    * they score and bucket like any other document. Returns
    * (idCol, strataCols…, bits_micro, bucket).
    *
    * Scale shape: [[unigramLogProb]]'s two token-scale shuffles plus
    * [[quantileBuckets]]' distinct-score-scale bucketing — no corpus
    * sort anywhere. */
  def perplexityBuckets(df: DataFrame, textCol: String, idCol: String,
      strataCols: Seq[String], fracs: Seq[Double] = Seq(1.0 / 3, 2.0 / 3),
      labels: Seq[String] = Seq("head", "middle", "tail"),
      binShift: Int = 20): DataFrame = {
    requireFresh(df, "toks_")
    perplexityBucketsFromTokens(
      df.withColumn("toks_", TextAnalysis.tokens(lower(col(textCol)))),
      "toks_", idCol, strataCols, fracs, labels, binShift)
  }

  /** [[perplexityBuckets]] over a pre-tokenized (lowercased) frame —
    * see [[tfIdfTopTermsFromTokens]] for the stored-artifact
    * rationale. */
  def perplexityBucketsFromTokens(df: DataFrame, toksCol: String,
      idCol: String, strataCols: Seq[String],
      fracs: Seq[Double] = Seq(1.0 / 3, 2.0 / 3),
      labels: Seq[String] = Seq("head", "middle", "tail"),
      binShift: Int = 20): DataFrame = {
    requireFresh(df.drop(toksCol), "bits_micro")
    val lm = unigramLogProbFromTokens(df, toksCol, idCol)
      // exact integer micro-bits per token: LONG division through
      // double is deterministic and replayed identically by the oracle
      .select(col(idCol),
        round(-col("logprob_micro").cast("double") / col("n_tokens"))
          .cast("long").as("bits_micro"))
    // doc-scale BARRIER: quantileBuckets consumes its input twice
    // (histogram + final label join-back), and without it each
    // consumer re-executes the whole LM pipeline downstream of the
    // reused shuffles. This is NOT the pairs-scale checkpoint the
    // LM's tf tables deliberately avoid (that one OOMed at 1M docs):
    // (id, strata, bits) is a few dozen bytes per document.
    val scored = df.select(col(idCol) +: strataCols.map(col): _*)
      .join(lm, Seq(idCol))
      .localCheckpoint(false)
    quantileBuckets(scored, "bits_micro", strataCols, fracs, labels,
      binShift)
  }

  /** [[perplexityBuckets]] under the KNESER-NEY BIGRAM LM
    * ([[knBigramLogProb]]) instead of the unigram — CCNet's actual
    * fluency filter is a smoothed n-gram (KenLM-family) model, and
    * the bigram KN bits are far sharper on word-salad/boilerplate
    * than unigram frequency alone. Documents too short to form a
    * bigram (n_pairs = 0) are NOT bucketed (no evidence either way);
    * callers keep or route them explicitly — [[CorpusDemo]] keeps
    * them. Same hierarchical distinct-score-scale bucketing, no
    * corpus sort. */
  def perplexityBucketsKn(df: DataFrame, textCol: String,
      idCol: String, strataCols: Seq[String],
      fracs: Seq[Double] = Seq(1.0 / 3, 2.0 / 3),
      labels: Seq[String] = Seq("head", "middle", "tail"),
      binShift: Int = 20): DataFrame = {
    requireFresh(df, "toks_")
    perplexityBucketsKnFromTokens(
      df.withColumn("toks_", TextAnalysis.tokens(lower(col(textCol)))),
      "toks_", idCol, strataCols, fracs, labels, binShift)
  }

  /** [[perplexityBucketsKn]] over a pre-tokenized (lowercased)
    * frame. */
  def perplexityBucketsKnFromTokens(df: DataFrame, toksCol: String,
      idCol: String, strataCols: Seq[String],
      fracs: Seq[Double] = Seq(1.0 / 3, 2.0 / 3),
      labels: Seq[String] = Seq("head", "middle", "tail"),
      binShift: Int = 20): DataFrame = {
    requireFresh(df.drop(toksCol), "bits_micro")
    val lm = knBigramLogProbFromTokens(df, toksCol, idCol)
      .where(col("n_pairs") > 0)
      .select(col(idCol),
        round(-col("logprob_micro").cast("double") / col("n_pairs"))
          .cast("long").as("bits_micro"))
    // LEFT: unscoreable docs surface with bits/bucket null instead of
    // vanishing — quantileBuckets' null-score path carries them.
    // Doc-scale BARRIER: quantileBuckets consumes this twice
    // (histogram + final join-back); without it each consumer re-runs
    // the KN pipeline downstream of the reused shuffles — measured
    // 30.6 s → 18.5 s at 1M docs. Unlike the LM's pairs-scale tf
    // tables (whose checkpoint OOMed — PLANS.md), (id, strata, bits)
    // is a few dozen bytes per document.
    val scored = df.select(col(idCol) +: strataCols.map(col): _*)
      .join(lm, Seq(idCol), "left")
      .localCheckpoint(false)
    quantileBuckets(scored, "bits_micro", strataCols, fracs, labels,
      binShift)
  }

  /** Temperature-scaled mixture weights (the multilingual /
    * multi-domain alpha-sampling rule of mBERT/XLM-R/mT5): stratum s
    * with n_s documents is sampled with probability
    * `p_s ∝ n_s^alpha` — alpha = 1 keeps the natural mixture, alpha →
    * 0 approaches uniform over strata, the published sweet spots are
    * 0.3 (mT5) / 0.7 (XLM-R). Returns one row per stratum:
    * (stratum, n_docs, p_raw_micro, p_alpha_micro, boost_micro) where
    * boost = p_alpha / p_raw is the per-document up/down-sampling
    * factor a sampler should apply (micros, round(x·1e6) — the
    * transcendental pow rounds at micro precision like every other
    * gate). Feed the boosts to [[stratifiedSample]] (boost <= 1) or an
    * epoch-repeat plan (boost > 1).
    *
    * Scale shape: one count aggregation; the normalizing sums ride a
    * broadcast 1-row frame — the output is strata-scale. */
  def temperatureMixture(df: DataFrame, strataCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    requireFresh(df, "n_docs", "w_", "tn_", "tw_", "p_raw_micro",
      "p_alpha_micro", "boost_micro")
    // the pow itself quantizes to micros per stratum BEFORE the
    // normalizing sum, so the total is an exact long — a double sum
    // over strata would depend on partial-aggregation order
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w_",
        round(pow(col("n_docs").cast("double"), lit(alpha)) * 1e6)
          .cast("long"))
    val tots = counts.agg(sum(col("n_docs")).as("tn_"),
      sum(col("w_")).as("tw_"))
    counts.crossJoin(broadcast(tots))
      .select(col(strataCol), col("n_docs"),
        round(col("n_docs") * lit(1e6) / col("tn_")).cast("long")
          .as("p_raw_micro"),
        round(col("w_") * lit(1e6) / col("tw_")).cast("long")
          .as("p_alpha_micro"),
        round((col("w_").cast("double") / col("tw_")) /
          (col("n_docs").cast("double") / col("tn_")) * lit(1e6))
          .cast("long").as("boost_micro"))
  }

  def linearScore(df: DataFrame, textCol: String, idCol: String,
      weights: Array[Double], bias: Double = 0.0,
      bucketOf: (Column, Int) => Column =
        (f, b) => pmod(xxhash64(f), lit(b)).cast("int")): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    requireFresh(df, "toks_", "bk_", "nf_")
    val wlit = array(weights.map(lit(_)): _*)
    df.select(col(idCol),
        TextAnalysis.tokens(col(textCol)).as("toks_"))
      .select(col(idCol),
        hashedNgramBuckets(col("toks_"), weights.length, bucketOf)
          .as("bk_"))
      .withColumn("nf_", size(col("bk_")))
      .select(col(idCol), col("nf_").cast("long").as("n_feats"),
        (lit(bias) + aggregate(col("bk_"), lit(0.0),
          (acc, k) => acc + element_at(wlit, k + 1)) / col("nf_"))
          .as("score"))
  }
}
