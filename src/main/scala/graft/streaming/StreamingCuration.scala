package graft.streaming

import graft.text.{Curation, Dedup, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Curation AT INGEST: the scoring/filtering/redaction/decontamination
  * half of the corpus pipeline applied to a document firehose before
  * anything lands — the streaming twin of the CorpusDemo batch stages,
  * composing with [[StreamingDedup.nearDupIngestStream]] (which covers
  * the near-dup half) for a full admit-or-reject gate per arriving
  * document.
  *
  * Why it streams trivially: every signal here — language id, quality
  * score, Gopher/C4 heuristic stats + keep verdict, PII redaction, and
  * the k-gram decontamination overlap — is a pure per-row expression,
  * so the stream is stateless: legal in append mode with no watermark
  * and no state store. The one batch-side dependency, the probe
  * suite's k-gram set, is driver-collected ONCE as 64-bit hashes
  * (eval-scale by the same contract as [[Curation.decontaminate]]'s
  * broadcast) and rides the plan as a literal array; the overlap count
  * is one `array_intersect` per row.
  *
  * Scale shape: per event, O(tokens + |probe grams|) expression work —
  * a pure map over any micro-batch size; nothing is
  * corpus-proportional. The literal-array shape is right for probe
  * suites up to ~10^5 distinct grams (8 B/gram in the plan,
  * `array_intersect` scans the probe side per row); a full benchmark
  * battery with 10^6+ grams should instead ship a Bloom bitset
  * literal for the stream-side flag (bounded plan size, per-gram O(k)
  * probes) and re-check flagged documents exactly with the batch
  * [[Curation.decontaminate]] downstream. */
object StreamingCuration {

  /** Distinct lowercased word `k`-gram hashes of the probe/benchmark
    * suite — the static side of the ingest decontamination check,
    * built once in batch. Sorted for deterministic literal plans. */
  def probeGramHashes(probes: DataFrame, textCol: String,
      k: Int = 13): Array[Long] =
    probes.select(explode(Dedup.shingleHashSetExpr(col(textCol), k))
        .as("h")).distinct()
      .collect().map(_.getLong(0)).sorted

  /** Adds, per arriving document: `lang_pred`, `quality`, the
    * [[Curation.heuristicStats]] columns + `keep`, `n_shared` /
    * `contaminated` (distinct k-gram overlap with the probe hashes,
    * [[Curation.decontaminate]] semantics modulo 64-bit hashing), and
    * `text_redacted`. Append-mode safe; both verdicts are 0/1 longs,
    * so the caller's one-line admit gate is
    * `col("keep") === 1 && col("contaminated") === 0`. */
  def curationIngestStream(stream: DataFrame, textCol: String,
      probeHashes: Array[Long], k: Int = 13,
      bounds: Curation.HeuristicBounds = Curation.HeuristicBounds())
      : DataFrame = {
    // output columns would silently clobber same-named caller columns
    // (the requireFresh convention of the batch Curation APIs);
    // heuristicStats guards its own output names (n_words .. keep)
    val outNames = Seq("lang_pred", "quality", "n_shared",
      "contaminated", "text_redacted")
    val clash = outNames.filter(stream.columns.contains)
    require(clash.isEmpty,
      s"stream already has output column(s): ${clash.mkString(", ")}")
    val probeLit: Column =
      if (probeHashes.isEmpty) array().cast("array<bigint>")
      else array(probeHashes.map(lit(_)): _*)
    // null text makes the gram expression null and size() then yields
    // null (or -1 under legacy sizeOfNull) — the batch twin coalesces
    // to a defined clean verdict, and the admit gate needs one too
    val nShared = greatest(coalesce(
      size(array_intersect(
        Dedup.shingleHashSetExpr(col(textCol), k), probeLit))
        .cast("long"),
      lit(0L)), lit(0L))
    Curation.heuristicStats(stream, textCol, bounds)
      .withColumn("lang_pred", TextAnalysis.languageId(col(textCol)))
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("n_shared", nShared)
      .withColumn("contaminated", (col("n_shared") > 0).cast("long"))
      .withColumn("text_redacted", Curation.redactPii(col(textCol)))
  }
}
