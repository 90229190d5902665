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
  * Scale shape: per event, O(tokens) expression work — a pure map over
  * any micro-batch size; nothing is corpus-proportional. */
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
    * `text_redacted`. Append-mode safe; admit = keep && !contaminated
    * is the caller's one-line gate. */
  def curationIngestStream(stream: DataFrame, textCol: String,
      probeHashes: Array[Long], k: Int = 13,
      bounds: Curation.HeuristicBounds = Curation.HeuristicBounds())
      : DataFrame = {
    val probeLit: Column =
      if (probeHashes.isEmpty) array().cast("array<bigint>")
      else array(probeHashes.map(lit(_)): _*)
    val nShared = size(array_intersect(
      Dedup.shingleHashSetExpr(col(textCol), k), probeLit)).cast("long")
    Curation.heuristicStats(stream, textCol, bounds)
      .withColumn("lang_pred", TextAnalysis.languageId(col(textCol)))
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("n_shared", nShared)
      .withColumn("contaminated", (col("n_shared") > 0).cast("long"))
      .withColumn("text_redacted", Curation.redactPii(col(textCol)))
  }
}
