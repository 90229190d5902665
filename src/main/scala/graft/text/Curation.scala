package graft.text

import org.apache.spark.sql.DataFrame
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
      seed: Long = 42L): DataFrame = {
    require(idCols.nonEmpty, "idCols must identify rows")
    require(fractions.values.forall(f => f >= 0 && f <= 1),
      "fractions in [0,1]")
    val frac = fractions.foldLeft(lit(null).cast("double")) {
      case (acc, (k, f)) => when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    val u = (pmod(xxhash64(lit(seed) +: idCols.map(col): _*),
      lit(Long.MaxValue)).cast("double") + 0.5) /
      (Long.MaxValue.toDouble + 1.0)
    df.withColumn("frac_", frac)
      .where(col("frac_").isNotNull && u < col("frac_"))
      .drop("frac_")
  }

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
    def grams(df: DataFrame, keep: Seq[String]) = df
      .withColumn("tok_", TextAnalysis.tokens(lower(col(textCol))))
      .select(keep.map(col) :+
        explode(array_distinct(
          TextAnalysis.shinglesFromTokens(col("tok_"), k))).as("gram_"): _*)
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
}
