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
  *  1. score: language ID, quality, repetition signals — pure
  *     expressions, a single map pass;
  *  2. filter: per-language quality percentile (sketch + broadcast
  *     thresholds) and a repetition cap;
  *  3. dedup: MinHash-LSH near-dup pairs → connected components →
  *     keep one representative per duplicate family;
  *  4. decontaminate: drop documents overlapping the (broadcast)
  *     benchmark 13-gram set;
  *  5. semantic prune: SemDedup over the embeddings of surviving
  *     docs (auto-sized hyperplane clusters);
  *  6. sample: deterministic per-language stratified sample of what
  *     remains.
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

    val docs = Tables.table(spark, sfDir, "documents")
    val total = docs.count()

    // 1. score every document in one map pass
    val scored = t("score: lang/quality/repetition") {
      docs
        .withColumn("tok_", TextAnalysis.tokens(lower(col("text"))))
        .withColumn("lang_pred", TextAnalysis.languageId(col("text")))
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .withColumn("top_word_frac",
          TextAnalysis.topCount(col("tok_")).cast("double") /
            size(col("tok_")))
        .drop("tok_")
        .localCheckpoint(false)
    }

    // 2. quality filter: keep the top 80% per language, cap repetition
    val filtered = t("filter: per-lang quality + repetition cap") {
      Curation.qualityFilter(scored, "text", keepFraction = 0.8)
        .where(col("top_word_frac") <= 0.5)
    }

    // 3. near-dup dedup: pairs -> components -> one keeper per family
    val deduped = t("dedup: LSH pairs -> clusters -> keep-first") {
      Clusters.dropNearDuplicates(filtered, "text", "doc_id",
        minJaccard = 0.5, numHashes = 32)
    }

    // 4. decontaminate vs a probe set (here: the 10 lowest doc_ids)
    val clean = t("decontaminate vs benchmark grams") {
      val probes = docs.where(col("doc_id") < 10)
      val flags = Curation.decontaminate(
        deduped.where(col("doc_id") >= 10), probes, "text", "doc_id")
      deduped.join(flags.where(col("contaminated") === 0)
        .select(col("doc_id")), Seq("doc_id"), "left_semi")
    }

    // 5. semantic prune on the survivors' embeddings
    val pruned = t("semantic prune: semdedup on embeddings") {
      val emb = Tables.table(spark, sfDir, "embeddings")
        .join(clean.select(col("doc_id").as("vec_id")), Seq("vec_id"),
          "left_semi")
      val drops = Similarity.semDedupAuto(emb, "embedding", "vec_id",
          minCosine = 0.4)
        .where(col("dropped") === 1)
        .select(col("vec_id").as("doc_id"))
      clean.join(drops, Seq("doc_id"), "left_anti")
    }

    // 6. deterministic stratified sample of what remains
    val sampled = t("sample: stratified by language") {
      Curation.stratifiedSample(
        pruned.withColumn("lang_pred",
          TextAnalysis.languageId(col("text"))),
        "lang_pred",
        Map("en" -> 0.5, "de" -> 0.5, "fr" -> 0.5, "es" -> 0.5,
          "zh" -> 0.5, "und" -> 0.25),
        idCols = Seq("doc_id"))
    }

    val counts = Seq(
      "input" -> total, "quality-filtered" -> filtered.count(),
      "deduped" -> deduped.count(), "decontaminated" -> clean.count(),
      "semantically-pruned" -> pruned.count(),
      "sampled" -> sampled.count())
    counts.foreach { case (k, v) => println(f"[corpus] $k%-22s $v%,10d") }
    require(counts.map(_._2).sliding(2).forall(p => p(1) <= p(0)),
      "each stage must only shrink the corpus")
    spark.stop()
  }
}
