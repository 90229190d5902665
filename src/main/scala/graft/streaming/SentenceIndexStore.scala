package graft.streaming

import graft.text.Curation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Sentence-level dedup at ingest with a GROWING stored hash index —
  * the [[ParagraphIndexStore]] recipe one granularity down, completing
  * the streaming half of the line/sentence/paragraph/document ladder:
  * every micro-batch's documents lose any sentence already kept by the
  * corpus (or by an earlier document of the same batch), and the
  * sentences they KEEP fold back into the stored index — a syndicated
  * lead sentence arriving five minutes after its original dies even
  * though neither was in the initial corpus, and the corpus converges
  * to one canonical copy per distinct sentence under any batch
  * slicing.
  *
  * Storage layout (parquet under `path`, partitioned by
  * `ingest_batch`):
  *  - `sentences/` — `Curation.sentenceHashes` rows of every KEPT
  *    sentence (narrow (id, idx, chars, hash))
  *  - `cleaned/` (idCol, n_sentences, n_dropped, text) — the deduped
  *    corpus itself
  *
  * Idempotence / restart: identical to [[ParagraphIndexStore]] — each
  * batch OVERWRITES its own `ingest_batch=<id>` partitions and the
  * membership check excludes the current batch id, so a redelivered
  * batch sees the index as it stood before its first attempt.
  *
  * Scale shape per batch: [[Curation.dedupSentencesAgainst]] — one
  * equi-join of the batch's exploded sentences against the stored
  * hash table, co-partitioned on the 64-bit hash, plus the
  * batch-internal first-wins keeper at batch scale; the fold-back
  * writes batch-scale rows. Nothing corpus-proportional is recomputed
  * per batch. When even the stored hash join is too heavy per
  * micro-batch, front it with the sharded-Bloom pattern the paragraph
  * store implements (`Curation.paragraphBloomShards` over the
  * hash column — the builders are shape-compatible after one
  * `withColumnRenamed("sent_hash", "para_hash")`) and reserve the
  * exact join for flagged rows; at sentence granularity (10-100×
  * more items than paragraphs at 100 TB) the sharding is mandatory,
  * never optional. `minSentChars` keeps short common sentences
  * ("Thanks.", "Yes.") out of the index entirely — they are
  * structure, not content. */
final class SentenceIndexStore(spark: SparkSession, path: String,
    idCol: String = "doc_id", minSentChars: Int = 1) {

  private val sentPath = s"$path/sentences"
  private val cleanedPath = s"$path/cleaned"

  /** Batch-build: corpus-wide [[Curation.dedupSentencesWithIndex]]
    * seeds the cleaned corpus AND the index from one computation.
    * The index is the KEEPER DECISION's kept sentences — never a
    * re-segmentation of rebuilt text, which is not invertible
    * (rejoined sentences can merge across the no./st.-digit
    * protection and store one hash for two kept sentences, breaking
    * convergence — see dedupSentencesWithIndex). Lands as
    * `ingest_batch=-1`, wiping prior state under `path`. */
  def initialize(corpus: DataFrame, textCol: String): Unit = {
    StorePaths.wipe(spark, Seq(sentPath, cleanedPath,
      s"$path/checkpoint"))
    val (cleaned, kept) = Curation.dedupSentencesWithIndex(corpus,
      textCol, idCol, minSentChars)
    cleaned.write.mode("overwrite")
      .parquet(s"$cleanedPath/ingest_batch=-1")
    kept.write.mode("overwrite").parquet(s"$sentPath/ingest_batch=-1")
  }

  /** Kept-sentence hash table across the base build and every folded
    * batch. */
  def sentenceTable: DataFrame =
    spark.read.parquet(sentPath).drop("ingest_batch")

  /** The deduped corpus so far. */
  def cleaned: DataFrame =
    spark.read.parquet(cleanedPath).drop("ingest_batch")

  /** Start the growing ingest over a streaming (idCol, textCol)
    * frame. */
  def ingest(stream: DataFrame, textCol: String,
      checkpointLocation: Option[String] = None): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, textCol, batchId)
      }
      .option("checkpointLocation",
        checkpointLocation.getOrElse(s"$path/checkpoint"))
      .start()

  /** One micro-batch — package-visible so the spec can replay a batch
    * id and prove idempotence directly. */
  private[streaming] def processBatch(batch: DataFrame,
      textCol: String, batchId: Long): Unit = {
    val stored = spark.read.parquet(sentPath)
      .where(col("ingest_batch") =!= batchId).drop("ingest_batch")
    // cleaned text + kept-sentence index from ONE keeper computation
    // (re-segmenting the rebuilt text would merge sentences across
    // suppressed boundaries and corrupt the index — scaladoc above)
    val (cleanedBatch, kept) = Curation.dedupSentencesAgainstWithIndex(
      batch, stored, textCol, idCol, minSentChars)
    kept.write.mode("overwrite")
      .parquet(s"$sentPath/ingest_batch=$batchId")
    cleanedBatch.write.mode("overwrite")
      .parquet(s"$cleanedPath/ingest_batch=$batchId")
  }
}
