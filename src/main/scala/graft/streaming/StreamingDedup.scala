package graft.streaming

import graft.text.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate detection AT INGEST: every arriving document is
  * checked against a standing corpus index inside the stream, so a
  * continuously curated corpus never admits a near-dup in the first
  * place — the streaming twin of [[graft.text.Dedup
  * .nearDupAgainstCorpus]] (q92's daily-batch shape made per-event).
  *
  * Why it streams: the batch path's per-doc signature AGGREGATION
  * (explode + 128 min-aggs) becomes a per-ROW array expression
  * ([[Dedup.minhashSigExpr]] — identical values, same remix
  * constants), so the whole pipeline is stateless: expression-only
  * projections plus stream-static equi-joins, legal in append mode
  * with no watermark, no state store, and exactly-once emission per
  * verified pair (see the min-shared-bucket filter below). The corpus
  * index is batch-built once ([[Dedup.streamingCorpusIndex]]) and
  * re-broadcast/reused per micro-batch.
  *
  * Scale shape: per event, O(shingles × numHashes) expression work and
  * `bands` index lookups; only band-colliding pairs reach the verify
  * join. The corpus index lives in storage, not in stream state — the
  * stream stays O(1) memory regardless of corpus size.
  */
object StreamingDedup {

  /** `stream`: streaming (idCol, textCol, …) rows. `corpusBuckets` /
    * `corpusDocs`: the two frames of [[Dedup.streamingCorpusIndex]]
    * (STATIC). Emits (delta_id, corpus_id, jaccard) per verified pair,
    * append-mode safe. Pairs collide in several bands; the row whose
    * joined bucket equals the MINIMUM shared bucket is the one that
    * survives — a stateless exactly-once guard (both bucket sets are
    * in the row, no dropDuplicates state needed). */
  def nearDupIngestStream(stream: DataFrame, corpusBuckets: DataFrame,
      corpusDocs: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 128, bands: Int = 16, k: Int = 3,
      minJaccard: Double = 0.5): DataFrame = {
    val withSig = stream
      .withColumn("gh_", Dedup.shingleHashSetExpr(col(textCol), k))
      .withColumn("bks_", Dedup.bandBucketsExpr(
        Dedup.minhashSigExpr(col("gh_"), numHashes), numHashes, bands))
      .select(col(idCol).as("delta_id"), col("gh_"), col("bks_"))
    nearDupIngestFromSig(withSig, corpusBuckets, corpusDocs, minJaccard)
  }

  /** The corpus-check join with the delta side ALREADY signed:
    * (delta_id, gh_ shingle-hash set, bks_ band buckets) — shared by
    * the stream above and [[CorpusIndexStore]]'s per-batch gate, so
    * the two can never drift on the verify arithmetic or the
    * exactly-once bucket guard. */
  def nearDupIngestFromSig(withSig: DataFrame, corpusBuckets: DataFrame,
      corpusDocs: DataFrame, minJaccard: Double): DataFrame =
    withSig
      .select(col("delta_id"), col("gh_"), col("bks_"),
        explode(col("bks_")).as("bucket"))
      .join(corpusBuckets, "bucket")
      .join(corpusDocs, "corpus_id")
      // exactly-once per (delta, corpus): of all shared buckets, only
      // the minimum one emits the pair
      .where(col("bucket") ===
        array_min(array_intersect(col("bks_"), col("cbuckets"))))
      .withColumn("ni",
        size(array_intersect(col("gh_"), col("gh"))).cast("double"))
      .withColumn("jaccard", col("ni") /
        (size(col("gh_")) + size(col("gh")) - col("ni")))
      .where(col("jaccard") >= minJaccard)
      .select(col("delta_id"), col("corpus_id"), col("jaccard"))
}
