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
    verifyPairs(
      withSig
        .select(col("delta_id"), col("gh_"), col("bks_"),
          explode(col("bks_")).as("bucket"))
        .join(corpusBuckets, "bucket")
        .join(corpusDocs, "corpus_id"),
      minJaccard)

  /** [[nearDupIngestFromSig]] with the BATCH-only join topology the
    * micro-batch stores use ([[CorpusIndexStore.processBatch]] runs
    * on static frames inside foreachBatch): the delta side is the
    * small one, so it BROADCASTS and both corpus tables are SCANNED
    * in place — the stream-legal form above leaves the join strategy
    * to the planner, which shuffles the corpus-scale bucket AND doc
    * tables every micro-batch when it picks sort-merge. Shape:
    * (1) band rows WITHOUT the shingle array broadcast against the
    *     bucket table (the array would multiply the broadcast by the
    *     band count);
    * (2) candidate corpus docs fetched by the DISTINCT candidate ids
    *     (pruned chunked-IN scan over a sorted base for small sets,
    *     left-semi against the local id set beyond — a hot bucket
    *     inflates candidates, never the id set beyond id-scale);
    * (3) candidate-scale joins reattach the corpus rows and the delta
    *     shingles, then the shared [[verifyPairs]] arithmetic runs.
    * Output is row-identical to the stream form (spec-pinned): same
    * inner-join multiset, same exactly-once bucket guard.
    * PRECONDITIONS beyond the stream form's: (a) `delta_id` must be
    * unique within `withSig` — the shingle reattach in step (3) keys
    * on it, so a duplicated id would cross-pair one row's band
    * matches with another row's shingles (CorpusIndexStore ENFORCES
    * it with a per-batch dropDuplicates on the id — id = identity);
    * (b) materialize `withSig`
    * (`localCheckpoint`) before calling — it is referenced by TWO
    * broadcasts, and an unmaterialized frame recomputes its
    * O(shingles × numHashes) signature expressions once per
    * reference. Illegal on a STREAMING delta (broadcast/checkpoint of
    * a streaming side) — streams use [[nearDupIngestStream]]. */
  def nearDupIngestFromSigBatch(withSig: DataFrame,
      corpusBuckets: DataFrame, corpusDocs: DataFrame,
      minJaccard: Double): DataFrame = {
    val deltaBands = withSig.select(col("delta_id"), col("bks_"),
      explode(col("bks_")).as("bucket"))
    val bandMatches = corpusBuckets
      .join(broadcast(deltaBands), Seq("bucket"))
      .localCheckpoint(false) // feeds the id fetch AND the verify join
    // candidate rows fetched by key: pruned chunked-IN scan over a
    // corpus_id-sorted docs base when the candidate set is small
    // (row groups skip), left-semi against the local id set beyond —
    // either way the FAT shingle-set table is scanned, never shuffled
    // and never fully read when sorted
    val fetched = graft.text.Curation.fetchByKeys(corpusDocs,
      "corpus_id", bandMatches.select(col("corpus_id")))
    verifyPairs(
      bandMatches.join(fetched, Seq("corpus_id"))
        .join(broadcast(withSig.select(col("delta_id"), col("gh_"))),
          Seq("delta_id")),
      minJaccard)
  }

  // the shared verify arithmetic + exactly-once guard, so the stream
  // and batch topologies can never drift: of all shared buckets only
  // the MINIMUM one emits the pair, then exact jaccard over the
  // shingle-hash sets
  private def verifyPairs(joined: DataFrame,
      minJaccard: Double): DataFrame =
    joined
      .where(col("bucket") ===
        array_min(array_intersect(col("bks_"), col("cbuckets"))))
      .withColumn("ni",
        size(array_intersect(col("gh_"), col("gh"))).cast("double"))
      .withColumn("jaccard", col("ni") /
        (size(col("gh_")) + size(col("gh")) - col("ni")))
      .where(col("jaccard") >= minJaccard)
      .select(col("delta_id"), col("corpus_id"), col("jaccard"))
}
