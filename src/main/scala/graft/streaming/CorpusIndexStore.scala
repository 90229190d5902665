package graft.streaming

import graft.text.{Clusters, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** A standing near-dup corpus index that GROWS at ingest: the
  * continuous-curation closure of [[StreamingDedup]]. The stream-static
  * gate checks arrivals against a batch-built index that never changes
  * within a run; this store adds the missing half — every micro-batch's
  * ACCEPTED documents fold their signatures back into the stored index,
  * so a clone arriving five minutes after its original is rejected even
  * though neither was in the initial corpus.
  *
  * Storage layout (all parquet under `path`, partitioned by
  * `ingest_batch`):
  *  - `buckets/` (bucket, corpus_id) — the band-bucket equi-join side
  *  - `docs/` (corpus_id, gh, cbuckets) — verify-side shingle-hash sets
  *  - `accepted/` (idCol, text) — the curated corpus itself
  *
  * Exactly-once/idempotence: each micro-batch writes to
  * `ingest_batch=<batchId>` directories with OVERWRITE — a replayed
  * batch (foreachBatch redelivery after failure) rewrites the same
  * directories instead of appending duplicates, the standard
  * idempotent-sink pattern for foreachBatch. That keying is only
  * sound while batch ids stay unique across the store's lifetime, so
  * the stream's checkpoint is OWNED BY THE STORE by default
  * (`path/checkpoint`): a restarted [[ingest]] resumes the batch
  * counter instead of restarting at 0 and silently overwriting (and
  * being hidden from) earlier accepted batches. Pass a custom
  * `checkpointLocation` only if it is equally stable for the life of
  * this store path; deleting the checkpoint while keeping the data
  * breaks the contract.
  *
  * Scale shape: per batch, signature work is per-row expressions over
  * the arrivals; the corpus check is the banded equi-join with the
  * same verify arithmetic as the static gate, run in the BATCH
  * topology ([[StreamingDedup.nearDupIngestFromSigBatch]]: delta side
  * broadcast, bucket and doc tables SCANNED in place — the
  * planner-chosen form shuffles both corpus-scale tables every
  * micro-batch once the corpus outgrows the broadcast threshold,
  * because the checkpoint-backed delta offers it no size estimate);
  * the intra-batch pass is bucket-join + star-contraction components
  * over BATCH-scale survivors; the append writes batch-scale rows.
  * Nothing corpus-proportional is recomputed or shuffled per batch. Caveat, documented: the
  * initial build caps degenerate buckets at `maxBucketSize`, while
  * incremental appends cannot re-cap ACROSS batches — a pathological
  * bucket degrades join fan-out gradually; run [[compact]]
  * (rebuild-with-global-caps) on a maintenance cadence, exactly like
  * compaction in any LSM-shaped store.
  */
final class CorpusIndexStore(spark: SparkSession, path: String,
    idCol: String = "doc_id", numHashes: Int = 128, bands: Int = 16,
    k: Int = 3, maxBucketSize: Int = 200) {

  private val bucketPath = s"$path/buckets"
  private val docPath = s"$path/docs"
  private val acceptedPath = s"$path/accepted"

  /** Batch-build the index (and seed the accepted corpus) from an
    * initial corpus — lands as `ingest_batch=-1`, wiping any prior
    * state under `path` INCLUDING the store-owned checkpoint (a new
    * store's stream must not skip source data an old checkpoint
    * committed). */
  def initialize(corpus: DataFrame, textCol: String): Unit =
    rebuild(corpus, textCol, wipeCheckpoint = true)

  private def rebuild(corpus: DataFrame, textCol: String,
      wipeCheckpoint: Boolean): Unit = {
    val hashed = Dedup.shingleHashes(corpus, textCol, idCol, k)
    val (buckets, docs) = Dedup.streamingCorpusIndex(hashed, idCol,
      numHashes, bands, maxBucketSize)
    // Hadoop FS delete — works for hdfs://s3a://local alike; NOTE: a
    // CUSTOM ingest checkpointLocation cannot be wiped here (the
    // store doesn't know it) — re-initializing a store whose stream
    // committed offsets under a custom checkpoint and restarting with
    // that same checkpoint would silently skip the already-committed
    // source data; reset the custom checkpoint yourself in that flow
    StorePaths.wipe(spark, Seq(bucketPath, docPath, acceptedPath) ++
      (if (wipeCheckpoint) Seq(s"$path/checkpoint") else Nil))
    buckets.write.mode("overwrite").parquet(s"$bucketPath/ingest_batch=-1")
    // docs base RANGE-SORTED on corpus_id (explicit count — an
    // implicit range repartition is AQE-coalescible into unprunable
    // wide row groups): the per-batch candidate fetch pushes a
    // chunked IN over corpus_id, and the sort is what lets parquet
    // min/max stats skip everything outside the candidate set
    docs.repartitionByRange(
        // SHUFFLE_PARTITIONS read DIRECTLY (typed — a non-numeric
        // platform value would NFE through conf.get(...).toInt; and
        // the numShufflePartitions shortcut returns AQE's
        // coalescePartitions.initialPartitionNum when set, hijacking
        // the documented spark.sql.shuffle.partitions knob — the
        // StorePaths.compactStore rule)
        spark.sessionState.conf.getConf(
          org.apache.spark.sql.internal.SQLConf.SHUFFLE_PARTITIONS),
        col("corpus_id"))
      .sortWithinPartitions(col("corpus_id"))
      .write.mode("overwrite").parquet(s"$docPath/ingest_batch=-1")
    corpus.select(col(idCol), col(textCol).as("text"))
      .write.mode("overwrite").parquet(s"$acceptedPath/ingest_batch=-1")
  }

  /** Current band-bucket table across the base build and every folded
    * batch. */
  def bucketTable: DataFrame =
    spark.read.parquet(bucketPath).drop("ingest_batch")

  /** Current verify-side doc table. */
  def docTable: DataFrame =
    spark.read.parquet(docPath).drop("ingest_batch")

  /** The curated corpus so far: base docs + every accepted arrival. */
  def accepted: DataFrame =
    spark.read.parquet(acceptedPath).drop("ingest_batch")

  /** How many `ingest_batch=*` partitions the bucket index holds —
    * one per ingested batch plus the base build. This store's
    * compaction pressure is twofold: partition accretion (per-batch
    * scans open every directory) AND degenerate buckets growing
    * un-capped ACROSS batches (the class-doc caveat — only the base
    * build applies `maxBucketSize` globally). */
  def ingestBatchCount: Long =
    StorePaths.ingestBatchCount(spark, bucketPath)

  /** True once the partition count crosses `maxBatches` — run
    * [[compact]] in an idle window (never mid-ingest: it wipes and
    * rewrites the tables an in-flight batch reads) to rebuild
    * with global bucket caps. The [[SentenceIndexStore
    * .needsCompaction]] cadence contract for this store. */
  def needsCompaction(maxBatches: Int = 64): Boolean =
    ingestBatchCount > maxBatches

  /** Start the growing ingest gate over a streaming (idCol, textCol)
    * frame. Per micro-batch: reject arrivals near-duplicating the
    * CURRENT index, dedup survivors within the batch (star-contraction
    * keepers), fold the accepted signatures into the index, and append
    * the accepted documents to the corpus — all idempotent per batch
    * id. */
  def ingest(stream: DataFrame, textCol: String,
      minJaccard: Double = 0.5,
      checkpointLocation: Option[String] = None): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, textCol, minJaccard, batchId)
      }
      // store-owned checkpoint: batch ids must be unique for the LIFE
      // of the store, not one query run (see class doc)
      .option("checkpointLocation",
        checkpointLocation.getOrElse(s"$path/checkpoint"))
      .start()

  /** One micro-batch of the gate — package-visible so the spec can
    * replay a batch id and prove idempotence directly. */
  private[streaming] def processBatch(batch: DataFrame, textCol: String,
      minJaccard: Double, batchId: Long): Unit = {
    // per-row signature expressions (the streaming-safe shapes used by
    // the static gate); materialized once — feeds the corpus check,
    // the intra-batch pass, and the append
    val withSig = batch
      .select(col(idCol).as("delta_id"), col(textCol).as("text"))
      // id = identity: an at-least-once source can redeliver a doc
      // WITHIN one micro-batch, and the batch topology's shingle
      // reattach requires unique delta_ids — keep one row per id
      .dropDuplicates("delta_id")
      .withColumn("gh_", Dedup.shingleHashSetExpr(col("text"), k))
      .withColumn("bks_", Dedup.bandBucketsExpr(
        Dedup.minhashSigExpr(col("gh_"), numHashes), numHashes, bands))
      .localCheckpoint(false)
    // (1) against the standing (grown) index — the SAME join as the
    // static gate. CRITICAL for replay correctness: exclude THIS batch
    // id's own partitions, so a redelivered batch sees the index
    // exactly as it stood before its first attempt — otherwise every
    // replayed doc near-dups its own folded signature and the
    // overwrite empties the partition (caught by the idempotence
    // spec). Partition pruning makes the exclusion free.
    // BATCH topology: delta side broadcast, both corpus tables
    // SCANNED — the planner-chosen form shuffled the corpus-scale
    // bucket and doc tables every micro-batch
    val dupOfCorpus = StreamingDedup.nearDupIngestFromSigBatch(withSig,
        spark.read.parquet(bucketPath)
          .where(col("ingest_batch") =!= batchId).drop("ingest_batch"),
        spark.read.parquet(docPath)
          .where(col("ingest_batch") =!= batchId).drop("ingest_batch"),
        minJaccard)
      .select(col("delta_id")).distinct()
    val survivors = withSig
      .join(dupOfCorpus, Seq("delta_id"), "left_anti")
      .localCheckpoint(false)
    // (2) within-batch: bucket-join candidates among survivors (batch
    // scale), exact verify, min-id keeper per duplicate component —
    // two clones arriving in the SAME micro-batch admit only one
    val ex = survivors.select(col("delta_id").as("id"), col("gh_"),
      col("bks_"), explode(col("bks_")).as("bucket"))
    val cand = ex.as("a").join(ex.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .where(col("a.bucket") === array_min(
        array_intersect(col("a.bks_"), col("b.bks_"))))
      .withColumn("ni", size(array_intersect(col("a.gh_"),
        col("b.gh_"))).cast("double"))
      .withColumn("jaccard", col("ni") / (size(col("a.gh_")) +
        size(col("b.gh_")) - col("ni")))
      .where(col("jaccard") >= minJaccard)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val keepers = Clusters.assign(survivors.select(col("delta_id")),
        "delta_id", cand)
      .where(col("is_keeper") === 1).select(col("delta_id"))
    val acceptedBatch = survivors
      .join(keepers, Seq("delta_id"), "left_semi")
      .localCheckpoint(false)
    // (3) idempotent fold-back: overwrite this batch id's partitions
    acceptedBatch
      .select(col("delta_id").as("corpus_id"), explode(col("bks_"))
        .as("bucket"))
      .select(col("bucket"), col("corpus_id"))
      .write.mode("overwrite")
      .parquet(s"$bucketPath/ingest_batch=$batchId")
    acceptedBatch
      .select(col("delta_id").as("corpus_id"), col("gh_").as("gh"),
        col("bks_").as("cbuckets"))
      .write.mode("overwrite")
      .parquet(s"$docPath/ingest_batch=$batchId")
    acceptedBatch.select(col("delta_id").as(idCol), col("text"))
      .write.mode("overwrite")
      .parquet(s"$acceptedPath/ingest_batch=$batchId")
  }

  // the three base partitions a completed rebuild commits — the
  // base-intact signal the crash protocol keys on (the
  // StorePaths.compactStore rule, hand-rolled here because this
  // store's compaction re-RUNS the dedup rather than copying tables)
  private def baseIntact: Boolean =
    Seq(bucketPath, docPath, acceptedPath).forall(p =>
      StorePaths.committed(spark, s"$p/ingest_batch=-1"))

  /** Maintenance compaction: rebuild the index from the accepted
    * corpus with GLOBAL bucket caps (the per-batch appends cannot cap
    * across batches) — lands as a fresh base build. The accepted
    * corpus is SNAPSHOTTED TO DURABLE PARQUET before the store is
    * wiped: a localCheckpoint-only copy lives in unreplicated
    * executor blocks, so one executor loss between the wipe and the
    * rewrite would destroy the corpus with no recovery path.
    *
    * CRASH SAFETY — the [[StorePaths.compactStore]] rules applied to
    * this store's rebuild-shaped compaction: a COMMITTED snapshot tmp
    * with an incomplete base build RESUMES (rebuilds from the tmp
    * instead of wiping it — the old code wiped the tmp first, so the
    * natural retry destroyed the only surviving copy of the corpus);
    * an UNcommitted tmp with an incomplete base refuses to proceed
    * (marker-less committer / mid-write crash — the tmp may be the
    * recovery artifact); a stale tmp alongside an INTACT base is
    * ignored and overwritten (resuming from it would roll back
    * batches ingested since). The store-owned checkpoint is KEPT:
    * rebuilding the index changes neither source offsets nor batch
    * numbering, and a wiped checkpoint on a replayable source would
    * re-deliver every historical offset. */
  def compact(textCol: String = "text"): Unit = {
    val tmp = s"$path/compact_tmp"
    val resuming = StorePaths.committed(spark, tmp) && !baseIntact
    if (!resuming) {
      if (StorePaths.exists(spark, tmp) && !baseIntact)
        throw new IllegalStateException(
          s"CorpusIndexStore.compact: snapshot tmp $tmp exists but " +
            "neither it nor the base build carry _SUCCESS markers — " +
            "cannot tell a crashed-mid-rebuild store (the tmp may be " +
            "the only surviving copy) from a marker-less committer's " +
            "healthy one. If the tmp is a complete corpus snapshot, " +
            "rebuild from it manually; if the live store is verified " +
            "intact, delete the tmp and compact again.")
      StorePaths.wipe(spark, Seq(tmp))
      accepted.write.mode("overwrite").parquet(tmp)
    }
    rebuild(spark.read.parquet(tmp), textCol, wipeCheckpoint = false)
    StorePaths.wipe(spark, Seq(tmp))
  }

  /** Takedown deletion — remove every document whose id appears in
    * `ids` (a frame carrying the store's `idCol` column) from the
    * accepted corpus, then rebuild the signature index from the
    * survivors (this store's compaction IS a rebuild, so deletion
    * rides it): the deleted documents' band buckets and signatures
    * leave the index with them, so a future arrival near-duplicating
    * ONLY deleted content is accepted — the membership evidence died
    * with the takedown. Crash contract: a PENDING crashed compaction
    * (committed tmp, incomplete base) REFUSES the deletion — resuming
    * would rebuild from the unfiltered snapshot and silently skip it;
    * run [[compact]] to completion first. A crash mid-deleteIds
    * leaves the already-FILTERED snapshot as the recovery artifact,
    * so the subsequent compact() completes the deletion. The
    * checkpoint is kept ([[compact]]'s rationale — doubly so here: a
    * replayed source would resurrect the taken-down documents, since
    * the membership evidence against them just died). */
  def deleteIds(ids: DataFrame, textCol: String = "text"): Unit = {
    val tmp = s"$path/compact_tmp"
    if (!baseIntact) {
      if (StorePaths.committed(spark, tmp))
        throw new IllegalStateException(
          "CorpusIndexStore.deleteIds: a previously crashed " +
            "compaction is pending (committed snapshot tmp, " +
            "incomplete base) — proceeding would rebuild from the " +
            "UNFILTERED snapshot and silently skip this deletion. " +
            "Run compact() to completion first, then deleteIds again.")
      throw new IllegalStateException(
        "CorpusIndexStore.deleteIds: the base build is incomplete " +
          "and no committed snapshot exists — the store is " +
          "mid-initialize or damaged; repair it before deleting.")
    }
    StorePaths.wipe(spark, Seq(tmp))
    accepted.join(ids.select(col(idCol)).distinct(), Seq(idCol),
        "left_anti")
      .write.mode("overwrite").parquet(tmp)
    rebuild(spark.read.parquet(tmp), textCol, wipeCheckpoint = false)
    StorePaths.wipe(spark, Seq(tmp))
  }
}
