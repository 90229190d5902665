package graft.streaming

import graft.core.Graphs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** A GROWING link graph at ingest — the streaming-store pattern
  * applied to the edge table behind the [[graft.core.Graphs]] rank
  * family: a crawl discovers href edges in micro-batches, each batch
  * lands as its own partition, and ranks (plain / personalized /
  * weighted PageRank) are computed on demand over the ACCUMULATED
  * graph. The quality-prior workflow this serves: ingest the crawl's
  * host edges continuously, rank in an idle window, join the rank
  * onto documents as a filter/sampling weight.
  *
  * Storage layout (parquet under `path`):
  * `edges/ingest_batch=<id>/…` holding (src, dst, w) rows — w comes
  * from `weightCol` when the store is built with one (href counts),
  * else 1 per row. Edge semantics are MULTIGRAPH-by-accumulation:
  * the same (src, dst) re-observed in later batches (a re-crawl) ADDS
  * weight — rank methods aggregate parallel rows by summing w (the
  * [[Graphs.weightedPageRankMicros]] contract), so re-observation
  * strengthens a link rather than being lost. Weights are validated
  * at LANDING time (positive integers, in-plan `raise_error`), so a
  * bad batch fails at ingest, not at some later rank.
  *
  * Idempotence / restart: the shared store contract — each batch
  * OVERWRITES its own `ingest_batch=<id>` partition; the store-owned
  * checkpoint resumes the batch counter.
  *
  * Scale shape per batch: one validated map pass over the BATCH only
  * — nothing stored is read, shuffled, or recomputed at ingest (this
  * store has no membership gate; it is an edge log, not a dedup
  * structure). Ranks read the whole accumulated table — that is the
  * semantics of a global rank, and the per-iteration physics are
  * [[Graphs]]' two exchanges per round. [[compact]] folds the batch
  * partitions into one base AND aggregates parallel (src, dst) rows
  * into summed weights — rank-preserving by the weighted recurrence
  * (only Σw per pair matters) while shrinking a re-crawl-heavy log.
  *
  * Checkpoint rules (the round-13 store audit): [[compact]] and
  * [[deleteNodes]] KEEP the store-owned checkpoint — like
  * [[VectorIndexStore]], this store has no membership gate to absorb
  * a replay, so a wiped checkpoint + replayable source would
  * re-deliver every historical edge into fresh partitions (doubling
  * every weight, silently shifting every rank). Only [[initialize]]
  * wipes it. A deletion refuses the crash-resume path
  * (`pendingDeletion`) so a takedown can never silently no-op.
  *
  * Reference framing: melodist has no graph surface — this is part
  * of the beyond-reference training-data-pipeline layer (the rank
  * family's storage half). */
final class GraphEdgeStore(spark: SparkSession, path: String,
    srcCol: String = "src", dstCol: String = "dst",
    weightCol: Option[String] = None) {

  private val edgesPath = s"$path/edges"

  /** normalize + validate one batch to the stored (src, dst, w)
    * schema — the same loud positive-weight contract the rank
    * entry points enforce, applied where the data LANDS */
  private def normalized(batch: DataFrame): DataFrame = {
    val base = weightCol match {
      case Some(wc) =>
        batch.select(col(srcCol).as("src"), col(dstCol).as("dst"),
          col(wc).cast("long").as("w"))
      case None =>
        batch.select(col(srcCol).as("src"), col(dstCol).as("dst"),
          lit(1L).as("w"))
    }
    base
      .where(col("src").isNotNull && col("dst").isNotNull)
      .withColumn("w",
        when(col("w").isNull || col("w") <= 0L,
          raise_error(concat(
            lit("GraphEdgeStore: weight must be a positive integer, " +
              "got "), col("w").cast("string"),
            lit(" on edge "), col("src").cast("string"),
            lit(" -> "), col("dst").cast("string"))).cast("long"))
          .otherwise(col("w")))
  }

  /** Batch-build: land the seed graph as `ingest_batch=-1`, wiping
    * prior state under `path` (including the checkpoint — a NEW
    * store's stream must not skip offsets an old one committed). */
  def initialize(edges: DataFrame): Unit = {
    StorePaths.wipe(spark, Seq(edgesPath, s"$path/checkpoint"))
    writeBatch(edges, -1L)
  }

  private def writeBatch(batch: DataFrame, batchId: Long): Unit =
    normalized(batch)
      .write.mode("overwrite")
      .parquet(s"$edgesPath/ingest_batch=$batchId")

  /** All edge rows so far (base + every batch) — parallel (src, dst)
    * rows NOT yet aggregated; rank methods sum them. */
  def edgeTable: DataFrame =
    spark.read.parquet(edgesPath).drop("ingest_batch")

  /** PageRank over the accumulated graph — weight-proportional votes
    * with re-observed edges summed ([[Graphs.weightedPageRankMicros]]).
    * Returns (node, rank_micros). */
  def pageRank(iterations: Int = 10,
      dampingMicros: Long = 850000L): DataFrame =
    Graphs.weightedPageRankMicros(edgeTable, "src", "dst", "w",
      iterations, dampingMicros)

  /** Personalized (seed-teleport) rank over the accumulated weighted
    * graph — the trust-prior form. `seeds` carries `seedCol`. */
  def personalizedPageRank(seeds: DataFrame, seedCol: String,
      iterations: Int = 10,
      dampingMicros: Long = 850000L): DataFrame =
    Graphs.weightedPersonalizedPageRankMicros(edgeTable, "src",
      "dst", "w", seeds, seedCol, iterations, dampingMicros)

  /** Start the growing ingest over a streaming edge frame. */
  def ingest(stream: DataFrame,
      checkpointLocation: Option[String] = None): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId)
      }
      .option("checkpointLocation",
        checkpointLocation.getOrElse(s"$path/checkpoint"))
      .start()

  /** One micro-batch. GUARD: refuses while the base build is missing
    * — this store reads nothing stored at ingest, so a batch landed
    * into a crashed-mid-compaction store would be silently wiped by
    * the compaction resume (the [[VectorIndexStore.processBatch]]
    * contract). */
  private[graft] def processBatch(batch: DataFrame,
      batchId: Long): Unit = {
    require(StorePaths.exists(spark, s"$edgesPath/ingest_batch=-1"),
      "GraphEdgeStore: base build missing — the store is " +
        "mid-compaction (run compact() to completion before " +
        "ingesting; a compaction resume would wipe this batch) or " +
        "was never initialized")
    writeBatch(batch, batchId)
  }

  /** Batch-partition accretion ([[UrlIndexStore]] cadence contract). */
  def ingestBatchCount: Long =
    StorePaths.ingestBatchCount(spark, edgesPath)

  /** True once the partition count crosses `maxBatches` — run
    * [[compact]] in an idle window. */
  def needsCompaction(maxBatches: Int = 64): Boolean =
    ingestBatchCount > maxBatches

  /** Maintenance compaction — the shared [[StorePaths.compactStore]]
    * snapshot protocol: fold every `ingest_batch=*` partition into
    * one base AND aggregate parallel (src, dst) rows into summed
    * weights. Rank-preserving by construction (the weighted
    * recurrence consumes only Σw per pair) while a re-crawl-heavy
    * edge log shrinks toward its distinct-pair size. The store-owned
    * checkpoint is KEPT — see the class doc's replay rationale. */
  def compact(): Unit = compactImpl(None)

  /** Takedown deletion — remove a NODE and every edge touching it
    * (src or dst side): the host-removal path. Same snapshot protocol
    * as [[compact]] (deletion IS a compaction with an anti-join); a
    * crashed delete refuses the resume path instead of silently
    * no-opping. Re-ingesting edges of the node later re-adds them
    * (an edge log has no tombstones). `ids` carries a `node`
    * column. */
  def deleteNodes(ids: DataFrame): Unit = {
    // eager pin at deletion scale: consumed inside the snapshot
    // closure after reads of the live store begin
    val del = ids.select(col("node")).distinct().localCheckpoint(true)
    compactImpl(Some(del))
  }

  private def compactImpl(del: Option[DataFrame]): Unit =
    StorePaths.compactStore(spark,
      Seq(StorePaths.CompactTable(
        () => {
          val kept = del.fold(edgeTable)(d =>
            edgeTable
              .join(d.select(col("node").as("src")), Seq("src"),
                "left_anti")
              .join(d.select(col("node").as("dst")), Seq("dst"),
                "left_anti"))
          kept.groupBy(col("src"), col("dst"))
            .agg(sum(col("w")).as("w"))
        },
        s"$path/compact_tmp_edges",
        s"$edgesPath/ingest_batch=-1")),
      Seq(edgesPath),
      pendingDeletion = del.isDefined) { _ => () }
}
