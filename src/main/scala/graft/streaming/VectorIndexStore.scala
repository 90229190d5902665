package graft.streaming

import graft.similarity.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** A GROWING vector index at ingest — the streaming-store pattern
  * ([[SentenceIndexStore]] et al.) applied to the IVF-PQ inverted
  * file: embeddings arrive in micro-batches, each batch is coarse-
  * assigned and residual-encoded under a model FROZEN at
  * [[initialize]] (the FAISS operating convention — codes are only
  * comparable across batches under one quantizer), and queries search
  * the whole accumulated index through
  * [[Similarity.ivfPqTopKFromCodes]] without ever reading an
  * embedding column.
  *
  * Storage layout (parquet under `path`):
  *  - `model/centroids` (centroid_id, centroid) and `model/books`
  *    (j, c, w) — the frozen quantizer, written once
  *  - `codes/ingest_batch=<id>/centroid_id=<cell>/…` — the code
  *    rows, partitioned by cell INSIDE each batch partition, so the
  *    probe's `centroid_id IN (probed)` filter directory-prunes
  *    every batch at once
  *
  * Idempotence / restart: the shared store contract — each batch
  * OVERWRITES its own `ingest_batch=<id>` partition and the
  * checkpoint is store-owned by default, so a redelivered batch
  * rewrites itself and a restarted [[ingest]] resumes the batch
  * counter.
  *
  * Scale shape per batch: assignment and encode are exchange-free
  * map passes over the BATCH only ([[Similarity.ivfPqCodeTable]]);
  * nothing stored is read, shuffled, or recomputed at ingest — this
  * store has no membership check (it is an index, not a dedup gate;
  * run the dedup stores BEFORE indexing). Searches read nprobe cell
  * directories per query batch. Growth: one `ingest_batch` partition
  * per batch; [[needsCompaction]] polls the accretion and
  * [[compact]] folds everything into one base build (idle window,
  * never mid-ingest — it wipes and rewrites the code tree; the
  * store-owned checkpoint is PRESERVED so a restarted ingest cannot
  * replay already-indexed offsets, see [[compact]]), keeping
  * the centroid_id layout. The model is NEVER retrained by
  * compaction: re-encoding history under a drifted quantizer would
  * silently change every stored code; retrain = re-[[initialize]].
  *
  * Reference framing: melodist has no vector store — this is part of
  * the beyond-reference training-data-pipeline surface (the ANN
  * family's storage half). */
final class VectorIndexStore(spark: SparkSession, path: String,
    idCol: String = "vec_id", vecCol: String = "embedding",
    nlist: Int = 8, m: Int = 8, ksub: Int = 16,
    sampleSize: Int = 2048, seed: Long = 42, iterations: Int = 5,
    distributedTrain: Boolean = false) {

  private val codesPath = s"$path/codes"
  private val centPath = s"$path/model/centroids"
  private val bookPath = s"$path/model/books"

  /** Batch-build: train the quantizer on the seed corpus (coarse
    * k-means on a hash-ranked sample + codebooks on its residuals —
    * [[Similarity.ivfPqTrain]]; with `distributedTrain` the coarse
    * fit runs as exchange-free Lloyd passes over the WHOLE corpus
    * instead of a driver sample — [[Similarity.ivfPqTrainDistributed]],
    * the large-nlist form), persist it, and land the corpus'
    * codes as `ingest_batch=-1`, wiping prior state under `path`. */
  def initialize(corpus: DataFrame): Unit = {
    val (cents, books) =
      if (distributedTrain) Similarity.ivfPqTrainDistributed(corpus,
        vecCol, idCol, nlist, m, ksub, sampleSize, seed, iterations,
        // the store's ONE iterations knob governs the coarse fit on
        // BOTH paths (it does on the driver path) — without this the
        // distributed Lloyd count silently pins at its default and
        // tuning `iterations` changes only the codebooks
        lloydIters = iterations)
      else Similarity.ivfPqTrain(corpus, vecCol, idCol,
        nlist, m, ksub, sampleSize, seed, iterations)
    StorePaths.wipe(spark, Seq(codesPath, s"$path/model",
      s"$path/checkpoint"))
    writeModel(cents, books)
    cachedModel = Some((cents, books))
    writeBatch(corpus, -1L, cents, books)
  }

  // the model is IMMUTABLE after initialize (class doc), so it is
  // read from parquet at most once per store instance — a per-batch
  // re-read would cost two extra driver collects every micro-batch
  // and every search for nothing
  @volatile private var cachedModel
      : Option[(Array[Array[Double]], Array[Array[Array[Double]]])] =
    None

  private def writeModel(cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]]): Unit = {
    import spark.implicits._
    cents.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(centPath)
    (for {
      j <- books.indices; c <- books(j).indices
    } yield (j, c, books(j)(c).toSeq)).toDF("j", "c", "w")
      .coalesce(1).write.mode("overwrite").parquet(bookPath)
  }

  private def writeBatch(batch: DataFrame, batchId: Long,
      cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]]): Unit =
    Similarity.ivfPqCodeTable(batch, vecCol, idCol, cents, books)
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$codesPath/ingest_batch=$batchId")

  /** The frozen quantizer — read back from parquet once per store
    * instance, cached thereafter (it cannot change except through
    * [[initialize]], which refreshes the cache; mutating `model/` on
    * disk underneath a live instance is unsupported). */
  def model: (Array[Array[Double]], Array[Array[Array[Double]]]) =
    cachedModel.getOrElse {
      val cents = spark.read.parquet(centPath)
        .orderBy(col("centroid_id")).collect()
        .map(_.getSeq[Double](1).toArray)
      val rows = spark.read.parquet(bookPath)
        .orderBy(col("j"), col("c")).collect()
        .map(r =>
          (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      val mOut = rows.map(_._1).max + 1
      val books = Array.tabulate(mOut) { j =>
        rows.filter(_._1 == j).sortBy(_._2).map(_._3)
      }
      val loaded = (cents, books)
      cachedModel = Some(loaded)
      loaded
    }

  /** All code rows so far (base build + every folded batch). */
  def codeTable: DataFrame =
    spark.read.parquet(codesPath).drop("ingest_batch")

  /** Top-k ANN over the whole accumulated index — reads codes of the
    * probed cells only (directory-pruned), never an embedding. */
  def topK(queries: DataFrame, queryIdCol: String, k: Int,
      nprobe: Int = 4): DataFrame = {
    val (cents, books) = model
    Similarity.ivfPqTopKFromCodes(codeTable, queries, vecCol,
      queryIdCol, k, cents, books, nprobe)
  }

  /** [[topK]] for CORPUS-SCALE query tables
    * ([[Similarity.ivfPqTopKManyQueries]] — kernel cell assignment,
    * centroid_id shuffle join, direct-ADC kernel, zero driver
    * collects): the batch-sweep form, legal past `MaxQueryCollect`.
    * Reads the WHOLE compressed index once instead of directory-
    * pruning — the right scan when most cells are probed by someone,
    * which a corpus-scale query set guarantees. */
  def topKManyQueries(queries: DataFrame, queryIdCol: String, k: Int,
      nprobe: Int = 4): DataFrame = {
    val (cents, books) = model
    Similarity.ivfPqTopKManyQueries(codeTable, queries, vecCol,
      queryIdCol, k, cents, books, nprobe)
  }

  /** [[topK]] with exact re-ranking ([[Similarity.ivfPqTopKRefined]]
    * — the FAISS refine step): over-fetch refineFactor×k candidates
    * from the compressed index, re-score them against their exact
    * vectors, keep the true top k. The store holds codes only, so the
    * caller supplies the full-precision `corpus` (idCol, vecCol)
    * table the index was built from — the fetch is a pruned id
    * lookup into it, never a re-scan. */
  def topKRefined(queries: DataFrame, queryIdCol: String, k: Int,
      corpus: DataFrame, nprobe: Int = 4,
      refineFactor: Int = 4): DataFrame = {
    val (cents, books) = model
    Similarity.ivfPqTopKRefined(codeTable, corpus, queries, vecCol,
      idCol, queryIdCol, k, cents, books, nprobe, refineFactor)
  }

  /** How many `ingest_batch=*` partitions the index holds — one per
    * ingested batch plus the base; the [[UrlIndexStore]] cadence
    * contract (partition accretion is this store's compaction
    * pressure — cell pruning still works across batches, but every
    * probed cell is one tiny file per batch). */
  def ingestBatchCount: Long =
    StorePaths.ingestBatchCount(spark, codesPath)

  /** True once the partition count crosses `maxBatches` — run
    * [[compact]] in an idle window. */
  def needsCompaction(maxBatches: Int = 64): Boolean =
    ingestBatchCount > maxBatches

  /** Start the growing ingest over a streaming (idCol, vecCol)
    * frame. The model must exist ([[initialize]] first). */
  def ingest(stream: DataFrame,
      checkpointLocation: Option[String] = None): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId)
      }
      .option("checkpointLocation",
        checkpointLocation.getOrElse(s"$path/checkpoint"))
      .start()

  /** One micro-batch: encode under the frozen model, overwrite this
    * batch's partition. Package-visible so the spec can replay a
    * batch id and prove idempotence.
    *
    * GUARD: ingest refuses while the base build is missing. The text
    * stores get this for free — their per-batch membership reads the
    * stored table, so a mid-compaction (wiped) store fails loudly —
    * but this store reads nothing stored at ingest, and a batch
    * landed into a crashed-mid-compaction store would be silently
    * WIPED by the subsequent compact() resume (which restores only
    * the pre-crash snapshot). Finish `compact()` before restarting
    * ingest. */
  private[graft] def processBatch(batch: DataFrame,
      batchId: Long): Unit = {
    require(StorePaths.exists(spark, s"$codesPath/ingest_batch=-1"),
      "VectorIndexStore: base build missing — the store is " +
        "mid-compaction (run compact() to completion before " +
        "ingesting; a compaction resume would wipe this batch) or " +
        "was never initialized")
    val (cents, books) = model
    writeBatch(batch, batchId, cents, books)
  }

  /** Maintenance compaction — the shared [[StorePaths.compactStore]]
    * protocol (crash-resume, stale-snapshot protection): fold every
    * `ingest_batch=*` partition into one base build, PRESERVING the
    * centroid_id directory layout (`CompactTable.partitionCol`) so
    * the probe's pruning contract survives the fold. Codes are
    * snapshot-copied, never re-encoded: the model is frozen.
    *
    * The store-owned checkpoint is KEPT (unlike the text stores,
    * which wipe it): folding batch partitions into the base changes
    * neither source offsets nor batch numbering, and this store has
    * no membership gate — a wiped checkpoint would make a restarted
    * ingest on a replayable source (file drop-dir, Kafka earliest)
    * re-deliver every already-indexed offset into fresh
    * `ingest_batch=*` partitions, duplicating every historical
    * corpus_id in topK results with no error anywhere. The text
    * stores survive that replay through their membership check; this
    * store's protection is the preserved checkpoint. */
  def compact(): Unit = compactImpl(None)

  /** Takedown deletion — the GDPR path a production corpus index
    * needs: remove every code row whose corpus id appears in `ids`
    * (a frame carrying the store's `idCol` column), under the SAME
    * snapshot protocol as [[compact]] (deletion IS a compaction with
    * an anti-join — crash-resume restores the already-filtered
    * snapshot, so a crashed delete never resurrects the ids).
    * Deleted ids never surface in [[topK]] again; re-ingesting the
    * same id later re-indexes it (the index has no tombstones — it
    * is not a dedup gate). The model is untouched: a handful of
    * deletions does not drift a quantizer trained on a sample, and
    * re-encoding history under a retrained one would silently change
    * every stored code (retrain = re-[[initialize]]). */
  def deleteIds(ids: DataFrame): Unit = {
    // eager pin at deletion scale: the frame is consumed inside the
    // snapshot closure after reads of the live store begin
    val del = ids.select(col(idCol).as("corpus_id")).distinct()
      .localCheckpoint(true)
    compactImpl(Some(del))
  }

  private def compactImpl(del: Option[DataFrame]): Unit =
    StorePaths.compactStore(spark,
      Seq(StorePaths.CompactTable(
        () => del.fold(codeTable)(d =>
          codeTable.join(d, Seq("corpus_id"), "left_anti")),
        s"$path/compact_tmp_codes",
        s"$codesPath/ingest_batch=-1",
        partitionCol = Some("centroid_id"))),
      Seq(codesPath),
      pendingDeletion = del.isDefined) { _ => () }
}
