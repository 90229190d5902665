package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, max}

/** Filesystem plumbing shared by the ingest stores. */
private[streaming] object StorePaths {

  /** Recursive delete through the Hadoop FileSystem API — works for
    * hdfs://, s3a://, and local paths alike. (A `java.io.File`
    * recursion silently NO-OPS on non-local URIs: `exists()` is false
    * for `hdfs://…`, nothing is deleted, and a re-initialized store
    * keeps its stale `ingest_batch=*` partitions — ghost documents in
    * the rebuilt index, arrivals rejected against a corpus that no
    * longer exists.) */
  def wipe(spark: SparkSession, paths: Seq[String]): Unit =
    paths.foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(hp)) fs.delete(hp, true)
    }

  /** True when `path` exists at all — the cheap half of the
    * compaction guard (is there a snapshot tmp we could destroy?). */
  def exists(spark: SparkSession, path: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(hp)
  }

  /** True when `path` holds a COMMITTED parquet write: the
    * `_SUCCESS` marker distinguishes a completed snapshot from the
    * debris of a write that died mid-commit — the signal compaction
    * recovery keys on. */
  def committed(spark: SparkSession, path: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(hp)
  }

  /** Busiest-shard Bloom sub-filter count of a per-batch `blooms/`
    * artifact directory — the shared cadence metric behind the
    * stores' `needsCompaction`: every ingested batch adds one
    * capacity-sized sub-filter per shard it touches, so storage and
    * the per-batch OR-merge cost grow linearly with batch count
    * between compactions. Returns 0 (never throws) for a store with
    * no blooms yet, so a cadence poll can start before the first
    * batch. */
  def bloomSubFiltersPerShard(spark: SparkSession,
      bloomPath: String): Long = {
    if (!exists(spark, bloomPath)) 0L
    else try {
      val row = spark.read.parquet(bloomPath)
        .groupBy(col("shard")).count()
        .agg(max(col("count"))).head()
      if (row.isNullAt(0)) 0L else row.getLong(0)
    } catch {
      // an existing-but-empty directory (wiped store) has no schema
      case _: org.apache.spark.sql.AnalysisException => 0L
    }
  }

  /** Count of `ingest_batch=*` partition directories under a stored
    * table root — the compaction-cadence metric for stores WITHOUT a
    * bloom artifact to measure ([[UrlIndexStore]],
    * [[CorpusIndexStore]]): every micro-batch adds one partition
    * directory of batch-scale files, so a long-running ingest
    * degrades the per-batch stored-table scan into thousands of
    * tiny-file opens (and, for the corpus store, leaves degenerate
    * buckets un-capped across batches) until [[compactStore]] folds
    * everything back into one base partition. Returns 0 (never
    * throws) for a missing or empty root, so a cadence poll can start
    * before the first batch. */
  def ingestBatchCount(spark: SparkSession, tableRoot: String): Long = {
    val hp = new org.apache.hadoop.fs.Path(tableRoot)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hp)) 0L
    else fs.listStatus(hp).count(s => s.isDirectory &&
      s.getPath.getName.startsWith("ingest_batch=")).toLong
  }

  /** One table in a [[compactStore]] run: `current` produces the live
    * merged frame, `tmp` is its durable snapshot path, `base` the
    * rewritten base-partition path. `sortCol`, when set, range-
    * partitions AND sorts the base rewrite on that column so every
    * parquet file/row group covers a disjoint, narrow key range —
    * min/max row-group (and page-index) statistics then let a
    * per-micro-batch membership probe with a pushable key predicate
    * skip everything outside its probe set instead of reading the
    * whole index (the O(index)-per-batch read the unsorted layout
    * forces once the store outgrows page cache). Membership content
    * is unchanged — only the physical layout moves. `partitionCol`,
    * when set, `partitionBy`s the base rewrite on that column —
    * [[VectorIndexStore]]'s inverted-file layout, where the probe
    * prunes whole cell DIRECTORIES rather than row groups. */
  final case class CompactTable(
      current: () => DataFrame,
      tmp: String,
      base: String,
      sortCol: Option[String] = None,
      partitionCol: Option[String] = None)

  /** The snapshot → wipe → rewrite compaction choreography the text
    * index stores share — ONE implementation so the crash-safety
    * protocol can never silently diverge between stores.
    *
    * `tables`: one [[CompactTable]] per stored table. `wipePaths`:
    * everything to clear between snapshot and rewrite (table roots,
    * derived artifacts, checkpoint). `finish` receives the re-read
    * snapshot frames (same order as `tables`) to rebuild derived
    * artifacts.
    *
    * Crash safety: the snapshots are the recovery artifact, deleted
    * only after the rewrite AND `finish` complete. RESUME fires only
    * when committed snapshots exist AND the base build is NOT fully
    * committed — i.e. a predecessor actually died between its wipe
    * and its rewrite. Stale snapshots left by a crash AFTER a
    * complete rewrite are ignored (the live store, which may have
    * ingested new batches since, is re-snapshotted and the leftovers
    * overwritten) — resuming from them would roll those batches
    * back, a silent data loss. Crash at any point → call compact()
    * again; no ingest can land while the store is mid-wipe (reads of
    * the missing base fail loudly).
    *
    * GUARD against marker-less committers: `committed()` keys on
    * parquet `_SUCCESS` markers, which some committers suppress
    * (`mapreduce.fileoutputcommitter.marksuccessfuljobs=false`, some
    * object-store committers) — there `resuming` can never fire, and
    * the non-resume path would wipe snapshot tmps that are the ONLY
    * surviving copy after a genuine crash-between-wipe-and-rewrite.
    * So the non-resume path refuses to destroy an existing tmp unless
    * the base build is provably COMMITTED. Not merely readable: a
    * direct-write committer's crash mid-rewrite leaves a PARTIAL base
    * whose schema resolves fine — accepting readability would wipe
    * the complete snapshot and re-snapshot from the partial table, a
    * silent loss of every row in the unwritten files. When in doubt
    * this throws with recovery instructions; an operator who has
    * verified the live store simply deletes the leftover tmps. */
  /** `pendingDeletion`: set by the stores' `deleteIds` path. The
    * RESUME branch restores the PREVIOUS run's snapshot verbatim and
    * never invokes `current()` — correct for a crashed plain
    * compaction, but a deletion riding it would silently NO-OP (the
    * stale snapshot is unfiltered, the anti-join closure never runs,
    * and the call returns success while the takedown ids stay fully
    * searchable). A pending deletion therefore REFUSES the resume
    * with instructions instead of lying. */
  def compactStore(spark: SparkSession, tables: Seq[CompactTable],
      wipePaths: Seq[String], pendingDeletion: Boolean = false)(
      finish: Seq[DataFrame] => Unit): Unit = {
    val tmps = tables.map(_.tmp)
    val basesIntact = tables.forall(t => committed(spark, t.base))
    val resuming = tmps.forall(t => committed(spark, t)) && !basesIntact
    if (resuming && pendingDeletion)
      throw new IllegalStateException(
        "compactStore: a previously crashed compaction is pending " +
          "(committed snapshot tmps exist and the base build is " +
          "incomplete) — resuming would restore the UNFILTERED " +
          "snapshot and silently skip this deletion. Run compact() " +
          "to completion first, then deleteIds again.")
    if (!resuming) {
      val tmpsPresent = tmps.filter(exists(spark, _))
      if (tmpsPresent.nonEmpty && !basesIntact)
        throw new IllegalStateException(
          s"compactStore: snapshot tmp(s) ${tmpsPresent.mkString(", ")} " +
            "exist but neither they nor the base build carry _SUCCESS " +
            "markers — cannot tell a crashed-mid-rewrite store (the " +
            "tmps are the only surviving copy) from a marker-less " +
            "committer's healthy one. Refusing to wipe the possible " +
            "recovery artifact. If the tmps are a complete snapshot, " +
            "restore them to the base paths manually; if the live " +
            "store is verified intact, delete the tmp dirs and " +
            "compact again (or re-enable mapreduce." +
            "fileoutputcommitter.marksuccessfuljobs).")
      wipe(spark, tmps)
      tables.foreach { t =>
        t.current().write.mode("overwrite").parquet(t.tmp)
      }
    }
    wipe(spark, wipePaths)
    val reread = tables.map { t =>
      val df = spark.read.parquet(t.tmp)
      val out = t.sortCol match {
        case Some(c) =>
          // EXPLICIT partition count: an implicit repartitionByRange
          // is AQE-coalescible, and a coalesced write produces a few
          // wide-range row groups that nothing can prune — the
          // session's shuffle.partitions is the operator's knob for
          // how finely the sorted base splits
          // typed accessor, not conf.get(...).toInt: platforms that
          // set the conf non-numerically (e.g. "auto") would NFE.
          // SHUFFLE_PARTITIONS read DIRECTLY: the numShufflePartitions
          // shortcut returns AQE's coalescePartitions.initialPartitionNum
          // when that is set, and this split is the documented
          // spark.sql.shuffle.partitions operator knob
          df.repartitionByRange(
              spark.sessionState.conf.getConf(
                org.apache.spark.sql.internal.SQLConf.SHUFFLE_PARTITIONS),
              col(c))
            .sortWithinPartitions(col(c))
        case None => df
      }
      val writer = out.write.mode("overwrite")
      t.partitionCol.fold(writer)(writer.partitionBy(_))
        .parquet(t.base)
      df
    }
    finish(reread)
    wipe(spark, tmps)
  }
}
