package graft.streaming

import org.apache.spark.sql.SparkSession

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

  /** True when `path` holds a COMMITTED parquet write: the
    * `_SUCCESS` marker distinguishes a completed snapshot from the
    * debris of a write that died mid-commit — the signal compaction
    * recovery keys on. */
  def committed(spark: SparkSession, path: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(hp)
  }

  /** The snapshot → wipe → rewrite compaction choreography the text
    * index stores share — ONE implementation so the crash-safety
    * protocol can never silently diverge between stores.
    *
    * `tables`: per table, (current merged frame, durable snapshot
    * path, base-partition write path). `wipePaths`: everything to
    * clear between snapshot and rewrite (table roots, derived
    * artifacts, checkpoint). `finish` receives the re-read snapshot
    * frames (same order as `tables`) to rebuild derived artifacts.
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
    * the missing base fail loudly). */
  def compactStore(spark: SparkSession,
      tables: Seq[(() => org.apache.spark.sql.DataFrame, String, String)],
      wipePaths: Seq[String])(
      finish: Seq[org.apache.spark.sql.DataFrame] => Unit): Unit = {
    val tmps = tables.map(_._2)
    val basesIntact = tables.forall(t => committed(spark, t._3))
    val resuming = tmps.forall(t => committed(spark, t)) && !basesIntact
    if (!resuming) {
      wipe(spark, tmps)
      tables.foreach { case (current, tmp, _) =>
        current().write.mode("overwrite").parquet(tmp)
      }
    }
    wipe(spark, wipePaths)
    val reread = tables.map { case (_, tmp, base) =>
      val df = spark.read.parquet(tmp)
      df.write.mode("overwrite").parquet(base)
      df
    }
    finish(reread)
    wipe(spark, tmps)
  }
}
