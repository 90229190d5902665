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
}
