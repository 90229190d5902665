package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Timestamp normalization: the driver's generator has shipped `ts`
    * both as TIMESTAMP(NANOS) (readable only with
    * spark.sql.legacy.parquet.nanosAsLong=true, as nano longs) and as
    * unannotated micros with isAdjustedToUTC=false (which Spark 4 reads
    * as TIMESTAMP_NTZ). Normalize BOTH to TimestampType so downstream
    * `unix_micros`/window functions resolve: the session timezone is
    * pinned UTC, so NTZ→TIMESTAMP is a value-identical reinterpretation
    * of the same naive local time, and nano longs truncate to µs. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.dataType == LongType && (f.name == "ts" || f.name.endsWith("_ts")))
        acc.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
      else if (f.dataType == TimestampNTZType)
        acc.withColumn(f.name, col(f.name).cast(TimestampType))
      else acc
    }
  }

  /** The 100 TB station-fleet parquet layout: hive-partitioned by the
    * station keys (+ optionally month), rows time-sorted within each
    * file. Reads that filter on station/month prune whole directories
    * before any I/O (`PartitionFilters` in the scan), per-station
    * operators get their partition's data contiguous and pre-sorted,
    * and `maxRecordsPerFile` bounds file size under skewed stations.
    * One shuffle (the repartition on the layout keys) per write —
    * without it every task writes a sliver of every partition and the
    * sink emits tiny files. */
  def writeStationPartitioned(df: DataFrame, path: String,
      stationCols: Seq[String], tsCol: String = "timestamp",
      byMonth: Boolean = false, maxRecordsPerFile: Long = 5000000L)
      : Unit = {
    val (layoutCols, toWrite) =
      if (byMonth)
        (stationCols :+ "part_month",
          df.withColumn("part_month", date_format(col(tsCol), "yyyy-MM")))
      else (stationCols, df)
    toWrite
      .repartition(layoutCols.map(col): _*)
      .sortWithinPartitions((layoutCols ++ Seq(tsCol)).map(col): _*)
      .write
      .partitionBy(layoutCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }

  /** Read a `writeStationPartitioned` layout back; partition columns
    * come back as strings (hive dirs), data columns keep their types. */
  def readStationPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Materialize a [[graft.text.Curation.trainingOrder]] (or
    * `packGreedy`) frame as the training-shard layout a data loader
    * consumes: hive-partitioned by `shard`, rows sorted by `pos`
    * within each file, `maxRecordsPerFile` bounding the reader's unit
    * of work. The one repartition on `shard` is exactly the
    * clustering the per-shard `pos` window already computed with, so
    * the write adds no second semantic shuffle — a loader then reads
    * `shard=K` as one directory and streams rows in training order.
    * Epoch re-draws (trainingOrder with a bumped seed) land in a new
    * `path`. */
  def writeTrainingShards(df: DataFrame, path: String,
      shardCol: String = "shard", posCol: String = "pos",
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), col(posCol))
      .write
      .partitionBy(shardCol)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)

  /** Bucketed-table write for CO-LOCATED joins: two tables bucketed the
    * same way on the same key join with NO Exchange on either side —
    * at 100 TB that deletes the dominant shuffle of every fact-to-fact
    * join on the key. Bucketing needs the session catalog
    * (`saveAsTable`); `sortedBy` the key keeps bucket files
    * merge-join-ready. Read back with `spark.table(name)`. */
  def writeBucketed(df: DataFrame, name: String, bucketCols: Seq[String],
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(name)
}
