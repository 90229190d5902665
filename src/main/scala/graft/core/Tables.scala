package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver's parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The `events` table stores TIMESTAMP(NANOS), which Spark only reads
    * with spark.sql.legacy.parquet.nanosAsLong=true (as nano longs) —
    * normalize back to TimestampType (µs, truncating) transparently. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.dataType == LongType && (f.name == "ts" || f.name.endsWith("_ts")))
        acc.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
      else acc
    }
  }
}
