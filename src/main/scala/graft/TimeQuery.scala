package graft

import org.apache.spark.sql.SparkSession

/** Times selected registered queries at a given sf dir —
  * `runMain graft.TimeQuery <sfDir> <cpus> <query...>` — the per-query
  * micro-bench used while iterating on a single operator's plan. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = if (args.length > 1) args(1) else "32"
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = qs(n)(spark, sfDir).count()
      println(f"TIMEQ $n%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$cnt")
    }
    spark.stop()
  }
}
