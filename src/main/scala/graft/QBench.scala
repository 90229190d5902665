package graft
import org.apache.spark.sql.SparkSession

/** Single-query micro-bench: `runMain graft.QBench <sfDir> <query...>`
  * runs each named SparkEntry query 3 times and prints per-pass wall
  * time — the profiling companion to [[Bench]] (which times the whole
  * registry min-of-2) and [[ExplainTool]] (which prints plans). Pass 1
  * carries JIT/codegen warm-up; judge variants on the later passes. */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names; pass <- 1 to 3) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[qbench] $n pass$pass ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
    }
    spark.stop()
  }
}
