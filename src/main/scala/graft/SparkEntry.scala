package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Temperature disaggregation end-to-end: daily prep windows, hourly
    * explode-join, piecewise cosine — the engine's whole skeleton. */
  def entry(spark: SparkSession): DataFrame =
    QueryRegistry.all("q40_temp_sine_min_max")(spark,
      "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryRegistry.all
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = QueryRegistry.oracles
}
