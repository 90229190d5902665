package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** One driver-checkable query: a Spark DataFrame producer over a scale-factor
  * directory plus (when SQL-expressible) an equivalent DuckDB oracle SQL.
  *
  * Numeric-match playbook (the driver hash-compares values after sorting
  * columns by name):
  *  - Sums/avgs of double columns: sum exact integer micro-units
  *    (`CAST(ROUND(x * 1e6) AS BIGINT)`) then divide back — immune to
  *    float summation-order differences between Spark and DuckDB.
  *  - Money-ish columns with fixed decimals: cast to DECIMAL before SUM.
  *  - Transcendental scalar outputs: `round(expr, 6)` in both engines.
  *  - Every query ORDER BYs its key columns for deterministic output.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryRegistry {
  private val defs = mutable.LinkedHashMap.empty[String, QueryDef]

  def register(q: QueryDef): Unit = synchronized {
    require(!defs.contains(q.name), s"duplicate query ${q.name}")
    defs(q.name) = q
  }

  def register(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Unit =
    register(QueryDef(name, fn, Some(oracle)))

  /** Register without an oracle (driver records a rows-only check). */
  def registerRowsOnly(name: String)(
      fn: (SparkSession, String) => DataFrame): Unit =
    register(QueryDef(name, fn, None))

  def all: Map[String, (SparkSession, String) => DataFrame] = {
    Providers.load()
    defs.view.mapValues(_.fn).toMap
  }

  def oracles: Map[String, String] = {
    Providers.load()
    defs.values.flatMap(q => q.oracle.map(q.name -> _)).toMap
  }
}

/** Forces every query-provider object to register itself exactly once. */
private object Providers {
  @volatile private var loaded = false
  def load(): Unit = synchronized {
    if (!loaded) {
      loaded = true
      graft.queries.RelationalQueries.init()
      graft.queries.TimeSeriesQueries.init()
      graft.queries.MeteoQueries.init()
      graft.queries.DisaggQueries.init()
      graft.queries.CascadeQueriesImpl.init()
      graft.queries.TextQueries.init()
      graft.queries.SimilarityQueries.init()
      graft.queries.CurationQueriesImpl.init()
    }
  }
}
