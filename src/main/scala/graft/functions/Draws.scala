package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic uniform draws as column expressions.
  *
  * `md5Uniform` is the cross-engine-portable draw: the first 8 md5 hex
  * chars of `seed|key...` as a 32-bit integer mapped into (0, 1) with
  * the (h+1)/(max+2) shape of [[graft.disagg.Wind.uniformHash]]. Any
  * engine that can md5 a string replays it nibble-for-nibble (DuckDB
  * side: `graft.queries.OracleDraw.hex8`), which is what makes the
  * stochastic-operator oracle twins (q97/q98/q99) and the coherent
  * train/val/test split hash-checkable. Production hot paths keep
  * xxhash64 (one 64-bit hash instead of an md5 + string round-trip);
  * this is the portable twin, defined ONCE so the operator, the oracle
  * twins, and the specs can never drift on the offset or denominator.
  */
object Draws {
  def md5Uniform(seed: Long, cols: Seq[Column]): Column =
    (conv(substring(md5(concat_ws("|",
        (lit(seed.toString) +: cols.map(_.cast("string"))): _*)), 1, 8),
      16, 10).cast("double") + 1.0) / 4294967298.0
}
