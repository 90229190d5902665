package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-portable uniform draw shared by the stochastic
  * operators' oracle twins (q97/q98 cascade, q99 wind): the first 8
  * md5 hex chars of `seed|key...` as a 32-bit integer mapped into
  * (0, 1) — the same (h+1)/(max+2) shape as
  * [[graft.disagg.Wind.uniformHash]], rebuilt nibble-for-nibble in
  * DuckDB by [[hex8]]. Production paths keep xxhash64 (Spark-only,
  * faster); the twins swap ONLY the draw so every branch downstream of
  * the randomness is hash-proven cross-engine. */
private[queries] object OracleDraw {

  def md5Draw(seed: Long, cols: Seq[Column]): Column =
    graft.functions.Draws.md5Uniform(seed, cols)

  /** DuckDB expression for the 32-bit integer value of the first 8 hex
    * chars of md5 expression `m` — matches Spark's
    * `conv(substring(m, 1, 8), 16, 10)`. */
  def hex8(m: String): String = (1 to 8).map(i =>
    s"(INSTR('0123456789abcdef', SUBSTR($m, $i, 1)) - 1) * " +
      s"${math.pow(16, 8 - i).toLong}.0").mkString(" + ")

  /** DuckDB expression for the EXACT BIGINT value of the first `n`
    * hex chars of md5 expression `m` — matches Spark's
    * `conv(substring(m, 1, n), 16, 10).cast("long")`. n <= 15 keeps
    * the value inside a signed 64-bit long. */
  def hexLong(m: String, n: Int): String = {
    require(n >= 1 && n <= 15)
    (1 to n).map(i =>
      s"CAST(INSTR('0123456789abcdef', SUBSTR($m, $i, 1)) - 1 " +
        s"AS BIGINT) * ${BigInt(16).pow(n - i)}").mkString(" + ")
  }
}
