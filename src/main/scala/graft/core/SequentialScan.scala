package graft.core

import org.apache.spark.sql.{DataFrame, Encoders, Row, types}
import org.apache.spark.sql.functions.col

/** Secondary-sort scaffold shared by the sequential-recurrence
  * operators (EWMA, sequence packing): hash-repartition by `keyCols`,
  * sort each partition by (keyCols ++ orderCols), and stream rows
  * through a per-key state machine — the honest distributed shape for
  * a recurrence no window can express. One shuffle; O(1) state; a
  * partition streams its rows, so arbitrarily long series per key fit.
  * Deterministic under AQE/retries (hash partition + in-partition
  * sort, no rand).
  *
  * `init` produces (state, appended fields) for the FIRST row of each
  * key; `step` for every subsequent row. Null/na handling lives in the
  * callers' row accessors — single-sourced per operator, not per
  * scaffold copy. */
object SequentialScan {
  def perKey[S](df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], addedFields: Seq[types.StructField])(
      init: Row => (S, Seq[Any]))(
      step: (S, Row) => (S, Seq[Any])): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty,
      "perKey needs key and order columns")
    val cols = df.columns
    val keyIdx = keyCols.map(c => cols.indexOf(c))
    require(keyIdx.forall(_ >= 0), "missing key column")
    val outSchema = addedFields.foldLeft(df.schema)(_ add _)
    df.repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
      .mapPartitions { rows =>
        var curKey: Seq[Any] = null
        var state: Any = null
        rows.map { r =>
          val k = keyIdx.map(r.get)
          val (s2, out) =
            if (k != curKey) { curKey = k; init(r) }
            else step(state.asInstanceOf[S], r)
          state = s2
          Row.fromSeq(r.toSeq ++ out)
        }
      }(Encoders.row(outSchema))
  }
}
