package graft.core

import org.apache.spark.sql.DataFrame

/** Loud, once-per-operator warning when a windowed operator is about
  * to run UNPARTITIONED (`partitionCols = Nil`) over a large input.
  *
  * The single-series mapping is the faithful per-station contract
  * (reference semantics operate on one station's frame), and every
  * windowed operator here takes `partitionCols` to distribute — with
  * per-key output identical to the per-station run (MultiStationSpec).
  * But a naive caller invoking the single-series form on a fleet-scale
  * table gets the whole input sorted in ONE partition: correct, and a
  * scale cliff. Spark's own WindowExec warning fires at execution
  * time, deep in the logs, with no pointer to the fix — this guard
  * names the graft operator and the remedy at plan-construction time.
  *
  * The size check reads the optimizer's `sizeInBytes` estimate — no
  * Spark job is triggered. Estimates for file sources come from file
  * sizes; in-memory test frames are tiny, so the guard stays silent
  * through the correctness gates. */
object ScaleGuard {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** ~10⁷ rows of (timestamp, a few doubles): past this, a
    * single-partition sort stops being a sane plan. Mutable so tests
    * (and unusual deployments) can tune it. */
  val defaultThresholdBytes: BigInt = BigInt(256L * 1024 * 1024)
  @volatile var thresholdBytes: BigInt = defaultThresholdBytes

  private val warned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Test hook: invoked with (operator, estimatedBytes) on EVERY trip
    * (the log line itself fires once per operator per JVM). */
  @volatile private[graft] var probe: (String, BigInt) => Unit = null

  /** Call at the head of an operator that is about to build a window
    * with no partition columns. */
  def unpartitionedWindow(df: DataFrame, op: String): Unit = {
    // the size estimate runs the optimizer over the input's lineage —
    // skip it entirely once this operator has warned (unless a test
    // probe wants every trip), so loops like the cascade level chain
    // pay at most one estimation per operator
    if (warned.contains(op) && probe == null) return
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (size > thresholdBytes) {
      val p = probe
      if (p != null) p(op, size)
      // joins of sources without statistics multiply Catalyst's
      // Long.MaxValue default, yielding absurd 40-digit estimates —
      // report those as "unknown" instead of a meaningless number
      val shown = if (size > BigInt(Long.MaxValue)) "unknown (>8 EiB; no reliable statistics)"
        else s"$size bytes"
      if (warned.add(op))
        log.warn(s"$op is running UNPARTITIONED over an input " +
          s"estimated at $shown: the whole input will be sorted " +
          "in ONE partition. Pass partitionCols (the station/series " +
          "id) to distribute - per-key output is identical to the " +
          "single-series run.")
    }
  }

  /** Test hook: forget which operators have already logged. */
  private[graft] def reset(): Unit = warned.clear()
}
