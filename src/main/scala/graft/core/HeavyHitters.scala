package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters — the mergeable frequent-items summary
  * (Misra & Gries 1982; merge rule per Agarwal et al. 2012,
  * "Mergeable Summaries"). The scale story: exact frequent-item
  * discovery is a corpus-wide groupBy whose shuffle carries every
  * distinct item; the MG summary finds every item with frequency
  * > N/(k+1) from ONE scan with k counters per partition and a
  * driver merge of ≤ partitions·k candidate rows — no shuffle at
  * all. Curation uses: boilerplate-line discovery ahead of
  * [[graft.text.Curation.dedupLines]]' exact join, hot-vocabulary /
  * hot-URL monitors at ingest, skew-key detection before a join.
  *
  * Guarantees (proved in the spec, not just cited):
  *  - NO FALSE NEGATIVES above threshold: any item with true count
  *    > N/(k+1) is in the summary, under ANY partitioning.
  *  - Bounds: for every reported item,
  *    `count_min ≤ true ≤ count_min + err` with the reported global
  *    `err ≤ N/(k+1)` (sum of per-partition decrement totals).
  *
  * The CONTENTS beyond the guarantee depend on partition layout
  * (which below-threshold items survive is order-dependent) — this
  * is a sketch-by-design component like the Bloom index: spec-gated,
  * with the exact groupBy as its verification twin. */
object HeavyHitters {

  /** One reported item: lower bound, and the summary-wide slack
    * (true count ≤ count_min + err for every item; err is shared). */
  final case class Hit(item: String, countMin: Long, err: Long)

  /** Misra–Gries over one iterator with k counters: returns the
    * surviving (item, lower-bound) counters plus the total decrement
    * (this partition's error contribution). */
  private[core] def mgPartition(items: Iterator[String], k: Int)
      : (Map[String, Long], Long) = {
    val counters = new java.util.HashMap[String, Long]()
    var decremented = 0L
    items.foreach { it =>
      val cur = counters.get(it)
      if (cur != 0L || counters.containsKey(it)) {
        counters.put(it, cur + 1L)
      } else if (counters.size < k) {
        counters.put(it, 1L)
      } else {
        // decrement-all: one unit leaves every counter AND the
        // incoming item — N/(k+1) total across the stream
        decremented += 1L
        val dead = new java.util.ArrayList[String]()
        val e = counters.entrySet().iterator()
        while (e.hasNext) {
          val kv = e.next()
          if (kv.getValue == 1L) dead.add(kv.getKey)
          else kv.setValue(kv.getValue - 1L)
        }
        dead.forEach(d => counters.remove(d))
      }
    }
    val out = scala.collection.mutable.Map.empty[String, Long]
    counters.forEach((i, c) => out(i) = c)
    (out.toMap, decremented)
  }

  /** Merge summaries (Agarwal et al.): add counts itemwise, then
    * reduce to the top k by subtracting the (k+1)-largest count —
    * error adds, guarantees survive. */
  private[core] def mgMerge(parts: Seq[(Map[String, Long], Long)],
      k: Int): (Map[String, Long], Long) = {
    val sums = scala.collection.mutable.Map.empty[String, Long]
    var err = 0L
    parts.foreach { case (m, e) =>
      err += e
      m.foreach { case (i, c) => sums(i) = sums.getOrElse(i, 0L) + c }
    }
    if (sums.size > k) {
      // deterministic (count DESC, item ASC) order: the cut value is
      // the (k+1)-th count; subtracting it keeps exactly the items
      // strictly above it (ties at the cut drop — still ≤ k kept)
      val cut = sums.toSeq.sortBy { case (i, c) => (-c, i) }
        .apply(k)._2
      err += cut
      val kept = sums.collect {
        case (i, c) if c > cut => i -> (c - cut)
      }
      (kept.toMap, err)
    } else (sums.toMap, err)
  }

  /** The frequent-items summary of `itemCol` (cast to string; nulls
    * skipped): at most k [[Hit]]s, each `count_min ≤ true ≤
    * count_min + err`, containing EVERY item with true count
    * > N/(k+1). One mapPartitions scan (k counters per task), one
    * driver merge of ≤ partitions·k rows — no shuffle. */
  def heavyHitters(df: DataFrame, itemCol: String, k: Int): Seq[Hit] = {
    require(k >= 1, "k must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val parts = df
      .select(col(itemCol).cast("string").as("it_"))
      .where(col("it_").isNotNull)
      .as[String]
      .mapPartitions { rows =>
        val (m, e) = mgPartition(rows, k)
        Iterator.single((m.toSeq, e))
      }
      .collect()
    val (merged, err) = mgMerge(
      parts.map { case (m, e) => (m.toMap, e) }.toSeq, k)
    merged.toSeq.sortBy { case (i, c) => (-c, i) }
      .map { case (i, c) => Hit(i, c, err) }
  }

  /** [[heavyHitters]] over the elements of an ARRAY column (e.g.
    * tokens, lines): same single scan, the explode happens inside the
    * partition iterator — no row blow-up ever leaves the task. */
  def heavyHittersExploded(df: DataFrame, arrayCol: Column,
      k: Int): Seq[Hit] = {
    require(k >= 1, "k must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val parts = df
      .select(arrayCol.cast("array<string>").as("arr_"))
      .where(col("arr_").isNotNull)
      .as[Seq[String]]
      .mapPartitions { rows =>
        val (m, e) = mgPartition(
          rows.flatMap(_.iterator.filter(_ != null)), k)
        Iterator.single((m.toSeq, e))
      }
      .collect()
    val (merged, err) = mgMerge(
      parts.map { case (m, e) => (m.toMap, e) }.toSeq, k)
    merged.toSeq.sortBy { case (i, c) => (-c, i) }
      .map { case (i, c) => Hit(i, c, err) }
  }
}
