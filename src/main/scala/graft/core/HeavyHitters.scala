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

  /** One reported LONG item (e.g. a 64-bit content hash): same
    * bounds contract as [[Hit]]. */
  final case class LongHit(item: Long, countMin: Long, err: Long)

  /** Misra–Gries over LONG items with primitive-key counters
    * (`mutable.LongMap`, open addressing — no per-op boxing or string
    * hashing): the scan form for hashed-content streams. Emits
    * primitive (keys, counts) arrays — nothing tuple- or map-shaped
    * crosses the serialization boundary. Same guarantees as
    * [[mgPartition]]. */
  private[core] def mgPartitionLongs(items: Iterator[Long], k: Int)
      : (Array[Long], Array[Long], Long) = {
    val counters = scala.collection.mutable.LongMap.empty[Long]
    var decremented = 0L
    items.foreach { it =>
      if (counters.contains(it)) {
        counters(it) = counters(it) + 1L
      } else if (counters.size < k) {
        counters(it) = 1L
      } else {
        decremented += 1L
        val dead = scala.collection.mutable.ArrayBuffer.empty[Long]
        counters.foreachEntry { (key, c) =>
          if (c == 1L) dead += key else counters(key) = c - 1L
        }
        dead.foreach(counters.subtractOne)
      }
    }
    val keys = new Array[Long](counters.size)
    val counts = new Array[Long](counters.size)
    var i = 0
    counters.foreachEntry { (key, c) =>
      keys(i) = key; counts(i) = c; i += 1
    }
    (keys, counts, decremented)
  }

  /** [[heavyHitters]] over the LONG elements of an ARRAY column —
    * the hashed-content form ([[graft.text.Curation.dedupLinesApprox]]
    * sketches `xxhash64(line)` instead of line text: primitive-key
    * counters, no string churn, and ≤ partitions·k LONGS to the
    * driver instead of strings). The driver merge stays primitive
    * too: a LongMap accumulate and a counts-only sort for the
    * (k+1)-largest cut — never a tuple sort over partitions·k
    * entries (measured seconds at 32×2^17). Nulls inside arrays are
    * skipped. */
  def heavyHittersLongsExploded(df: DataFrame, arrayCol: Column,
      k: Int): Seq[LongHit] = {
    require(k >= 1, "k must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val parts = df
      .select(arrayCol.cast("array<bigint>").as("arr_"))
      .where(col("arr_").isNotNull)
      .as[Seq[java.lang.Long]]
      .mapPartitions { rows =>
        val (keys, counts, e) = mgPartitionLongs(
          rows.flatMap(_.iterator.filter(_ != null)
            .map(_.longValue())), k)
        Iterator.single((keys, counts, e))
      }
      .collect()
    val sums = scala.collection.mutable.LongMap.empty[Long]
    var err = 0L
    parts.foreach { case (keys, counts, e) =>
      err += e
      var i = 0
      while (i < keys.length) {
        sums(keys(i)) = sums.getOrElse(keys(i), 0L) + counts(i)
        i += 1
      }
    }
    if (sums.size > k) {
      // the mgMerge cut: the (k+1)-largest COUNT (item tiebreak is
      // irrelevant to the cut VALUE); keep strictly above, so ties
      // at the cut drop — identical semantics to mgMerge, found by
      // one primitive sort of the counts alone
      val counts = new Array[Long](sums.size)
      var i = 0
      sums.foreachValue { c => counts(i) = c; i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - 1 - k)
      err += cut
      val kept = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long)]
      sums.foreachEntry { (key, c) =>
        if (c > cut) kept += ((key, c - cut))
      }
      kept.sortBy { case (i2, c) => (-c, i2) }
        .map { case (i2, c) => LongHit(i2, c, err) }.toSeq
    } else {
      sums.toSeq.sortBy { case (i2, c) => (-c, i2) }
        .map { case (i2, c) => LongHit(i2, c, err) }
    }
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
