package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pair lists — turns pairwise
  * dedup output (exact, MinHash-LSH, SimHash, embedding-cosine) into
  * transitive duplicate CLUSTERS, so "keep one representative per
  * group" survives chains (A~B, B~C but A!~C must still collapse to
  * one keeper).
  *
  * Two algorithms, identical output (each node labelled with the
  * minimum node id of its component):
  *
  *  - [[connectedComponentsStar]] (the default under [[assign]]):
  *    alternating large-star/small-star contraction (Kiveris et al.,
  *    "Connected Components in MapReduce and Beyond", SoCC 2014).
  *    Round count is O(log n) in practice and provably polylog in the
  *    worst case, INDEPENDENT of component diameter — a chain of
  *    length d collapses in ~log d rounds, not d. Per round: two
  *    map-side-combined min groupBys, two equi-joins, two distincts.
  *  - [[connectedComponents]]: min-label propagation. Two hash
  *    shuffles per round (edge-label join + min groupBy), but rounds
  *    needed = component diameter — cheaper per round, so it wins
  *    when duplicate families are known to be blob-shaped (diameter
  *    2-3); loses badly on chain-shaped families (templated page
  *    sequences, the classic LSH chain).
  *
  * Scale: each round of either algorithm touches only |E| edge rows
  * (and |V| label rows for propagation), hash-partitioned, nothing
  * collected to the driver. Min-aggregations combine map-side, so a
  * giant component's root (degree ≈ component size) never
  * concentrates rows on one task the way a partition-window would.
  * Per-round state is re-materialized via localCheckpoint so the
  * plan/lineage doesn't grow with iterations (the same guard the
  * cascade levels use). Checkpoint blocks of superseded rounds are
  * reclaimed by the ContextCleaner once the driver GCs the old
  * DataFrame references — peak block-manager usage can transiently
  * hold a few rounds' edge sets (Spark exposes no safe explicit
  * release for localCheckpoint blocks still referenced by a live
  * plan); the edge set SHRINKS every round on real duplicate graphs,
  * so the sum is bounded by a small multiple of |E|. Both closures
  * fail loudly at `maxIter` rather than silently splitting a true
  * duplicate family into several keepers.
  */
object Clusters {

  // the CC internals key on LONG node ids; a string/UUID id column
  // would cast to NULL, silently dropping every edge and returning
  // all-singleton labels (dedup would keep everything, coherentSplit
  // would leak near-dups across splits, no error anywhere) — fail
  // loudly at plan build instead. Map non-numeric ids to longs
  // (xxhash64 or a dense id table) before clustering.
  private def requireIntegralIds(edges: DataFrame, srcCol: String,
      dstCol: String): Unit =
    Seq(srcCol, dstCol).foreach { c =>
      val dt = edges.schema(c).dataType
      val ok = dt match {
        case org.apache.spark.sql.types.ByteType |
            org.apache.spark.sql.types.ShortType |
            org.apache.spark.sql.types.IntegerType |
            org.apache.spark.sql.types.LongType => true
        // scale-0 decimals (the type Parquet/JDBC sources commonly
        // surface integer ids as) cast to long losslessly up to 18
        // digits; precision 19 can exceed Long.MaxValue (~9.22e18)
        // and the overflow casts to NULL in non-ANSI mode — the
        // silent-edge-loss failure this guard exists to catch
        case d: org.apache.spark.sql.types.DecimalType =>
          d.scale == 0 && d.precision <= 18
        case _ => false
      }
      require(ok,
        s"cluster id column '$c' must be an integral type (or a " +
          s"scale-0 decimal of precision <= 18), got " +
          s"${dt.simpleString}: a non-numeric id casts to NULL and " +
          "every edge silently disappears")
    }

  /** Component label (min member id) per node appearing in `edges`,
    * by alternating large-star/small-star contraction — O(log n)
    * rounds regardless of component diameter (see object doc).
    * Input: an undirected pair list, one row per pair, any
    * orientation; self-loops tolerated. Output: (node, label) for
    * every distinct endpoint in `edges` (self-loop-only nodes label
    * as themselves), matching [[connectedComponents]] row-for-row. */
  def connectedComponentsStar(edges: DataFrame, srcCol: String = "id_a",
      dstCol: String = "id_b", maxIter: Int = 30): DataFrame =
    starWithRounds(edges, srcCol, dstCol, maxIter)._1

  /** [[connectedComponentsStar]] plus the round count it took —
    * package-private so ClustersSpec can assert the O(log n) bound
    * (a 64-chain must converge in ~log rounds, not 64). */
  private[text] def starWithRounds(edges: DataFrame, srcCol: String,
      dstCol: String, maxIter: Int): (DataFrame, Int) = {
    requireIntegralIds(edges, srcCol, dstCol)
    val raw = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
      .localCheckpoint(false) // feeds the node set AND the edge seed
    // every input endpoint gets a label row (parity with the
    // propagation variant, where a self-loop-only node emits itself)
    val nodes = raw.select(explode(array(col("a"), col("b"))).as("node"))
      .distinct()
    // canonical (lo < hi) distinct edge set; the loop preserves this
    // invariant, so `distinct` is set equality throughout
    var e = raw.where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("lo"),
        greatest(col("a"), col("b")).as("hi"))
      .distinct()
      .localCheckpoint() // eager: scanned from blocks every round
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // LARGE-STAR: per node u over the symmetric view, attach every
      // strictly larger neighbor v to m = min(Γ(u) ∪ {u}). m <= u < v,
      // so the output is already canonical and self-loop-free.
      val sym = e.select(col("lo").as("u"), col("hi").as("v"))
        .union(e.select(col("hi").as("u"), col("lo").as("v")))
      val mn = sym.groupBy("u").agg(min(col("v")).as("mn"))
      val large = sym.join(mn, Seq("u"))
        .where(col("v") > col("u"))
        .select(least(col("u"), col("mn")).as("lo"), col("v").as("hi"))
        .distinct()
        .localCheckpoint() // two consumers below: min groupBy + join
      // SMALL-STAR: per node hi, attach hi and all its smaller
      // neighbors to m = min of those neighbors. Both emissions have
      // m strictly smallest, so canonical again.
      val mn2 = large.groupBy("hi").agg(min(col("lo")).as("m"))
      val e2 = large.join(mn2, Seq("hi"))
        .where(col("lo") =!= col("m"))
        .select(col("m").as("x"), col("lo").as("y"))
        .union(mn2.select(col("m").as("x"), col("hi").as("y")))
        .select(col("x").as("lo"), col("y").as("hi"))
        .distinct()
        .localCheckpoint()
      // fixpoint ⇔ e2 is a star forest (no lo ever appears as a hi):
      // large-star and small-star are both identities on star forests,
      // and the paper shows only depth-1 forests are fixed points. One
      // left-semi + limit(1) — no full-count action, short-circuits.
      converged = e2.join(
        e2.select(col("lo").as("hi")).distinct(), Seq("hi"), "left_semi")
        .limit(1).count() == 0L
      e = e2
      iter += 1
    }
    require(converged,
      s"connectedComponentsStar did not converge in $maxIter rounds — " +
        "raise maxIter (polylog bound makes this astronomically " +
        "unlikely on real duplicate graphs)")
    // e is now (root, member) star edges with root = component min
    val starLabels = e.select(col("hi").as("node"), col("lo").as("label"))
      .union(e.select(col("lo").as("node"), col("lo").as("label")))
      .distinct()
    val labels = nodes.join(starLabels, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("label"), col("node")).as("label"))
    (labels, iter)
  }

  /** Component label (min member id) per node appearing in `edges`.
    * Input: an undirected pair list, one row per pair, any orientation.
    * Output: (node, label) — nodes absent from `edges` are singletons
    * and are NOT emitted; callers left-join and coalesce to own id. */
  def connectedComponents(edges: DataFrame, srcCol: String = "id_a",
      dstCol: String = "id_b", maxIter: Int = 50): DataFrame = {
    requireIntegralIds(edges, srcCol, dstCol)
    val fwd = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // NOTE: pre-repartitioning sym by src would NOT save the per-round
    // edge shuffle — under AQE, localCheckpoint's LogicalRDD reports
    // UnknownPartitioning, so each round's join re-exchanges anyway and
    // the upfront shuffle is pure overhead (ClustersSpec pins this; if
    // a Spark upgrade starts preserving it, that test flags the
    // opportunity to cache the edge list pre-partitioned).
    val sym = fwd.union(
      fwd.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(false) // reused every round: scan edges once
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(min(col("label")).as("nbr"))
      val next = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr"), col("label")))
            .as("label"),
          (coalesce(col("nbr"), col("label")) < col("label")).as("chg"))
        .localCheckpoint() // eager: bounds lineage, one action per round
      changed = next.where(col("chg")).count()
      labels = next.select(col("node"), col("label"))
      iter += 1
    }
    // fail loudly: truncated propagation would silently split one true
    // duplicate family into several, marking multiple "keepers"
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter rounds " +
        s"($changed labels still changing) — the duplicate graph has " +
        "a longer chain than expected; raise maxIter")
    labels
  }

  /** Cluster assignment for every row of `df`: transitive closure over
    * near-dup `pairs`, singletons labelled with their own id.
    * Returns (idCol, cluster_id, cluster_size, is_keeper) where the
    * keeper is the minimum id of the cluster. Uses the star
    * contraction closure — O(log n) rounds even if a duplicate family
    * is chain-shaped, which is the failure mode a 100 TB corpus can't
    * rule out up front; both closures produce identical labels.
    *
    * CONTRACT: `pairs` must be computed over (a superset of) `df`'s
    * rows such that every cluster's MINIMUM id is present in `df` —
    * the stored-pairs pattern is fine as long as any upstream filter
    * runs AFTER assignment. If a pre-filter removed a family's min-id
    * doc, that cluster_id names an absent row: is_keeper = 0 for
    * every surviving member and a `where(is_keeper === 1)` consumer
    * drops the WHOLE family instead of keeping one copy. Use
    * [[assignKeepBest]] (keeper ranked among PRESENT rows) when `df`
    * may be a filtered view of the frame the pairs came from. */
  def assign(df: DataFrame, idCol: String, pairs: DataFrame,
      srcCol: String = "id_a", dstCol: String = "id_b"): DataFrame = {
    val cc = connectedComponentsStar(pairs, srcCol, dstCol)
      .withColumnRenamed("node", idCol)
    val labelled = df.select(col(idCol))
      .join(cc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("label"), col(idCol)).as("cluster_id"))
    val sizes = labelled.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labelled.join(sizes, Seq("cluster_id"))
      .select(col(idCol), col("cluster_id"), col("cluster_size"),
        (col(idCol) === col("cluster_id")).cast("long").as("is_keeper"))
  }

  /** [[assign]] with a caller-chosen keeper: production dedup keeps
    * the BEST copy of a duplicate family (longest text, highest
    * quality score, newest crawl), not the lowest id. `order` ranks
    * rows within each cluster (idCol is appended as the final
    * tiebreak, so the choice is always deterministic). Returns the
    * input columns plus cluster_id, cluster_size, keeper_rank
    * (1-based) and is_keeper.
    *
    * Scale shape: [[assign]]'s closure plus ONE window partitioned by
    * cluster_id — partition sizes are duplicate-family sizes, bounded
    * by construction (and families large enough to skew a task are
    * exactly what upstream exact-dedup removes first). */
  def assignKeepBest(df: DataFrame, idCol: String, pairs: DataFrame,
      order: Seq[Column], srcCol: String = "id_a",
      dstCol: String = "id_b"): DataFrame =
    keepBestFromClusters(df, idCol,
      assign(df, idCol, pairs, srcCol, dstCol), order)

  /** [[assignKeepBest]] from STORED labels (an [[assign]] output) —
    * the stored-labels twin of [[splitFromClusters]]: a curated
    * corpus computes its cluster closure once and every keeper policy
    * (longest, highest-quality, newest) re-ranks the stored frame
    * with one window instead of re-running the contraction loop.
    * Identical output to [[assignKeepBest]] by construction — that
    * entry point now just closes the graph and delegates here. */
  def keepBestFromClusters(df: DataFrame, idCol: String,
      clusters: DataFrame, order: Seq[Column]): DataFrame = {
    require(order.nonEmpty, "pass at least one ordering column")
    require(clusters.columns.contains("cluster_id"),
      "keepBestFromClusters expects an assign() output with cluster_id")
    val clash = Seq("cluster_id", "cluster_size", "keeper_rank",
      "is_keeper").filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has reserved column(s): ${clash.mkString(", ")}")
    val labels = clusters
      .select(col(idCol), col("cluster_id"), col("cluster_size"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(order :+ col(idCol): _*)
    df.join(labels, Seq(idCol))
      .withColumn("keeper_rank", row_number().over(w).cast("long"))
      .withColumn("is_keeper",
        (col("keeper_rank") === 1L).cast("long"))
  }

  /** Leakage-free train/val/test split: every near-dup CLUSTER lands
    * atomically in ONE split, so no eval example has a near-duplicate
    * in train by construction — splitting on raw document hashes
    * leaks, because a doc and its paraphrase draw independently.
    * Returns [[assign]]'s columns plus `split` ∈ train/val/test.
    *
    * The draw is md5 over (seed, cluster label): deterministic under
    * any partitioning/retry, portable across engines, and re-drawable
    * by seed. Fractions are expected proportions of CLUSTERS (hash
    * uniformity makes document proportions track them when cluster
    * sizes are not pathological).
    *
    * Scale shape: one row expression on top of [[assign]]'s output —
    * no shuffle beyond what cluster assignment already does. */
  def coherentSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      valFrac: Double, testFrac: Double, seed: Long = 42L,
      srcCol: String = "id_a", dstCol: String = "id_b"): DataFrame =
    splitFromClusters(assign(df, idCol, pairs, srcCol, dstCol),
      valFrac, testFrac, seed)

  /** [[coherentSplit]]'s draw over an EXISTING [[assign]] output — the
    * stored-labels shape: a production corpus computes cluster
    * assignment once, stores it, and every consumer (keeper drop,
    * split, per-cluster stats) reads the stored frame instead of
    * re-running the component closure. Expects a `cluster_id` column;
    * all input columns pass through. */
  def splitFromClusters(clusters: DataFrame, valFrac: Double,
      testFrac: Double, seed: Long = 42L): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac < 1,
      "val/test fractions must be nonnegative and sum below 1")
    require(clusters.columns.contains("cluster_id"),
      "splitFromClusters expects an assign() output with cluster_id")
    // `split` is an OUTPUT column: a stored-labels frame that already
    // carries a prior split assignment would be silently overwritten
    require(!clusters.columns.contains("split"),
      "input already has a split column — drop or rename it first")
    val u = graft.functions.Draws.md5Uniform(seed, Seq(col("cluster_id")))
    clusters.withColumn("split",
      when(u < testFrac, "test")
        .when(u < testFrac + valFrac, "val")
        .otherwise("train"))
  }

  /** End-to-end corpus dedup: MinHash-LSH near-dup pairs → transitive
    * clusters → keep one representative (min id) per cluster. The
    * production 100 TB path: LSH bucketing for candidates, exact
    * Jaccard verify, then component-wise collapse — no quadratic stage
    * anywhere. */
  def dropNearDuplicates(df: DataFrame, textCol: String, idCol: String,
      minJaccard: Double = 0.5, numHashes: Int = 128): DataFrame = {
    val pairs = Dedup.nearDupPairs(df, textCol, idCol,
      minJaccard = minJaccard, numHashes = numHashes)
    val keep = assign(df, idCol, pairs).where(col("is_keeper") === 1)
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }
}
