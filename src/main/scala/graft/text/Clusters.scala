package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pair lists — turns pairwise
  * dedup output (exact, MinHash-LSH, SimHash, embedding-cosine) into
  * transitive duplicate CLUSTERS, so "keep one representative per
  * group" survives chains (A~B, B~C but A!~C must still collapse to
  * one keeper).
  *
  * Algorithm: distributed min-label propagation. Every node starts
  * labelled with its own id; each round every node takes the minimum
  * label among itself and its neighbors; at fixpoint each node carries
  * the minimum node id of its component. Each round is two hash
  * shuffles (edge-label join + min groupBy), both map-side combined,
  * and rounds needed = graph diameter.
  *
  * Scale: near-dup similarity graphs are unions of small dense
  * clusters (duplicate families), so the diameter — and hence the
  * round count — is small and independent of corpus size; each round
  * touches only |V| label rows and |E| edge rows, hash-partitioned.
  * Label state is re-materialized per round via localCheckpoint so the
  * plan/lineage doesn't grow with iterations (the same guard the
  * cascade levels use). For adversarially chain-shaped graphs raise
  * `maxIter`; the loop stops as soon as a round changes nothing.
  */
object Clusters {

  /** Component label (min member id) per node appearing in `edges`.
    * Input: an undirected pair list, one row per pair, any orientation.
    * Output: (node, label) — nodes absent from `edges` are singletons
    * and are NOT emitted; callers left-join and coalesce to own id. */
  def connectedComponents(edges: DataFrame, srcCol: String = "id_a",
      dstCol: String = "id_b", maxIter: Int = 50): DataFrame = {
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
    * keeper is the minimum id of the cluster. */
  def assign(df: DataFrame, idCol: String, pairs: DataFrame,
      srcCol: String = "id_a", dstCol: String = "id_b"): DataFrame = {
    val cc = connectedComponents(pairs, srcCol, dstCol)
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
