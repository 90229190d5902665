package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph ranking over an edge table. The curation use is
  * link-graph quality signals: host-level PageRank over the crawl's
  * href graph is a standard document-quality prior (the Common-Crawl
  * host ranking shape), joined back onto documents as a filter or a
  * sampling weight next to the heuristic scores in
  * [[graft.text.TextAnalysis]]. The connectivity half of graph work
  * (components / transitive dedup clusters) lives in
  * [[graft.text.Clusters]]' star contraction; this module is the
  * rank half.
  *
  * Arithmetic is EXACT-INTEGER in micros (the [[graft.similarity.KMeans]]
  * convention): ranks are `bigint` millionths of probability mass, every
  * division floors, every sum is an exact long sum — so results are a
  * pure function of the graph under any partitioning, executor count or
  * AQE re-plan, and a cross-engine oracle can replay the recurrence
  * bit-for-bit. The float-summation alternative makes rank ties
  * layout-dependent, which is exactly what a hash-gated pipeline cannot
  * have. */
object Graphs {

  private val One = 1000000L

  /** PageRank with exact integer arithmetic. `edges` is a directed
    * edge table; rows are deduplicated (simple graph — pass
    * pre-weighted multiplicities as repeated rows AFTER removing this
    * distinct yourself if you want a multigraph, or keep the default
    * semantics: one vote per distinct (src,dst)).
    *
    * Ranks are micros OF THE UNIFORM SHARE — 1e6 means "the rank a
    * node has in a perfectly uniform graph"; divide by n·1e6 for the
    * probability form. This n-scaled formulation is what keeps
    * integer resolution INDEPENDENT of graph size: the naive
    * probability-mass form (total mass = 1e6 micros) floors every
    * per-node rank to 0-3 micros beyond ~1e5 nodes — measured on the
    * ScaleSmoke graph before this formulation — while here every
    * graph starts at 1e6 per node regardless of n.
    *
    * Recurrence, all in integer micros (D = `dampingMicros`):
    * {{{
    *   r0(v)   = One
    *   contrib = (D * (r(src) div outdeg(src))) div One   per edge
    *   r'(v)   = (One - D) + sum(contrib into v)
    * }}}
    * Per-edge damping BEFORE the sum keeps every intermediate within
    * long range even on mass-concentrating graphs (a node would need
    * ~2^63/D ≈ 1e13 micros — 10^7 × the uniform share — to overflow),
    * and floor division makes the recurrence replayable: no float
    * summation order, no half-way rounding rule anywhere
    * (the [[graft.text.Curation]] quantizeFloor argument). Mass
    * floors leak a few micros per node per iteration and dangling
    * nodes (no out-edges) leak their whole damped share — the
    * standard no-redistribution simplification; ranks are a
    * RANKING signal, not a probability measure that must sum to n·One.
    *
    * Scale shape: one `distinct` + one out-degree aggregation up
    * front; each iteration is ONE join of the (edge ⋈ outdeg) table
    * with the current ranks on `src` (both sides hash-partition on
    * src; the static side is pinned so it shuffles once, not once per
    * iteration) and ONE groupBy(dst) with map-side partial sums —
    * the canonical two-exchange PageRank step. Rank lineage is cut
    * with a lazy localCheckpoint each iteration, so plan size stays
    * O(1) in `iterations` instead of exploding exponentially.
    * Returns (node, rank_micros). */
  def pageRankMicros(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 10, dampingMicros: Long = 850000L): DataFrame =
    rankLoop(prepare(simpleEdges(edges, srcCol, dstCol)), iterations,
      dampingMicros, seeds = None, seedCol = "")

  /** A pre-normalized, pinned rank-ready graph: `nodeSet` is the
    * endpoint set (one `node` column, distinct, lazily
    * localCheckpoint'd) and `eo` the static per-iteration join side
    * (src, dst, w, wsum = Σ w over src's out-edges, pinned). Build it
    * once per stored graph with [[prepareSimple]]/[[prepareWeighted]]
    * and hand it to every rank variant ([[pageRankMicrosOn]] and
    * friends) — the multi-rank production shape (a pipeline
    * materializes its host graph once; plain, personalized and
    * weighted ranks all read the same artifact). Results are
    * bit-identical to the one-shot entry points: the prepared frames
    * are exactly the ones [[rankLoop]] builds internally. */
  final case class PreparedGraph private[core] (
      nodeSet: DataFrame, eo: DataFrame)

  /** [[PreparedGraph]] of the SIMPLE (deduplicated, unweighted) graph
    * — the [[pageRankMicros]] normalization. */
  def prepareSimple(edges: DataFrame, srcCol: String,
      dstCol: String): PreparedGraph =
    prepare(simpleEdges(edges, srcCol, dstCol))

  /** [[PreparedGraph]] of the WEIGHTED multigraph (parallel edges
    * summed, positive weights enforced) — the
    * [[weightedPageRankMicros]] normalization. */
  def prepareWeighted(edges: DataFrame, srcCol: String,
      dstCol: String, weightCol: String): PreparedGraph =
    prepare(weightedEdges(edges, srcCol, dstCol, weightCol))

  /** [[pageRankMicros]] over a [[PreparedGraph]] (simple or weighted
    * — the unweighted recurrence IS the weighted one at w=1). */
  def pageRankMicrosOn(g: PreparedGraph, iterations: Int = 10,
      dampingMicros: Long = 850000L): DataFrame =
    rankLoop(g, iterations, dampingMicros, seeds = None, seedCol = "")

  /** [[personalizedPageRankMicros]] over a [[PreparedGraph]]. */
  def personalizedPageRankMicrosOn(g: PreparedGraph, seeds: DataFrame,
      seedCol: String, iterations: Int = 10,
      dampingMicros: Long = 850000L): DataFrame =
    rankLoop(g, iterations, dampingMicros, seeds = Some(seeds),
      seedCol = seedCol)

  /** PageRank with WEIGHTED edges — the real crawl-graph form (href
    * counts between hosts): each src splits its vote proportionally,
    * `contrib = (D * ((rank * w) div W_src)) div One` with
    * `W_src = Σ w` over src's out-edges. Still pure floor-division
    * long arithmetic (exact while `rank · w` fits a long —
    * ~9e18/1e9-micro hub ranks leaves weights up to ~1e9, far past
    * real href counts), and scaling ALL weights by a constant leaves
    * every rank bit-identical (`floor(r·cw / cW) = floor(r·w / W)`,
    * spec-pinned) — only the proportions matter. Rows with the same
    * (src, dst) SUM their weights (parallel links add up — the
    * multigraph semantics the unweighted form's distinct() removes);
    * non-positive and null weights are rejected at plan-build.
    * Returns (node, rank_micros). */
  def weightedPageRankMicros(edges: DataFrame, srcCol: String,
      dstCol: String, weightCol: String, iterations: Int = 10,
      dampingMicros: Long = 850000L): DataFrame =
    rankLoop(prepare(weightedEdges(edges, srcCol, dstCol, weightCol)),
      iterations, dampingMicros, seeds = None, seedCol = "")

  /** [[weightedPageRankMicros]] with [[personalizedPageRankMicros]]'
    * seed-restricted teleport — both axes at once (a weighted host
    * graph ranked from a trusted seed set). */
  def weightedPersonalizedPageRankMicros(edges: DataFrame,
      srcCol: String, dstCol: String, weightCol: String,
      seeds: DataFrame, seedCol: String, iterations: Int = 10,
      dampingMicros: Long = 850000L): DataFrame =
    rankLoop(prepare(weightedEdges(edges, srcCol, dstCol, weightCol)),
      iterations, dampingMicros, seeds = Some(seeds),
      seedCol = seedCol)

  /** HITS hubs & authorities (Kleinberg 1999) with exact integer
    * arithmetic — the bipartite companion to PageRank: an AUTHORITY
    * is pointed at by good hubs, a HUB points at good authorities
    * (the customer↔supplier / page↔resource shape PageRank's single
    * score conflates). Scores are micros in [0, One], max-normalized
    * each half-iteration:
    * {{{
    *   a'(v) = Σ_{u→v} h(u);   a(v) = (a'(v) · One) div max(a')
    *   h'(u) = Σ_{u→v} a(v);   h(u) = (h'(u) · One) div max(h')
    * }}}
    * All floor division and exact long sums, so results are a pure
    * function of the graph (replayed by the q163 oracle's unrolled
    * CTEs, scalar-subquery maxes included). Max-normalization — not
    * L2 — because it stays in integers; the RANKING it induces is
    * the same. The top hub and top authority sit at exactly One.
    *
    * Bounds: `a'·One` must fit a long → in-degree ≤ ~9e6 at
    * full-scale hub scores (ANSI overflow throws loudly past it —
    * partition hub-monsters out first, or rescale dampingless ranks
    * are not the tool for them). Edges are deduplicated (simple
    * graph). Scale shape per iteration: two src/dst-keyed join+agg
    * exchanges (the PageRank physics) plus two node-scale max
    * scalars; each half-iteration's frame is pinned before its max
    * so the scalar action and the next join share one execution.
    * Returns (node, hub_micros, auth_micros). */
  def hitsMicros(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5): DataFrame = {
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(false)
    hitsMicrosOn(e, nodes, iterations)
  }

  /** [[hitsMicros]] over pre-pinned graph frames — `e` the DISTINCT
    * non-null (src, dst) edge list, `nodes` its endpoint set (one
    * `node` column), both already lazily localCheckpoint'd (the
    * multi-rank stored-graph shape of [[PreparedGraph]]; HITS runs on
    * the DIRECTED edge list, so it takes the raw frames rather than
    * the symmetrized eo artifact). Results are bit-identical to
    * [[hitsMicros]], which just builds these two frames and
    * delegates.
    *
    * The max scalars normalize IN-PLAN: each half-iteration's raw sum
    * frame is pinned, then cross-joined with the broadcast 1-row max
    * of itself — both consumers read the pinned RDD, the whole
    * 2·`iterations`-round recurrence stays ONE lazy plan, and the
    * only driver actions a caller pays are the empty-graph probe and
    * its own terminal action. (The earlier form collected each max
    * with `head()` — 2·iterations driver round-trips per call, each
    * a separate job.) `DIV` on a zero max is guarded by a `when`
    * (zero-mass frames normalize to 0, as before).
    *
    * `private[graft]`: the caller contract (distinct, non-null edges;
    * `nodes` = the edge list's endpoint set) is NOT validated here —
    * duplicate edges double-count and missing nodes drop rows
    * silently — so the entry point stays repo-internal; external
    * callers go through [[hitsMicros]], which normalizes. */
  /** Node-count ceiling under which the HITS recurrence broadcasts
    * its node-scale frames (ranks into the edge join, per-node sums
    * into the endpoint left join). ~40 B/node puts the default's
    * worst broadcast around 80 MB — inside the comfortable broadcast
    * range; past it the recurrence keeps the shuffle joins that scale
    * to arbitrary node counts. Override per session with
    * `spark.graft.hits.broadcastMaxNodes` for clusters whose
    * executors can hold more (or less). */
  private val HitsBroadcastMaxNodesDefault = 2000000L

  private[core] def hitsBroadcastMaxNodes(df: DataFrame): Long =
    df.sparkSession.conf
      .get("spark.graft.hits.broadcastMaxNodes",
        HitsBroadcastMaxNodesDefault.toString).toLong

  private[graft] def hitsMicrosOn(e: DataFrame, nodes: DataFrame,
      iterations: Int = 5): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // one node count up front: the empty-graph probe (as before) and
    // the join-strategy pick. Strategy only — scores are a pure
    // function of the graph under either join (spec-pinned).
    val nNodes = nodes.count()
    require(nNodes > 0, "hitsMicros: empty graph")
    // Below the ceiling, every node-scale side of the recurrence
    // broadcasts: the 2·iterations join+agg rounds then carry ONE
    // exchange each (the groupBy) instead of shuffling the edge list
    // AND the endpoint set per half-iteration — at gate scale the
    // rounds are stage-latency-bound, not data-bound, and the before
    // plan showed 14 exchanges against the after's 4.
    val small = nNodes <= hitsBroadcastMaxNodes(nodes)
    def nodeScale(df: DataFrame): DataFrame =
      if (small) broadcast(df) else df
    // normalize a pinned raw-sum frame by its own max, in-plan
    def maxNorm(raw: DataFrame, out: String): DataFrame =
      raw.crossJoin(broadcast(raw.agg(max(col("s")).as("mx_"))))
        .select(col("node"),
          when(col("mx_") === 0L || col("mx_").isNull, lit(0L))
            .otherwise(expr(s"(s * $One) DIV mx_")).as(out))
    var hubs = nodes.withColumn("hub", lit(One))
    var auths = nodes.withColumn("auth", lit(One))
    for (_ <- 1 to iterations) {
      // authority update from current hubs
      val aRaw = nodes
        .join(nodeScale(
          e.join(nodeScale(hubs.withColumnRenamed("node", "src")),
            Seq("src"))
          .groupBy(col("dst").as("node")).agg(sum(col("hub")).as("s"))),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("s"), lit(0L)).as("s"))
        // pin: consumed by the max scalar AND the normalization AND
        // the next half-iteration's join
        .localCheckpoint(false)
      auths = maxNorm(aRaw, "auth")
      // hub update from the new authorities
      val hRaw = nodes
        .join(nodeScale(
          e.join(nodeScale(auths.withColumnRenamed("node", "dst")),
            Seq("dst"))
          .groupBy(col("src").as("node")).agg(sum(col("auth")).as("s"))),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("s"), lit(0L)).as("s"))
        .localCheckpoint(false)
      hubs = maxNorm(hRaw, "hub")
    }
    hubs.join(nodeScale(auths), Seq("node"))
      .select(col("node"), col("hub").as("hub_micros"),
        col("auth").as("auth_micros"))
  }

  /** weighted-graph normalization: positive-weight validation
    * (in-plan, loud) + parallel-edge weight summing. */
  private def weightedEdges(edges: DataFrame, srcCol: String,
      dstCol: String, weightCol: String): DataFrame = {
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("long").as("w"))
      .where(col("src").isNotNull && col("dst").isNotNull)
    // a zero/negative/null weight is a caller bug (a dropped edge
    // should be absent, not weight-0) — fail loudly, in-plan
    e.withColumn("w",
      when(col("w").isNull || col("w") <= 0L,
        raise_error(concat(lit("weightedPageRankMicros: weight must " +
          "be a positive integer, got "), col("w").cast("string"),
          lit(" on edge "), col("src").cast("string"), lit(" -> "),
          col("dst").cast("string"))).cast("long"))
        .otherwise(col("w")))
      .groupBy("src", "dst").agg(sum(col("w")).as("w"))
  }

  /** Personalized PageRank: the teleport goes ONLY to `seeds`
    * (topic-conditioned authority — rank relative to a trusted /
    * on-topic seed set, the curation variant: seed with known-good
    * hosts and the rank is a per-host trust prior). Identical
    * exact-integer recurrence with a seed-conditional start and base:
    * {{{
    *   r0(v)   = One        if v in seeds else 0
    *   r'(v)   = (One - D)·[v in seeds]  +  sum(contrib into v)
    * }}}
    * so mass flows outward from the seeds and a node unreachable from
    * them ranks exactly 0. With `seeds` = all nodes this IS
    * [[pageRankMicros]] (spec-pinned). Seed rows not present in the
    * graph are ignored. Returns (node, rank_micros). */
  def personalizedPageRankMicros(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: DataFrame, seedCol: String,
      iterations: Int = 10, dampingMicros: Long = 850000L): DataFrame =
    rankLoop(prepare(simpleEdges(edges, srcCol, dstCol)), iterations,
      dampingMicros, seeds = Some(seeds), seedCol = seedCol)

  /** simple-graph normalization: distinct (src, dst), weight 1 —
    * `(rank · 1) div W` then reduces to the unweighted
    * `rank div outdeg`, so the weighted loop IS the plain loop. */
  private def simpleEdges(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .withColumn("w", lit(1L))

  /** normalized-edge frame -> pinned [[PreparedGraph]]: endpoint set
    * plus the static per-iteration join side. Pinned because both are
    * consumed every iteration (and, via the prepared entry points, by
    * every rank VARIANT over the same stored graph). wsum = Σ w over
    * src's out-edges (= outdeg when all weights are 1, so the
    * weighted recurrence IS the plain one). */
  private def prepare(e: DataFrame): PreparedGraph = {
    val nodeSet = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(false)
    val eo = e.join(
        e.groupBy("src").agg(sum(col("w")).as("wsum")), Seq("src"))
      .localCheckpoint(false)
    PreparedGraph(nodeSet, eo)
  }

  private def rankLoop(g: PreparedGraph, iterations: Int,
      dampingMicros: Long, seeds: Option[DataFrame],
      seedCol: String): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(dampingMicros >= 0L && dampingMicros <= One,
      s"dampingMicros must be in [0, $One], got $dampingMicros")
    // (node, base, start) — per-node teleport share and start mass:
    // One-D / One everywhere for plain PageRank (literal columns over
    // the pinned node set — nothing to re-pin), seed-conditional for
    // the personalized form (one node-scale join, pinned because the
    // rank loop consumes it every iteration)
    val nodes = seeds match {
      case None =>
        g.nodeSet.withColumn("base", lit(One - dampingMicros))
          .withColumn("start", lit(One))
      case Some(s) =>
        g.nodeSet.join(
            s.select(col(seedCol).as("node")).distinct()
              .withColumn("is_seed", lit(true)),
            Seq("node"), "left")
          .select(col("node"),
            when(col("is_seed"), lit(One - dampingMicros))
              .otherwise(lit(0L)).as("base"),
            when(col("is_seed"), lit(One)).otherwise(lit(0L))
              .as("start"))
          .localCheckpoint(false)
    }
    require(nodes.limit(1).count() > 0, "pageRankMicros: empty graph")
    val eo = g.eo
    var ranks = nodes.select(col("node"),
      col("start").as("rank_micros"))
    for (i <- 1 to iterations) {
      val contribs = eo
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        // integer floor chain (all values non-negative): the
        // weight-proportional share, then the damped share — see the
        // recurrence above; rank·w FIRST (then one floor) — dividing
        // before multiplying would floor away the proportionality
        .select(col("dst").as("node"),
          expr(s"($dampingMicros * ((rank_micros * w) DIV wsum)) " +
            s"DIV $One").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (col("base") + coalesce(col("s"), lit(0L))).as("rank_micros"))
      // lineage cut every 3rd round, not every round: ranks is
      // consumed once per iteration so plan depth grows LINEARLY
      // between cuts (no exponential blowup to fear), and each lazy
      // checkpoint costs a materialization job — the cadence trades
      // bounded plan depth (≤3 iterations) for 3× fewer of those
      // jobs (measured: the per-iteration cost at gate scale is
      // stage latency, not data)
      if (i % 3 == 0 && i < iterations)
        ranks = ranks.localCheckpoint(false)
    }
    ranks
  }
}
