package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column — the
  * clustering half of cluster-aware curation (topic discovery,
  * cluster-balanced sampling/caps, DoReMi-style domain construction
  * from unlabeled corpora): cluster ids become the stratum key for
  * [[graft.text.Curation.capPerKey]] / `temperatureMixture` /
  * `stratifiedSample`.
  *
  * EXACT-INTEGER determinism (the property that makes a full training
  * loop hash-gateable cross-engine, q145): vectors quantize ONCE to
  * integer micros, so squared distance is pure long arithmetic —
  * `Σ (v_i − c_i)²` over micro longs (NO floats anywhere in the
  * argmin), order-independent and identical under any partitioning,
  * retry, or engine. Centroid updates are exact long sums divided
  * once per (cluster, dim) with one deterministic rounding back to
  * micros. Initialization is deterministic farthest-point seeding
  * from a portable md5-rank anchor (the q90 convention), so the
  * whole fit is a pure function of the data.
  *
  * Scale shape per iteration: one broadcast of k·dim centroid micros
  * and ONE primitive mapPartitions scan that computes each row's
  * argmin AND accumulates per-cluster dim sums in task-local long
  * arrays — partitions·k partial rows to the driver, no join, no
  * shuffle, no boxing in the hot loop (the Column-HOF formulation
  * boxed every element and cost 295 s at 2M×64×k16 where this takes
  * seconds). `iters` iterations = `iters` scans; nothing corpus-sized
  * ever reaches the driver. Empty clusters keep their previous
  * centroid (deterministic, mirrored by the oracle).
  */
object KMeans {

  /** Vector → integer micros, the quantized basis every k-means
    * quantity derives from. */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * 1e6).cast("long"))

  /** FLOOR-based micro quantization — the designated fallback
    * quantizer should a cross-engine environment ever convict
    * [[quantize]]'s ROUND (spec-covered; its q145a/q145d oracle
    * probes were retired round 13 once the q145 hunt closed — the
    * 2026 divergence was the oracle's HUGEINT output type, not the
    * quantizer). Why floor is
    * divergence-proof where round is not: both engines compute the
    * IDENTICAL IEEE-754 binary double `x * 1e6` (for FLOAT inputs the
    * product is even exact — a 24-bit mantissa times 15625 stays
    * under 2^53), and `floor` of a given binary double is a single
    * well-defined value with NO tie-breaking rule — whereas `round`
    * must pick a half-way rule (Spark: shortest-decimal HALF_UP;
    * other engines: the C library's or banker's), the one remaining
    * float-sensitive step in the q145 chain. */
  def quantizeFloor(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 1e6).cast("long"))

  /** Exact squared distance between two micro-long arrays:
    * `Σ (v_i − c_i)²` — pure long arithmetic. */
  def distSq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, d) => acc + d)

  /** Fitted model: centroids in cluster-id order (micro longs). */
  final case class Model(centroids: IndexedSeq[IndexedSeq[Long]]) {
    def k: Int = centroids.length
  }

  /** Fit provenance for gate forensics: the seed row ids (in pick
    * order) and one md5 per centroid state — index 0 is the seed set,
    * index i the state after Lloyd iteration i. Any cross-engine
    * divergence localizes to seeding / a specific iteration in one
    * diff instead of a whole-fit forensic hunt. */
  final case class Trace(seedIds: IndexedSeq[String],
      centroidMd5s: IndexedSeq[String])

  private def centroidsMd5(cs: IndexedSeq[IndexedSeq[Long]]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytes = cs.map(_.mkString(","))
      .mkString(";").getBytes("UTF-8")
    md.digest(bytes).map(b => f"$b%02x").mkString
  }

  /** Half-away-from-zero integer rounding of `s / n` (n > 0) in pure
    * long arithmetic — the quotient/remainder form, so no `2*s`
    * intermediate can overflow and no double ever enters the loop.
    * This is the same value `BigDecimal(s/n).setScale(0, HALF_UP)`
    * and an exact-arithmetic `ROUND()` produce, WITHOUT the
    * float-representation sensitivity: `s.toDouble/n` loses integer
    * exactness above 2^53 and turns exact-half quotients into
    * whatever the nearest double happens to be, making the rounding
    * rule engine-version-dependent (the q145 driver-red mechanism). */
  private[similarity] def roundHalfAway(s: Long, n: Long): Long = {
    val q = s / n           // truncates toward zero
    val r = math.abs(s % n) // |remainder|, < n, so 2*r cannot overflow
    if (2 * r >= n) q + (if (s >= 0) 1L else -1L) else q
  }

  // primitive (v − c)² distance over boxed long seqs — the hot kernel
  // every imperative pass shares
  private def dist2(vm: Seq[Long], c: Array[Long]): Long = {
    var d = 0L
    var i = 0
    while (i < c.length) {
      val t = vm(i) - c(i)
      d += t * t
      i += 1
    }
    d
  }

  /** Deterministic FARTHEST-POINT initialization (greedy k-center —
    * the derandomized k-means++ cousin): seed 1 is the first row by
    * the portable `(md5(cast(id as string)), id)` rank; each later
    * seed is the row MAXIMIZING its exact distance to the nearest
    * chosen seed (ties → lowest id). Well-separated clusters each
    * receive a seed by construction — the md5-only sample can land
    * two seeds in one cluster and starve another. Every step is one
    * TakeOrdered scan whose nearest-distance column is computed by a
    * PRIMITIVE mapPartitions kernel (an interpreted higher-order-
    * function fold boxes every element and made init the dominant
    * fit cost at 2M×64); the argmax ordering stays in Column land so
    * the id tie-break keeps the id column's own type ordering. All
    * integer arithmetic — the whole init replays cross-engine. */
  private[similarity] def init(vm: DataFrame, idCol: String, k: Int)
      : (IndexedSeq[String], IndexedSeq[IndexedSeq[Long]]) = {
    val spark = vm.sparkSession
    val first = vm.orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(1)
      .select(col(idCol).cast("string"), col("vm_")).collect()
    require(first.nonEmpty, "cannot initialize on an empty frame")
    var seedIds = IndexedSeq(first.head.getString(0))
    var chosen = IndexedSeq(first.head.getSeq[Long](1).toIndexedSeq)
    val inSchema = vm.select(col(idCol), col("vm_")).schema
    val ndSchema = inSchema.add("nd_",
      org.apache.spark.sql.types.LongType, false)
    while (chosen.length < k) {
      val bc = spark.sparkContext.broadcast(
        chosen.map(_.toArray).toArray)
      val withNd = vm.select(col(idCol), col("vm_"))
        .mapPartitions { rows =>
          val cents = bc.value
          rows.map { r =>
            val v = r.getSeq[Long](1)
            var nd = Long.MaxValue
            var j = 0
            while (j < cents.length) {
              val d = dist2(v, cents(j))
              if (d < nd) nd = d
              j += 1
            }
            org.apache.spark.sql.Row.fromSeq(r.toSeq :+ nd)
          }
        }(org.apache.spark.sql.Encoders.row(ndSchema))
      val next = withNd.orderBy(col("nd_").desc, col(idCol))
        .limit(1)
        .select(col(idCol).cast("string"), col("vm_")).collect()
      // max nearest-distance 0 ⟹ every remaining row coincides with
      // a chosen seed: the frame has fewer than k DISTINCT vectors.
      // DOCUMENTED DEGENERATE BEHAVIOR (not an error): the remaining
      // seeds duplicate existing points, so the model always has
      // exactly k centroids and the duplicates own permanently empty
      // clusters that keep their seed vector (the empty-cluster rule
      // below) — [[fit]] never fails on a degenerate frame, and
      // [[assign]] ties break to the LOWEST cluster id, so duplicate
      // centroids never win a row. The spec pins this contract.
      seedIds = seedIds :+ next.head.getString(0)
      chosen = chosen :+ next.head.getSeq[Long](1).toIndexedSeq
    }
    (seedIds, chosen)
  }

  /** Fit `k` clusters with `iters` Lloyd iterations. Returns the
    * model; [[assign]] labels any frame with it. */
  def fit(df: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int): Model = fitTraced(df, vecCol, idCol, k, iters)._1

  /** The deterministic farthest-point seed ids ALONE (pick order) —
    * the q145b diagnostic gate's engine side: stage 2 of the fit
    * (quantize → seed → iterate) isolated, so a cross-engine red in
    * the full q145 chain localizes to seeding without rerunning any
    * Lloyd iteration. */
  def seedIds(df: DataFrame, vecCol: String, idCol: String, k: Int)
      : IndexedSeq[String] = {
    require(k >= 1, "need k >= 1")
    val vm = df.select(col(idCol), quantize(col(vecCol)).as("vm_"))
      .where(col("vm_").isNotNull)
      .localCheckpoint(false) // init scans the basis k-1 times
    init(vm, idCol, k)._1
  }

  /** [[fit]] plus a [[Trace]] (seed ids, per-iteration centroid
    * md5s) — the `q145_model` debug artifact Verify dumps so a
    * cross-engine red localizes to a stage in one diff. */
  def fitTraced(df: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int): (Model, Trace) = {
    require(k >= 1 && iters >= 1, "need k >= 1 and iters >= 1")
    require(!df.columns.exists(Seq("vm_", "cluster_id", "dist_sq")
      .contains), "input already has a reserved kmeans column")
    val vm = df.select(col(idCol), quantize(col(vecCol)).as("vm_"))
      .where(col("vm_").isNotNull)
      .localCheckpoint(false) // every iteration re-reads this basis
    // init always returns exactly k seeds — a frame with fewer than k
    // DISTINCT vectors pads with duplicates whose clusters stay empty
    // and keep their seed centroid (documented in init; spec-pinned)
    val (seedIds, centroids0) = init(vm, idCol, k)
    assert(centroids0.length == k)
    val (centroids, hashes) = lloyd(vm, centroids0, iters)
    (Model(centroids), Trace(seedIds, hashes))
  }

  /** [[fit]] with ONE-SCAN hash-ranked-sample seeding instead of
    * farthest-point — the LARGE-K form: farthest-point init is k−1
    * sequential corpus scans (right at topic-scale k, prohibitive at
    * coarse-quantizer scale — an IVF nlist of 2¹⁰–2¹⁶), while the
    * `xxhash64(seed, id)` rank is the engine-wide one-scan sampling
    * rule and a pure function of the data. The Lloyd iterations are
    * the SAME exchange-free distributed passes (exact long
    * arithmetic — deterministic under any partitioning, retry, or
    * AQE re-plan). Trade: sample seeds can land two in one cluster
    * and starve another (the reason farthest-point exists); at
    * coarse-quantizer k the Lloyd passes wash that out, and a
    * duplicate seed just owns an empty cell under the documented
    * empty-cluster rule (assign ties break to the lowest id). */
  def fitSampleSeeded(df: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int, seed: Long = 42): Model = {
    require(k >= 1 && iters >= 1, "need k >= 1 and iters >= 1")
    require(!df.columns.exists(Seq("vm_", "cluster_id", "dist_sq")
      .contains), "input already has a reserved kmeans column")
    val vm = df.select(col(idCol), quantize(col(vecCol)).as("vm_"))
      .where(col("vm_").isNotNull)
      .localCheckpoint(false) // every iteration re-reads this basis
    val seeds = vm
      .select(col("vm_"), xxhash64(lit(seed), col(idCol)).as("hr_"))
      .orderBy(col("hr_")).limit(k)
      .select(col("vm_")).collect()
      .map(_.getSeq[Long](0).toIndexedSeq).toIndexedSeq
    require(seeds.length == k,
      s"fitSampleSeeded: only ${seeds.length} non-null vectors for " +
        s"k=$k clusters — a quantizer cannot have more cells than " +
        "training vectors")
    Model(lloyd(vm, seeds, iters)._1)
  }

  // the distributed Lloyd loop both fit forms share: assignment +
  // per-cluster dim sums as one primitive mapPartitions pass per
  // iteration, exact long arithmetic throughout
  private def lloyd(vm: DataFrame,
      centroids0: IndexedSeq[IndexedSeq[Long]], iters: Int)
      : (IndexedSeq[IndexedSeq[Long]], IndexedSeq[String]) = {
    var centroids = centroids0
    var hashes = IndexedSeq(centroidsMd5(centroids))
    val dims = centroids.head.length
    val spark = vm.sparkSession
    import spark.implicits._
    var it = 0
    while (it < iters) {
      // assignment + per-cluster dim sums as ONE primitive
      // mapPartitions pass: each task keeps k×(dims+1) long
      // accumulators and emits k rows; the driver merges
      // partitions×k partials. Exact long arithmetic — identical
      // results under any partitioning. (The Column-HOF formulation
      // boxed every element: 295 s at 2M×64×k16; also beware
      // posexplode, which re-evaluates the argmin per GENERATED row.)
      val bc = spark.sparkContext.broadcast(
        centroids.map(_.toArray).toArray)
      val partials = vm.select(col("vm_")).as[Seq[Long]]
        .mapPartitions { rows =>
          val cents = bc.value
          val kk = cents.length
          val sums = Array.ofDim[Long](kk, dims)
          val ns = new Array[Long](kk)
          rows.foreach { v =>
            var best = 0
            var bd = dist2(v, cents(0))
            var j = 1
            while (j < kk) {
              val d = dist2(v, cents(j))
              if (d < bd) { bd = d; best = j }
              j += 1
            }
            ns(best) += 1L
            var i = 0
            while (i < dims) { sums(best)(i) += v(i); i += 1 }
          }
          (0 until kk).iterator
            .filter(j => ns(j) > 0)
            .map(j => (j, sums(j).toSeq, ns(j)))
        }
        .collect()
      val merged = partials.groupBy(_._1)
      centroids = centroids.zipWithIndex.map { case (prev, i) =>
        merged.get(i) match {
          case Some(ps) =>
            val n = ps.map(_._3).sum
            val s = new Array[Long](dims)
            ps.foreach(p => (0 until dims)
              .foreach(d => s(d) += p._2(d)))
            // pure-integer half-away-from-zero — NO double anywhere,
            // so no engine's ROUND(DOUBLE) half-way rule can diverge
            // (Math.round would round a negative .5 toward +inf; the
            // old s.toDouble/n path was hostage to the oracle
            // engine's float ROUND behavior — the q145 driver-red
            // mechanism)
            (0 until dims).map(d => roundHalfAway(s(d), n))
              .toIndexedSeq
          case None => prev // empty cluster keeps its centroid
        }
      }
      hashes = hashes :+ centroidsMd5(centroids)
      it += 1
    }
    (centroids, hashes)
  }

  /** Label every row with its nearest centroid: input + `cluster_id`
    * + `dist_sq` (exact long; both null for a null vector).
    * Quantization stays a Column expression (oracle parity); the
    * argmin is the primitive mapPartitions kernel with the model
    * broadcast — no join, no shuffle, no boxing in the hot loop. */
  def assign(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    require(!df.columns.exists(Seq("vm_", "cluster_id", "dist_sq")
      .contains), "input already has a reserved kmeans column")
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(
      model.centroids.map(_.toArray).toArray)
    val prepared = df.withColumn("vm_", quantize(col(vecCol)))
    val inSchema = prepared.schema
    val outSchema = inSchema
      .add("cluster_id", org.apache.spark.sql.types.IntegerType)
      .add("dist_sq", org.apache.spark.sql.types.LongType)
    val vmIdx = inSchema.fieldIndex("vm_")
    prepared.mapPartitions { rows =>
      val cents = bc.value
      rows.map { r =>
        if (r.isNullAt(vmIdx))
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ null :+ null)
        else {
          val v = r.getSeq[Long](vmIdx)
          var best = 0
          var bd = dist2(v, cents(0))
          var j = 1
          while (j < cents.length) {
            val d = dist2(v, cents(j))
            if (d < bd) { bd = d; best = j }
            j += 1
          }
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ best :+ bd)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .drop("vm_")
  }

  /** The model as a DataFrame (cluster_id, centroid_micros) — the
    * stored-artifact form. */
  def modelToDf(spark: org.apache.spark.sql.SparkSession,
      model: Model): DataFrame = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("cluster_id",
        "centroid_micros")
  }
}
