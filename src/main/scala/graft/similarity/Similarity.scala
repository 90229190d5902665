package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (broadcast the query set, scan the
  * corpus once — the right plan when queries are few). Scale path:
  * hash-derived hyperplane LSH bucketing (sign-bit sketch) that turns
  * candidate generation into an equi-join, probing only matching buckets;
  * or IVF via a driver-fit coarse quantizer. */
object Similarity {

  /** exact dot product (sequential multiply-accumulate — stable
    * evaluation order). Native codegen'd expression: the composed
    * `aggregate(zip_with(...))` form is interpreter-evaluated and
    * allocates per row; [[graft.functions.DotProduct]] runs as a
    * primitive loop inside whole-stage codegen with bit-identical
    * results. */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * uniform in [-1, 1) from xxhash64 — no stored model, identical on
    * every executor. */
  private def planeComponent(plane: Int, dim: Column, seed: Long): Column =
    (pmod(xxhash64(lit(seed), lit(plane), dim), lit(1000000007L))
      .cast("double") / 5.0e8) - 1.0

  /** Sign-bit sketch over `planes` hash-derived hyperplanes — vectors in
    * the same bucket are likely cosine-similar. */
  def hyperplaneBucket(vec: Column, planes: Int = 8, seed: Long = 42)
      : Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i, seed)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** SemDedup-style semantic pruning: cluster embeddings, compare
    * pairs WITHIN a cluster only, and drop every vector that has a
    * lower-id in-cluster neighbor with cosine >= `minCosine` (keep-
    * first rule — deterministic under any partitioning). Returns one
    * row per input vector: (idCol, bucket, n_close, dropped).
    *
    * `bucket` is any clustering expression over the vector column —
    * [[hyperplaneBucket]] by default via [[semDedupAuto]]; tests and
    * oracles can pass a replicable expression (e.g. leading-dim sign
    * bits). Scale: the in-cluster self-join is quadratic in cluster
    * size, so the bucket count must GROW with the corpus exactly like
    * [[Dedup.embeddingNearDups]]'s planes (occupancy n/2^planes keeps
    * the pairwise term linear overall); norms are computed once per
    * vector, and the dot product is the codegen'd primitive loop.
    *
    * `maxBucketSize` caps a degenerate cluster's pair explosion: a
    * bucket over the cap emits linear star pairs against its min-id
    * member ONLY — every true mass-duplicate is still dropped against
    * the representative, but near-dup pairs strictly between two
    * non-representative members of an over-cap DIVERSE bucket are not
    * compared (they survive). This is a semantics change from an
    * uncapped all-pairs self-join; pass `maxBucketSize = Int.MaxValue`
    * to restore exhaustive in-bucket comparison when the clustering is
    * known to be well-spread. */
  def semDedup(df: DataFrame, vecCol: String, idCol: String,
      minCosine: Double, bucket: Column,
      maxBucketSize: Int = 1000): DataFrame = {
    val e = df.withColumn("bucket", bucket)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("bucket"))
      .withColumn("nrm", norm(col("v")))
      // FOUR consumers (bucket agg, both pair-join sides, the output
      // join): without the barrier each scan re-evaluates the bucket
      // expression — planes×dim hashes per row in the generic path —
      // and the norm, ~quadrupling the dominant signature cost (the
      // multi-consumer re-execution trap the dedup paths document)
      .localCheckpoint(false)
    // zero-norm vectors have no cosine direction: they pair with
    // nothing (0/0 = NaN would otherwise satisfy >= under Spark's
    // NaN-greatest ordering, silently dropping their bucket-mates)
    val nonzero = e.where(col("nrm") > 0)
    // pairs come from the shared skew-capped bucket explosion, not a
    // bucket self-join: a degenerate bucket (mass-duplicated
    // embedding) emits linear star pairs against its min-id member —
    // which for true duplicates marks every non-representative
    // dropped, the intended outcome — instead of going quadratic
    val buckets = nonzero
      .groupBy(col("bucket"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")) >= 2)
    val close = graft.text.Dedup.cappedPairs(buckets, "ids",
        maxBucketSize)
      .join(nonzero.select(col("id").as("a"), col("v").as("va"),
        col("nrm").as("na")), Seq("a"))
      .join(nonzero.select(col("id").as("b"), col("v").as("vb"),
        col("nrm").as("nb")), Seq("b"))
      .where(dot(col("va"), col("vb")) / (col("na") * col("nb"))
        >= minCosine)
      .groupBy(col("b").as("id"))
      .agg(count(lit(1)).as("n_close"))
    e.select(col("id"), col("bucket"))
      .join(close, Seq("id"), "left")
      .select(col("id").as(idCol), col("bucket"),
        coalesce(col("n_close"), lit(0L)).as("n_close"),
        (coalesce(col("n_close"), lit(0L)) > 0).cast("long")
          .as("dropped"))
  }

  /** [[semDedup]] with the production bucketing: hash-derived
    * hyperplane signs. One probe action reads the corpus count (to
    * size `planes` so bucket occupancy stays ~8 — the in-cluster
    * pairwise term then stays linear overall) and the embedding
    * dimension (to precompute the plane matrix as literals: the
    * row-independent hash components would otherwise re-evaluate
    * per row — planes×dim×n extra hashes). Pass `planes > 0` to pin
    * the bucket count instead. */
  def semDedupAuto(df: DataFrame, vecCol: String, idCol: String,
      minCosine: Double = 0.95, planes: Int = 0, seed: Long = 42)
      : DataFrame = {
    val r = df.agg(count(lit(1)), min(size(col(vecCol))),
      max(size(col(vecCol)))).head()
    val nPlanes =
      if (planes > 0) planes
      else math.max(8, math.min(24,
        math.ceil(math.log(math.max(r.getLong(0), 2L) / 8.0) /
          math.log(2.0)).toInt))
    val bucket =
      if (!r.isNullAt(1) && !r.isNullAt(2) && r.getInt(1) == r.getInt(2))
        hyperplaneBucketPrecomputed(col(vecCol), nPlanes, seed,
          r.getInt(2))
      else hyperplaneBucket(col(vecCol), nPlanes, seed)
    semDedup(df, vecCol, idCol, minCosine, bucket)
  }

  /** `planeComponent` evaluated at the driver — the SAME catalyst
    * XxHash64 (the expression `xxhash64` builds, seed 42) over the same
    * (long seed, int plane, int dim) children, then the same
    * pmod/scale arithmetic, so buckets are bit-identical to
    * [[hyperplaneBucket]]'s. */
  private def planeComponentValue(plane: Int, dim: Int, seed: Long)
      : Double = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val h = new XxHash64(Seq(Literal(seed), Literal(plane), Literal(dim)),
      42L).eval(null).asInstanceOf[Long]
    val m = 1000000007L
    (((h % m) + m) % m).toDouble / 5.0e8 - 1.0
  }

  /** [[hyperplaneBucket]] with the plane matrix PRECOMPUTED as literal
    * arrays for a known dimension: the generic form re-derives every
    * plane component with an xxhash64 call per (row, plane, dim) —
    * planes×dim hashes per vector that do not depend on the row at
    * all. Identical buckets (planeComponentValue replays the same
    * hash), ~dim×planes fewer hash evaluations per row. */
  def hyperplaneBucketPrecomputed(vec: Column, planes: Int, seed: Long,
      dim: Int): Column = {
    val bits = (0 until planes).map { p =>
      val weights = array((0 until dim).map(i =>
        lit(planeComponentValue(p, i, seed))): _*)
      val proj = aggregate(
        zip_with(vec, weights, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Int8 scalar-quantization scale (the FAISS SQ8 shape): per-vector
    * symmetric scale `max|x| / 127`, so codes span [-127, 127]. */
  def sq8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / 127.0

  /** Quantized codes for [[sq8Scale]]'s scale: `round(x / scale)`.
    * Zero vectors (scale 0) code to all-zeros instead of dividing by
    * zero. Cast the result to `array<tinyint>` when persisting — at
    * rest that is 1 byte per dimension, a 4× memory cut vs float32,
    * which is the entire point of SQ8 at corpus scale. Codes stay
    * `int` in-plan here so the integer dot below needs no widening. */
  def sq8Codes(vec: Column, scale: Column): Column =
    when(scale === 0.0,
      transform(vec, _ => lit(0)))
      .otherwise(transform(vec,
        x => round(x.cast("double") / scale).cast("int")))

  /** Top-k cosine over int8-quantized vectors — the memory-scaling
    * variant of [[bruteForceTopK]]: per-vector symmetric scales cancel
    * out of cosine, so scoring is a pure INTEGER dot product over the
    * codes (exact long sums — no float accumulation order anywhere)
    * with one final double division. Quantization error shifts
    * near-tied ranks (the SQ8 recall trade); SimilaritySpec pins
    * recall vs the exact ranking on the gate corpus.
    *
    * Scale shape: identical to brute force — quantized queries
    * broadcast, ONE corpus scan, per-query top-k window over scored
    * rows — but the corpus side can read stored `array<tinyint>`
    * codes instead of float32 embeddings: 4× less I/O, and the hot
    * inner loop is integer multiply-adds. */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, queryIdCol: String, k: Int): DataFrame =
    sq8TopKFromCodes(
      sq8CodeTable(corpus, vecCol, idCol), queries, vecCol, idCol,
      queryIdCol, k)

  /** The stored-codes ingest artifact: (idCol, codes, norm) — quantize
    * ONCE when the corpus lands (persist `codes` as `array<tinyint>`
    * for the 4× at-rest cut), and every retrieval reads the stored
    * table instead of re-reading float32 and re-quantizing. The same
    * division of labor as `shingleHashes`/`signatureTable` for the
    * text dedup family. */
  def sq8CodeTable(df: DataFrame, vecCol: String,
      idCol: String): DataFrame =
    df.select(col(idCol), col(vecCol).as("v_"))
      .withColumn("s_", sq8Scale(col("v_")))
      .withColumn("codes", sq8Codes(col("v_"), col("s_")))
      .withColumn("norm", aggregate(col("codes"),
        lit(0L), (acc, c) => acc + (c * c).cast("long")))
      .select(col(idCol), col("codes"), col("norm"))

  /** [[sq8TopK]] with the CORPUS side read from a stored
    * [[sq8CodeTable]] — the production shape: the scan touches int8
    * codes only; queries (small) quantize on the fly. */
  def sq8TopKFromCodes(corpusCodes: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String,
      k: Int): DataFrame = {
    val c = corpusCodes.select(col(idCol).as("corpus_id"),
      col("codes").as("ccd_"), col("norm").as("cn_"))
    val q = sq8CodeTable(queries, vecCol, queryIdCol)
      .select(col(queryIdCol).as("query_id"),
        col("codes").as("qcd_"), col("norm").as("qn_"))
    val idot = aggregate(
      zip_with(col("ccd_"), col("qcd_"), (a, b) => (a * b).cast("long")),
      lit(0L), (acc, v) => acc + v)
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine_q",
        when(col("cn_") === 0L || col("qn_") === 0L, lit(0.0))
          .otherwise(idot.cast("double") /
            (sqrt(col("cn_").cast("double")) *
              sqrt(col("qn_").cast("double")))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_q").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"),
        round(col("cosine_q"), 6).as("cosine_q"), col("rank"))
  }

  // --- binary quantization (1 bit/dim sign codes, Hamming rank) ---

  /** Sign-bit binary quantization of a float vector: bit i of word w
    * is 1 iff `vec[w*32 + i] >= 0`, packed 32 bits per BIGINT word
    * (`array<long>`, `ceil(dim/32)` words). 32 — not 64 — bits per
    * word so no packing ever touches a long's sign bit: under ANSI
    * mode a `2^63` term is an arithmetic-overflow ERROR, and a
    * sign-flipped word would also poison any oracle replaying the
    * packing as a plain integer sum. The at-rest cost is 8 bytes per
    * 32 dims = 32× smaller than float32 — binary quantization's
    * entire point: the whole index fits where 3% of the corpus did.
    *
    * For unit-ish-normalized embeddings, Hamming distance over these
    * codes is a monotone estimate of angular distance (each sign bit
    * is the 1-hyperplane LSH along a coordinate axis), which is why
    * BQ + exact rescoring is the shape production lexical engines
    * (Lucene/Elasticsearch-style int1 quantization) deploy first. */
  def bqSignBits(vec: Column): Column = {
    val d = size(vec)
    transform(
      // word indices 0..ceil(dim/32)-1; int division via cast (d>0)
      sequence(lit(0), ((d - 1) / 32).cast("int")),
      w => aggregate(
        // fold dim bits high->low: acc*2 + bit needs no shift-by-
        // column (shiftleft takes only literal shifts) and never
        // exceeds 2^32
        sequence(lit(31), lit(0), lit(-1)),
        lit(0L),
        (acc, i) => {
          val idx = w * 32 + i // 0-based dimension index
          // nested when, not &&: element_at past the end is an ANSI
          // error, so the bounds check must short-circuit lazily
          acc * 2 + when(idx >= d, 0L)
            .otherwise(when(element_at(vec, idx + 1) >= 0, 1L)
              .otherwise(0L))
        }))
  }

  /** The stored-codes artifact for [[bqTopKFromBits]]: (idCol, bits).
    * Quantize ONCE when the corpus lands — every retrieval then reads
    * 8 bytes per 32 dims instead of float32 embeddings. */
  def bqCodeTable(df: DataFrame, vecCol: String,
      idCol: String): DataFrame =
    df.select(col(idCol), bqSignBits(col(vecCol)).as("bits"))

  /** Hamming distance between two packed sign-bit codes:
    * `sum(bit_count(a[w] XOR b[w]))` — pure integer, exact. */
  def bqHamming(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Top-k by Hamming distance over sign-bit codes — the cheapest ANN
    * tier: candidates rank by XOR + popcount over `ceil(dim/32)`
    * longs, the scan reads the 32×-compressed [[bqCodeTable]] and
    * never a float vector. Exact ties (common — Hamming is a small
    * integer) break on corpus id, so results are deterministic under
    * any partitioning. Scale shape: identical to [[sq8TopKFromCodes]]
    * — queries quantize on the fly and broadcast, ONE stored-codes
    * scan, per-query top-k window. Returns
    * (query_id, corpus_id, hamming, rank). */
  def bqTopKFromBits(corpusBits: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String,
      k: Int): DataFrame = {
    val c = corpusBits.select(col(idCol).as("corpus_id"),
      col("bits").as("cb_"))
    val q = bqCodeTable(queries, vecCol, queryIdCol)
      .select(col(queryIdCol).as("query_id"), col("bits").as("qb_"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("hamming", bqHamming(col("cb_"), col("qb_")))
      // a null Hamming (null bits row, or corpus/query packed under
      // DIFFERENT dims — zip_with pads the short side with nulls)
      // would sort FIRST under the ascending window and silently rank
      // garbage at 1; fail loudly instead (the ivfPqTopKFromCodes
      // stale-model stance)
      .withColumn("hamming",
        when(col("hamming").isNull, raise_error(concat(
          lit("bqTopKFromBits: null Hamming distance for corpus id "),
          col("corpus_id").cast("string"),
          lit(" — null bits or a corpus/query dimension mismatch " +
            "(codes packed under different dims)"))).cast("long"))
          .otherwise(col("hamming")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("hamming"),
        col("rank"))
  }

  /** [[bqTopKFromBits]] quantizing the corpus inline — the one-shot
    * form; persist [[bqCodeTable]] instead when the corpus is read
    * more than once. */
  def bqTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, queryIdCol: String, k: Int): DataFrame =
    bqTopKFromBits(bqCodeTable(corpus, vecCol, idCol), queries,
      vecCol, idCol, queryIdCol, k)

  /** Binary-quantized search with exact rescoring — the production BQ
    * deployment shape (Lucene/Elasticsearch int1 "oversample then
    * rescore"): over-fetch k′ = `refineFactor`×k candidates by Hamming
    * distance over the compressed codes, fetch JUST those candidates'
    * float vectors by id, re-score with exact cosine, keep the true
    * top k. The recall knob is `refineFactor` (Hamming collapses
    * near-ties; rescoring restores their order) — raise it before
    * abandoning BQ for a heavier index.
    *
    * Scale shape: the Hamming pass reads only the 32×-compressed
    * codes; the candidate set is queries×k′ rows, so the exact-vector
    * fetch is a PRUNED id lookup ([[graft.text.Curation.fetchByKeys]]
    * — chunked-IN pushdown / semi-join), never a corpus re-scan.
    * Returns (query_id, corpus_id, cosine, rank), descending cosine. */
  def bqTopKRescored(corpusBits: DataFrame, corpus: DataFrame,
      queries: DataFrame, vecCol: String, idCol: String,
      queryIdCol: String, k: Int, refineFactor: Int = 4): DataFrame = {
    require(refineFactor >= 1,
      s"refineFactor must be >= 1, got $refineFactor")
    // lazy pin: the candidate lineage is consumed twice (fetch's key
    // collect + rescore join) and would re-run the Hamming scan
    val candidates = bqTopKFromBits(corpusBits, queries, vecCol,
        idCol, queryIdCol, k * refineFactor)
      .select(col("query_id"), col("corpus_id"))
      .localCheckpoint(false)
    val fetched = graft.text.Curation.fetchByKeys(
      corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv")),
      "corpus_id", candidates)
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).as("qv"))
    val rescored = candidates
      .join(fetched, Seq("corpus_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cosine", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    rescored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"),
        col("rank"))
  }

  // --- Matryoshka (MRL) coarse-to-fine: truncated-prefix search ---

  /** The stored truncated-prefix artifact for [[prefixTopKRescored]]:
    * (idCol, prefix) where `prefix` is the vector's first `prefixDim`
    * dimensions. Matryoshka-trained embeddings (Kusupati et al. 2022)
    * order information by dimension, so a short prefix ranks almost
    * as well as the full vector — store the prefix table and the
    * coarse pass reads dim/prefixDim× fewer bytes. */
  def prefixTable(df: DataFrame, vecCol: String, idCol: String,
      prefixDim: Int): DataFrame = {
    require(prefixDim >= 1, s"prefixDim must be >= 1, got $prefixDim")
    df.select(col(idCol),
      slice(col(vecCol), 1, prefixDim).as("prefix"))
  }

  /** Matryoshka coarse-to-fine top-k: rank by cosine over the stored
    * `prefixDim`-dim prefixes ([[prefixTable]]), over-fetch
    * k′ = `refineFactor`×k candidates, fetch ONLY those candidates'
    * full vectors by id and re-rank by exact full-dim cosine — the
    * adaptive-retrieval shape MRL embeddings are deployed with
    * (shortlist on a cheap prefix, rescore the shortlist at full
    * precision). Same scale shape as [[bqTopKRescored]]: the coarse
    * scan reads the small stored artifact, the exact fetch is a
    * pruned id lookup, never a corpus re-scan. Returns
    * (query_id, corpus_id, cosine, rank), descending full cosine. */
  def prefixTopKRescored(prefixes: DataFrame, corpus: DataFrame,
      queries: DataFrame, vecCol: String, idCol: String,
      queryIdCol: String, k: Int, prefixDim: Int,
      refineFactor: Int = 4): DataFrame = {
    require(refineFactor >= 1,
      s"refineFactor must be >= 1, got $refineFactor")
    // a stored table built under a DIFFERENT prefixDim makes every
    // coarse cosine null (DotProduct's length-mismatch contract) and
    // the search silently returns nothing — fail loudly instead (the
    // stale-model stance)
    val c = prefixes.select(col(idCol).as("corpus_id"),
      col("prefix").as("cp_"))
      .withColumn("cp_",
        when(col("cp_").isNotNull && size(col("cp_")) === prefixDim,
          col("cp_"))
          .otherwise(raise_error(concat(
            lit("prefixTopKRescored: stored prefix for corpus id "),
            col("corpus_id").cast("string"),
            lit(s" does not match prefixDim=$prefixDim — the table " +
              "was built under a different truncation")))))
    val q = queries.select(col(queryIdCol).as("query_id"),
      slice(col(vecCol), 1, prefixDim).as("qp_"),
      col(vecCol).as("qv"))
    val coarse = c.crossJoin(broadcast(q.select(col("query_id"),
        col("qp_"))))
      .withColumn("coarse_cos", cosine(col("cp_"), col("qp_")))
    val wCoarse = Window.partitionBy(col("query_id"))
      .orderBy(col("coarse_cos").desc, col("corpus_id"))
    // lazy pin: consumed by the fetch's key collect AND the rescore
    val candidates = coarse
      .withColumn("crank", row_number().over(wCoarse))
      .where(col("crank") <= k * refineFactor)
      .select(col("query_id"), col("corpus_id"))
      .localCheckpoint(false)
    val fetched = graft.text.Curation.fetchByKeys(
      corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv")),
      "corpus_id", candidates)
    val rescored = candidates
      .join(fetched, Seq("corpus_id"))
      .join(broadcast(q.select(col("query_id"), col("qv"))),
        Seq("query_id"))
      .withColumn("cosine", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    rescored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"),
        col("rank"))
  }

  /** Brute-force cosine top-k: per query vector, the k nearest corpus
    * vectors. `queries` is broadcast — one corpus scan total. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String, k: Int)
      : DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).as("cv"))
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"),
        col("rank"))
  }

  /** LSH-bucketed approximate top-k: candidates only from the query's
    * hyperplane bucket (multi-probe: exact bucket plus 1-bit flips),
    * then exact cosine rank. Falls back to fewer than k results when the
    * buckets are sparse — the standard ANN recall/latency trade.
    * Pass the (uniform) embedding dimension as `dim` to precompute the
    * plane matrix as literals — identical buckets, planes×dim fewer
    * hash evaluations per corpus row; leave 0 when dims may vary. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, queryIdCol: String, k: Int, planes: Int = 8,
      seed: Long = 42, dim: Int = 0): DataFrame = {
    val bucketOf = (v: Column) =>
      if (dim > 0) hyperplaneBucketPrecomputed(v, planes, seed, dim)
      else hyperplaneBucket(v, planes, seed)
    bucketTopK(corpus, queries, vecCol, idCol, queryIdCol, k,
      bucketOf, probeBits = planes)
  }

  /** [[lshTopK]] with a CALLER-SUPPLIED long bucket function instead
    * of hash-derived hyperplanes — stored bucket columns, or
    * replicable bucketings (leading-dimension sign bits) a
    * cross-engine oracle or test can reproduce. Multi-probe flips
    * each of the low `probeBits` bits of the query's bucket. */
  def bucketTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, queryIdCol: String, k: Int,
      bucket: Column => Column, probeBits: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).as("cv"),
      bucket(col(vecCol)).as("bucket"))
    val qBucket = bucket(col("qv"))
    val probes = array(
      (qBucket +: (0 until probeBits).map(b =>
        qBucket.bitwiseXOR(lit(1L << b)))): _*)
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).as("qv"))
      .withColumn("bucket", explode(probes))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .withColumn("cosine", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"),
        col("rank"))
  }

  /** IVF-style top-k: coarse centroids fit on a driver-collected
    * sample (k-means lite), vectors assigned to nearest centroid at
    * scan time, queries probe `nprobe` nearest centroid partitions.
    * The sample is HASH-RANKED by id (`xxhash64(seed, id)` ascending
    * — the exactSamplePerStratum rule), not a bare `limit()`: limit
    * without order takes whatever partitions answer first, so the
    * centroids (hence recall) would differ across runs/layouts; the
    * hash rank makes the default quantizer a pure function of the
    * data, reproducible under any partitioning, retry, or AQE
    * re-plan. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, queryIdCol: String, k: Int, nlist: Int = 16,
      nprobe: Int = 4, sampleSize: Int = 2048, seed: Long = 42,
      iterations: Int = 5): DataFrame = {
    val sample = hashRankedSample(corpus, vecCol, idCol, sampleSize,
      seed)
    ivfTopKWithCentroids(corpus, queries, vecCol, idCol, queryIdCol, k,
      kmeans(sample, nlist, iterations, seed), nprobe)
  }

  /** [[ivfTopK]] with a CALLER-SUPPLIED coarse quantizer instead of the
    * driver k-means fit — a persisted centroid model, or a replicable
    * quantizer (data rows picked by a deterministic id rule) that a
    * cross-engine oracle or test can rebuild. Same assignment / probe /
    * rank engine. */
  def ivfTopKWithCentroids(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String, k: Int,
      centroids: Array[Array[Double]], nprobe: Int): DataFrame = {
    require(centroids.nonEmpty, "ivf needs at least one centroid")
    val spark = corpus.sparkSession

    val centDf = broadcast(spark.createDataFrame(
      centroids.zipWithIndex.map { case (cvec, i) =>
        (i, cvec.toSeq)
      }.toSeq).toDF("centroid_id", "centroid"))

    // CORPUS-side assignment is exchange-free either way; the FORM
    // auto-switches on plan size (see the two builders below). The
    // QUERY side keeps its window: it needs the top-nprobe, and
    // queries are few by contract.
    val assigned =
      if (centroids.length.toLong * centroids.head.length
          <= LiteralAssignMaxTerms)
        ivfAssignLiteral(corpus, vecCol, idCol, centroids)
      else ivfAssignKernel(corpus, vecCol, idCol, centroids)

    val qAssigned = queries.select(col(queryIdCol).as("query_id"),
        col(vecCol).as("qv"))
      .crossJoin(centDf)
      .withColumn("dist",
        -dot(col("qv"), col("centroid")) / norm(col("centroid")))
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("query_id")).orderBy(col("dist"),
          col("centroid_id"))))
      .where(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id"))

    val scored = assigned.join(broadcast(qAssigned), Seq("centroid_id"))
      .withColumn("cosine", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"),
        col("rank"))
  }

  /** nlist×dim literals above which the literal-expression assignment
    * stops being a win: a single expression embedding thousands of
    * double literals bloats the constant pool / codegen unit (and
    * eventually fails to compile), while the broadcast kernel carries
    * the same centroids as ONE task-shared array. 16 384 terms keeps
    * the default nlist=16 × dim≤1024 on the measured-faster literal
    * path and switches well before javac/Janino limits bite. Public
    * so callers (and the q151 gate) can tell which form a given
    * (nlist, dim) resolves to. */
  val LiteralAssignMaxTerms = 16384L

  /** Literal-expression argmin (the pqEncode shape): centroids are
    * driver-side values, so the former crossJoin + row_number window
    * multiplied the corpus by nlist and hash-exchanged corpus×nlist
    * rows WITH their embeddings just to pick a per-row minimum —
    * ~nlist× the corpus bytes through the shuffle at 10⁹ vectors.
    * array_min over (dist, centroid_id) structs keeps the (dist, id)
    * lexicographic tie-break and the double arithmetic
    * (-dot/|centroid|: the row's own norm is constant across
    * centroids and cannot change the ranking) — one codegen'd map
    * pass, zero exchange. */
  private[graft] def ivfAssignLiteral(corpus: DataFrame,
      vecCol: String, idCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val assignExpr = array(centroids.zipWithIndex.map {
      case (cvec, i) =>
        val w = array(cvec.map(lit): _*)
        struct((-dot(col("cv"), w) / norm(w)).as("dist"),
          lit(i).as("centroid_id"))
    }: _*)
    corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
      .withColumn("centroid_id",
        array_min(assignExpr).getField("centroid_id"))
      .select(col("corpus_id"), col("cv"), col("centroid_id"))
  }

  /** Broadcast-kernel argmin (the `KMeans.assign` shape) — the scale
    * form of [[ivfAssignLiteral]] for large nlist: centroids and
    * their norms broadcast once, one primitive mapPartitions pass
    * computes each row's argmin with zero exchange and a plan whose
    * size is INDEPENDENT of nlist. Bit-identical to the literal form
    * (spec-pinned at nlist 256): the same sequential
    * multiply-accumulate over doubles the native [[dot]] expression
    * performs, the same `-dot/|centroid|` distance, and ascending-id
    * iteration with strict `<` keeps the lexicographic (dist, id)
    * tie-break. */
  private[graft] def ivfAssignKernel(corpus: DataFrame,
      vecCol: String, idCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val spark = corpus.sparkSession
    val norms = centroids.map { c =>
      var s = 0.0
      var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }
    val bcC = spark.sparkContext.broadcast(centroids)
    val bcN = spark.sparkContext.broadcast(norms)
    val prepared = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).as("cv"))
    val outSchema = prepared.schema.add("centroid_id",
      org.apache.spark.sql.types.IntegerType)
    val dim = centroids.head.length
    prepared.mapPartitions { rows =>
      val cents = bcC.value
      val ns = bcN.value
      rows.map { r =>
        // malformed vectors (null, wrong length, null element) MUST
        // match the literal form bit-for-bit: there every dist is
        // null, struct ordering puts null dist first, and array_min
        // resolves to (null, 0) — centroid_id 0 — so the auto-switch
        // can never change which rows survive retrieval
        val malformed = r.isNullAt(1) || {
          val v0 = r.getSeq[Number](1)
          v0.length != dim || v0.contains(null)
        }
        if (malformed)
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ 0)
        else {
          // boxed Number covers float/double/int/long embeddings;
          // doubleValue() is the same widening the literal form's
          // dot expression applies per element
          val v = r.getSeq[Number](1)
          var best = 0
          var bd = Double.MaxValue
          var j = 0
          while (j < cents.length) {
            val c = cents(j)
            var s = 0.0
            var i = 0
            while (i < c.length) {
              s += v(i).doubleValue() * c(i)
              i += 1
            }
            val d = -s / ns(j)
            if (d < bd) { bd = d; best = j }
            j += 1
          }
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ best)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Product-quantization codebooks: split the dimension into `m`
    * subspaces and k-means each on a driver-collected sample (bounded,
    * like IVF's coarse quantizer). The sample is HASH-RANKED by id
    * (`xxhash64(seed, id)` ascending — the same rule [[ivfTopK]]
    * applies): a bare `limit()` takes whatever partitions answer
    * first, so codebooks (hence codes, hence top-k results) would
    * differ across runs/layouts. Returns codebooks(j)(c) = centroid
    * c of subspace j. */
  def pqCodebooks(corpus: DataFrame, vecCol: String, idCol: String,
      m: Int = 8, ksub: Int = 16, sampleSize: Int = 2048,
      seed: Long = 42, iterations: Int = 5)
      : Array[Array[Array[Double]]] = {
    val sample = hashRankedSample(corpus, vecCol, idCol, sampleSize,
      seed)
    require(sample.nonEmpty, "pq needs a non-empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val ds = dim / m
    Array.tabulate(m) { j =>
      kmeans(sample.map(_.slice(j * ds, (j + 1) * ds)), ksub,
        iterations, seed + j)
    }
  }

  /** PQ-encode a vector column: per subspace, the index of the nearest
    * codebook centroid — an `array<int>` of length m replacing dim
    * floats (dim=64, m=8, ksub=16 → 256 bytes → 8 codes: 32×
    * compression). Pure expression over literal codebooks: the argmin
    * is an `array_min` over (distance, code) structs, so encoding is a
    * single codegen'd map pass — no shuffle, no UDF. */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]])
      : Column = {
    val m = codebooks.length
    val ds = codebooks.head.head.length
    array((0 until m).map { j =>
      val sub = slice(vec, j * ds + 1, ds)
      val cands = array(codebooks(j).zipWithIndex.map { case (cent, c) =>
        val w = array(cent.map(lit): _*)
        // MEASURED NEGATIVE RESULT: replacing this interpreted HOF
        // with a native codegen'd subtract-square expression (a
        // DotProduct-style loop) made q81 1.7x SLOWER — m×ksub = 128
        // inlined loops per row blow the generated method past the
        // JIT's huge-method limit, so the "codegen" runs
        // deoptimized; the interpreter with its cached literal
        // arrays wins at this expression count. Revisit only if the
        // encode becomes one or a few expression instances.
        struct(
          aggregate(zip_with(sub, w, (x, cj) =>
            (x.cast("double") - cj) * (x.cast("double") - cj)),
            lit(0.0), (acc, v) => acc + v).as("dist"),
          lit(c).as("code"))
      }: _*)
      array_min(cands).getField("code")
    }: _*)
  }

  /** PQ top-k with asymmetric distance computation: corpus vectors are
    * quantized to m codes; each query precomputes (on the driver —
    * queries are few by contract, as in [[bruteForceTopK]]) a lookup
    * table of squared distances to every (subspace, centroid), and a
    * corpus row's distance is m table lookups summed — no
    * per-pair float arithmetic over the original vectors at all. The
    * scan reads codes (m small ints), not embeddings: this is the
    * shape that searches a 100 TB vector corpus from a compressed
    * columnar index. Returns (query_id, corpus_id, adc_dist, rank)
    * ranked by ascending approximate L2. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, queryIdCol: String, k: Int, m: Int = 8,
      ksub: Int = 16, sampleSize: Int = 2048, seed: Long = 42,
      iterations: Int = 5): DataFrame =
    pqTopKWithCodebooks(corpus, queries, vecCol, idCol, queryIdCol, k,
      pqCodebooks(corpus, vecCol, idCol, m, ksub, sampleSize, seed,
        iterations))

  /** [[pqTopK]] with CALLER-SUPPLIED codebooks — a persisted PQ model,
    * or replicable codebooks (data subvectors picked by a deterministic
    * id rule) a cross-engine oracle can rebuild. Same encode / ADC /
    * rank engine. */
  def pqTopKWithCodebooks(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String, k: Int,
      books: Array[Array[Array[Double]]]): DataFrame = {
    require(books.nonEmpty && books.head.nonEmpty, "pq needs codebooks")
    val spark = corpus.sparkSession
    import spark.implicits._
    val m = books.length
    val ksub = books.head.length
    val ds = books.head.head.length
    val encoded = corpus.select(col(idCol).as("corpus_id"),
      pqEncode(col(vecCol), books).as("codes"))
    // id-type AGNOSTIC like every sibling top-k (a hard-coded
    // getLong would ClassCastException on the string/int ids the
    // text pipeline uses): keep the raw id value and rebuild the
    // LUT frame with the query id column's ORIGINAL type
    val lutRows = collectQueryRows(queries, queryIdCol, vecCol,
      "pqTopKWithCodebooks").map { r =>
        val qv = r.getSeq[Float](1).map(_.toDouble).toArray
        val lut = Array.tabulate(m * ksub) { i =>
          val (j, c) = (i / ksub, i % ksub)
          var d = 0.0
          var t = 0
          while (t < ds) {
            val diff = qv(j * ds + t) - books(j)(c)(t)
            d += diff * diff; t += 1
          }
          d
        }
        org.apache.spark.sql.Row(r.get(0), lut.toSeq)
      }
    val qLut = spark.createDataFrame(
      java.util.Arrays.asList(lutRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        queries.schema(queryIdCol).copy(name = "query_id"),
        org.apache.spark.sql.types.StructField("lut",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, false)))))
    val scored = encoded.crossJoin(broadcast(qLut))
      .withColumn("adc_dist",
        aggregate(
          zip_with(col("codes"),
            sequence(lit(0), lit(m - 1)),
            (code, j) => element_at(col("lut"), j * ksub + code + 1)),
          lit(0.0), (acc, v) => acc + v))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist"), col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("adc_dist"),
        col("rank"))
  }

  /** IVF-PQ top-k (the FAISS "IVFADC" composition — Jégou et al.
    * 2011, "Product Quantization for Nearest Neighbor Search" §IV):
    * THE production shape for billion-to-trillion-vector search. A
    * coarse inverted file bounds each query's candidate scan to
    * `nprobe` of `nlist` cells, and inside a cell a corpus vector
    * exists only as m small codes of its RESIDUAL (vector − assigned
    * centroid) — so the scan reads codes, never embeddings, and a
    * candidate's distance is m table lookups against a per-(query,
    * probed-cell) LUT over the QUERY residual. Residual encoding is
    * what separates IVFADC from probing a plain [[pqTopK]] index: the
    * residual distribution is far tighter than the raw space, so the
    * same codebook budget quantizes much finer.
    *
    * Composition, all existing engines: coarse assignment is the
    * [[ivfTopKWithCentroids]] literal↔kernel auto-switch (squared-L2
    * metric here — the IVFADC convention; the cosine IVF keeps its
    * own gate), residual encode is [[pqEncode]] over the subtracted
    * vectors, ADC is [[pqTopKWithCodebooks]]' j-ordered fold.
    * Scale shape: assignment and encode are exchange-free map passes;
    * the only join is codes ⨝ broadcast(query LUTs) restricted to
    * probed cells; ranking is a per-query window over candidate-scale
    * rows. Training (this convenience form) follows [[ivfTopK]]:
    * hash-ranked sample → driver k-means coarse quantizer → PQ
    * codebooks fit on the SAMPLE'S RESIDUALS (the FAISS train order).
    * Returns (query_id, corpus_id, adc_dist, rank), ascending
    * approximate L2. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, queryIdCol: String, k: Int, nlist: Int = 8,
      m: Int = 8, ksub: Int = 16, nprobe: Int = 4,
      sampleSize: Int = 2048, seed: Long = 42, iterations: Int = 5)
      : DataFrame = {
    val (centroids, books) = ivfPqTrain(corpus, vecCol, idCol, nlist,
      m, ksub, sampleSize, seed, iterations)
    ivfPqTopKWithParams(corpus, queries, vecCol, idCol, queryIdCol, k,
      centroids, books, nprobe)
  }

  /** The TRAINING half of [[ivfPqTopK]], exposed for callers that
    * persist the model (the `VectorIndexStore` freezes it at
    * initialize — the FAISS operating convention: codes stay
    * comparable across ingest batches only under one model): coarse
    * k-means on a hash-ranked sample, then PQ codebooks fit on the
    * SAMPLE'S RESIDUALS. Returns (centroids, books). */
  def ivfPqTrain(corpus: DataFrame, vecCol: String, idCol: String,
      nlist: Int = 8, m: Int = 8, ksub: Int = 16,
      sampleSize: Int = 2048, seed: Long = 42, iterations: Int = 5)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val sample = hashRankedSample(corpus, vecCol, idCol, sampleSize,
      seed)
    require(sample.nonEmpty, "ivfpq needs a non-empty corpus")
    val centroids = kmeans(sample, nlist, iterations, seed)
    (centroids, residualBooks(sample, centroids, m, ksub, seed,
      iterations))
  }

  // the residual-codebook tail BOTH train forms share (driver-sample
  // and distributed coarse fits): subtract each sample vector's
  // assigned centroid, fit one ksub-way k-means per subspace on the
  // residual slices — the FAISS train order. One implementation so
  // the codebook convention can never drift between the two paths
  // the specs pin as equivalent engines.
  private def residualBooks(sample: Array[Array[Double]],
      centroids: Array[Array[Double]], m: Int, ksub: Int,
      seed: Long, iterations: Int): Array[Array[Array[Double]]] = {
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    require(centroids.head.length == dim,
      s"coarse centroids have ${centroids.head.length} dims, " +
        s"sample vectors $dim")
    val ds = dim / m
    val residuals = sample.map { p =>
      val c = centroids(nearestSq(p, centroids))
      Array.tabulate(dim)(i => p(i) - c(i))
    }
    Array.tabulate(m) { j =>
      kmeans(residuals.map(_.slice(j * ds, (j + 1) * ds)), ksub,
        iterations, seed + j)
    }
  }

  /** [[ivfPqTrain]] with the COARSE quantizer fit DISTRIBUTED over
    * the full corpus — the large-nlist form. The driver form trains
    * on a collected sample, and FAISS's own sizing rule wants
    * ~39×nlist training vectors: at production coarse sizes
    * (nlist 2¹⁴–2¹⁶ for 10⁹–10¹² vectors) that is corpus-scale
    * training data no driver should hold or iterate. Here the coarse
    * fit is [[KMeans.fitSampleSeeded]] — one-scan hash-ranked
    * seeding + exchange-free exact-integer Lloyd passes over the
    * corpus (k×(dims+1) longs per task to the driver per iteration,
    * deterministic under any partitioning) — and the centroids come
    * back as micros/1e6 doubles for the double-based
    * assignment/LUT engines. Residual codebooks still fit on a
    * driver sample (m small k-means of ksub ≤ 256 codewords each —
    * sample-scale by design, the FAISS convention). */
  def ivfPqTrainDistributed(corpus: DataFrame, vecCol: String,
      idCol: String, nlist: Int = 1024, m: Int = 8, ksub: Int = 16,
      sampleSize: Int = 2048, seed: Long = 42, iterations: Int = 5,
      lloydIters: Int = 5)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val model = KMeans.fitSampleSeeded(
      corpus.select(col(idCol), col(vecCol)), vecCol, idCol, nlist,
      lloydIters, seed)
    val centroids = model.centroids
      .map(_.map(_ / 1e6).toArray).toArray
    val sample = hashRankedSample(corpus, vecCol, idCol, sampleSize,
      seed)
    require(sample.nonEmpty, "ivfpq needs a non-empty corpus")
    (centroids, residualBooks(sample, centroids, m, ksub, seed,
      iterations))
  }

  /** [[ivfPqTopK]] with a CALLER-SUPPLIED coarse quantizer and
    * residual codebooks — a persisted model, or replicable parameters
    * (data rows picked by a deterministic id rule) a cross-engine
    * oracle can rebuild (q152). Same assignment / residual-encode /
    * LUT / ADC / rank engine. */
  def ivfPqTopKWithParams(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String, k: Int,
      centroids: Array[Array[Double]],
      books: Array[Array[Array[Double]]], nprobe: Int): DataFrame =
    ivfPqTopKFromCodes(
      ivfPqCodeTable(corpus, vecCol, idCol, centroids, books),
      queries, vecCol, queryIdCol, k, centroids, books, nprobe)

  /** The BUILD half of [[ivfPqTopKWithParams]]: the persistable index
    * artifact — one row per corpus vector, (corpus_id, centroid_id,
    * codes), m small ints instead of dim floats. Write it
    * `partitionBy("centroid_id")` and the parquet layout IS the
    * inverted file: [[ivfPqTopKFromCodes]] filters to its queries'
    * probed cells before anything else, so partition pruning skips
    * every other cell's files at the directory level — a query
    * touches nprobe directories of a 100 TB index, not the index.
    * Build shape: exchange-free end to end (literal↔kernel L2
    * assignment + the kernel residual encode). */
  def ivfPqCodeTable(corpus: DataFrame, vecCol: String, idCol: String,
      centroids: Array[Array[Double]],
      books: Array[Array[Array[Double]]]): DataFrame = {
    require(centroids.nonEmpty, "ivfpq needs at least one centroid")
    requireIvfPqShapes(centroids, books)
    val dim = centroids.head.length
    // coarse assignment by squared L2 — exchange-free, same
    // literal↔kernel auto-switch as the cosine IVF
    val assigned =
      if (centroids.length.toLong * dim <= LiteralAssignMaxTerms)
        ivfPqAssignLiteral(corpus, vecCol, idCol, centroids)
      else ivfPqAssignKernel(corpus, vecCol, idCol, centroids)
    // residual encode in ONE primitive mapPartitions pass. KERNEL,
    // not the pqEncode expression: the interpreted m×ksub HOF argmin
    // costs ~30 µs/vector (measured 60 s of a 66 s end-to-end at
    // 2M×64 — fine at query-gate row counts, dominating at corpus
    // scale), while the JIT'd primitive loop does the same double
    // arithmetic in the same order for a fraction of it; bit-parity
    // with the expression form is spec-pinned, malformed rows
    // included. The centroids ride the kernel's broadcast, indexed by
    // each row's centroid_id — never joined on as a per-row dim-wide
    // array column.
    pqEncodeResidualKernel(assigned, centroids, books)
  }

  /** The PROBE half of [[ivfPqTopKWithParams]], over a (corpus_id,
    * centroid_id, codes) table — in-memory from [[ivfPqCodeTable]] or
    * read back from its partitioned parquet form (search never
    * touches an embedding). The probed-cell set is driver-known (it
    * falls out of building the LUTs), so the stored scan is filtered
    * to `centroid_id IN (probed)` BEFORE the join — that filter is
    * what partition-prunes a `partitionBy("centroid_id")` layout down
    * to nprobe directories. */
  def ivfPqTopKFromCodes(codeTable: DataFrame, queries: DataFrame,
      vecCol: String, queryIdCol: String, k: Int,
      centroids: Array[Array[Double]],
      books: Array[Array[Array[Double]]], nprobe: Int): DataFrame = {
    require(centroids.nonEmpty, "ivfpq needs at least one centroid")
    requireIvfPqShapes(centroids, books)
    val spark = codeTable.sparkSession
    val m = books.length
    val ksub = books.head.length
    val ds = books.head.head.length
    // per-(query, probed cell) LUT over the QUERY residual, built on
    // the driver — queries are few by contract (pqTopKWithCodebooks'
    // rule, enforced by the MaxQueryCollect guard), and each LUT is
    // m×ksub doubles
    val lutRows = collectQueryRows(queries, queryIdCol, vecCol,
      "ivfPqTopKFromCodes").flatMap { r =>
        val qv = r.getSeq[Number](1).map(_.doubleValue()).toArray
        val probed = centroids.indices
          .map(cid => (sqDistTo(qv, centroids(cid)), cid))
          .sorted.take(nprobe).map(_._2) // (dist, id) lexicographic
        probed.map { cid =>
          val cvec = centroids(cid)
          val lut = Array.tabulate(m * ksub) { i =>
            val (j, c) = (i / ksub, i % ksub)
            var d = 0.0
            var t = 0
            while (t < ds) {
              val diff = (qv(j * ds + t) - cvec(j * ds + t)) -
                books(j)(c)(t)
              d += diff * diff; t += 1
            }
            d
          }
          org.apache.spark.sql.Row(r.get(0), cid, lut.toSeq)
        }
      }
    val qLut = spark.createDataFrame(
      java.util.Arrays.asList(lutRows.toIndexedSeq: _*),
      org.apache.spark.sql.types.StructType(Seq(
        queries.schema(queryIdCol).copy(name = "query_id"),
        org.apache.spark.sql.types.StructField("centroid_id",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("lut",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, false)))))

    // the probed-cell filter + centroid_id equi-join IS the
    // inverted-file probe: only rows of probed cells are ever read
    // (partition-pruned on a partitioned layout) or meet a LUT
    val probedCells = lutRows.map(_.getInt(1)).distinct.toSeq
    val pruned =
      if (probedCells.isEmpty) codeTable.where(lit(false)) // no queries
      else codeTable.where(col("centroid_id").isInCollection(probedCells))
    // VALIDATE the codes against THIS model before any LUT lookup:
    // requireIvfPqShapes checks only the model, so a caller-supplied
    // table persisted under a different ksub/m would otherwise read
    // the WRONG LUT slot when the stale code is still in bounds
    // (silently wrong distances) or land a null adc_dist that the
    // ascending nulls-first window ranks at 1 (silently garbage
    // top-k). Candidate-scale rows only (probed cells), so the check
    // is not a corpus-scan cost.
    // forall-not-null FIRST: array_min/array_max SKIP null elements,
    // so a row like [null, 3] would pass the range check and fold a
    // null adc_dist that the ascending nulls-first window ranks at 1
    val checked = pruned.withColumn("codes",
      when(size(col("codes")) === m &&
          forall(col("codes"), c => c.isNotNull) &&
          array_min(col("codes")) >= 0 &&
          array_max(col("codes")) < ksub, col("codes"))
        .otherwise(raise_error(concat(
          lit(s"ivfPqTopKFromCodes: code row of corpus_id "),
          col("corpus_id").cast("string"),
          lit(s" does not fit the supplied model (m=$m, ksub=$ksub)" +
            " — the table was built under a different quantizer")))))
    val scored = checked
      .join(broadcast(qLut), Seq("centroid_id"))
      .withColumn("adc_dist",
        aggregate(
          zip_with(col("codes"),
            sequence(lit(0), lit(m - 1)),
            (code, j) => element_at(col("lut"), j * ksub + code + 1)),
          lit(0.0), (acc, v) => acc + v))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist"), col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("adc_dist"),
        col("rank"))
  }

  /** [[ivfPqTopKFromCodes]] for CORPUS-SCALE query tables — the
    * distributed twin of the driver-LUT probe, for the regime past
    * [[MaxQueryCollect]] (batch re-embedding sweeps, all-pairs
    * retrieval audits): no driver collect anywhere, so a 10M-row
    * query table is a legal input.
    *
    * Topology: a broadcast-centroid KERNEL assigns each query its
    * nprobe probed cells (same (dist, id) lexicographic order as the
    * LUT path) and emits the query RESIDUAL per probed cell; the code
    * table joins those probe rows on `centroid_id` (both sides
    * shuffle — at corpus-scale queries most cells are probed by
    * someone, so reading the whole compressed index once is the
    * optimal scan, unlike the few-queries path's directory pruning;
    * AQE's skew-join split covers hot cells); a broadcast-codebook
    * kernel then scores each (codes, residual) pair DIRECTLY —
    * adc = Σ_j ‖qres_j − book_j[code_j]‖², the same doubles in the
    * same order as the LUT build + fold, so distances are
    * bit-identical to [[ivfPqTopKFromCodes]] (spec-pinned). Returns
    * (query_id, corpus_id, adc_dist, rank) like the LUT form.
    *
    * Loud failures, not silent garbage: a malformed query vector
    * (null / wrong dim / null element) and a code row that does not
    * fit the model (size ≠ m, code ∉ [0, ksub)) both throw named
    * errors from the kernels. */
  def ivfPqTopKManyQueries(codeTable: DataFrame, queries: DataFrame,
      vecCol: String, queryIdCol: String, k: Int,
      centroids: Array[Array[Double]],
      books: Array[Array[Array[Double]]], nprobe: Int): DataFrame = {
    require(centroids.nonEmpty, "ivfpq needs at least one centroid")
    requireIvfPqShapes(centroids, books)
    require(nprobe >= 1 && nprobe <= centroids.length,
      s"nprobe must be in [1, ${centroids.length}], got $nprobe")
    val spark = codeTable.sparkSession
    val m = books.length
    val ksub = books.head.length
    val ds = books.head.head.length
    val dim = centroids.head.length
    val bcC = spark.sparkContext.broadcast(centroids)
    val bcB = spark.sparkContext.broadcast(books)

    // probe-assignment kernel: (query_id, centroid_id, qres)
    val prepared = queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).as("qv"))
    val probeSchema = org.apache.spark.sql.types.StructType(Seq(
      prepared.schema.head.copy(name = "query_id"),
      org.apache.spark.sql.types.StructField("centroid_id",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("qres",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, false))))
    val probes = prepared.mapPartitions { rows =>
      val cents = bcC.value
      rows.flatMap { r =>
        if (r.isNullAt(1))
          throw new IllegalArgumentException(
            s"ivfPqTopKManyQueries: null query vector for id ${r.get(0)}")
        val v0 = r.getSeq[Number](1)
        if (v0.length != dim || v0.contains(null))
          throw new IllegalArgumentException(
            "ivfPqTopKManyQueries: malformed query vector for id " +
              s"${r.get(0)} (dim ${v0.length}, model dim $dim)")
        val qv = Array.tabulate(dim)(i => v0(i).doubleValue())
        // (dist, id) lexicographic over ALL centroids — the exact
        // probed-cell rule of the driver-LUT path
        val scored = Array.tabulate(cents.length) { cid =>
          val c = cents(cid)
          var s = 0.0
          var i = 0
          while (i < dim) {
            val diff = qv(i) - c(i); s += diff * diff; i += 1
          }
          (s, cid)
        }
        scored.sortBy(identity).take(nprobe).iterator.map {
          case (_, cid) =>
            val c = cents(cid)
            val qres = Array.tabulate(dim)(i => qv(i) - c(i))
            org.apache.spark.sql.Row(r.get(0), cid, qres.toSeq)
        }
      }
    }(org.apache.spark.sql.Encoders.row(probeSchema))

    // centroid_id equi-join: the many-queries probe reads the whole
    // compressed index once (no driver-known cell set to prune by)
    val joined = codeTable
      .select(col("centroid_id"), col("corpus_id"), col("codes"))
      .join(probes, Seq("centroid_id"))
      .select(col("query_id"), col("corpus_id"), col("codes"),
        col("qres"))

    // direct-ADC kernel: same doubles, same order as LUT-entry build
    // ((qv−c)−book, squared, summed over t) + the j-ascending fold
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      joined.schema.head,
      joined.schema(1),
      org.apache.spark.sql.types.StructField("adc_dist",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    val scored = joined.mapPartitions { rows =>
      val bks = bcB.value
      rows.map { r =>
        val codes = if (r.isNullAt(2)) null else r.getSeq[Number](2)
        if (codes == null || codes.length != m ||
            codes.exists(c => c == null || c.intValue() < 0 ||
              c.intValue() >= ksub))
          throw new IllegalArgumentException(
            "ivfPqTopKManyQueries: stored codes for corpus id " +
              s"${r.get(1)} do not fit the supplied model " +
              s"(m=$m, ksub=$ksub) — the table was built under a " +
              "different quantizer")
        val qres = r.getSeq[Double](3)
        // per-subspace subtotal FIRST, then the j-ascending fold —
        // the LUT path's summation order exactly (each LUT entry is
        // its own Σ_t from 0.0; the adc fold then adds entries), so
        // distances are bit-identical, not merely close
        var d = 0.0
        var j = 0
        while (j < m) {
          val w = bks(j)(codes(j).intValue())
          var dj = 0.0
          var t = 0
          while (t < ds) {
            val diff = qres(j * ds + t) - w(t)
            dj += diff * diff; t += 1
          }
          d += dj
          j += 1
        }
        org.apache.spark.sql.Row(r.get(0), r.get(1), d)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist"), col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("adc_dist"),
        col("rank"))
  }

  /** Exact re-ranking over IVF-PQ candidates — the FAISS
    * `IndexRefineFlat` step, the recall knob production IVFADC
    * deployments turn first: 8×-compressed residual codes lose
    * ordering among near-ties, so over-fetch k′ = `refineFactor`×k
    * candidates from the compressed index ([[ivfPqTopKFromCodes]]),
    * re-score JUST those candidates against their exact vectors, and
    * re-keep the true top k. Recall@k rises toward the probed-cell
    * ceiling (candidates outside the nprobe cells stay invisible —
    * raise nprobe for that axis) at the cost of fetching k′ exact
    * vectors per query.
    *
    * Scale shape: the candidate set is queries×k′ rows (small by the
    * MaxQueryCollect contract), so the exact-vector fetch is a
    * PRUNED id lookup against the stored corpus
    * ([[graft.text.Curation.fetchByKeys]] — chunked-IN pushdown /
    * broadcast semi-join; an id-sorted corpus layout prunes to the
    * candidate row groups), never a corpus re-scan; the re-score is
    * candidate-scale arithmetic. `corpus` is the full-precision
    * vector table ((idCol, vecCol) — the one [[ivfPqCodeTable]]
    * encoded); pass the SAME model and nprobe as the code table's
    * probe. Returns (query_id, corpus_id, exact_dist, rank),
    * ascending exact squared L2. */
  def ivfPqTopKRefined(codeTable: DataFrame, corpus: DataFrame,
      queries: DataFrame, vecCol: String, idCol: String,
      queryIdCol: String, k: Int,
      centroids: Array[Array[Double]],
      books: Array[Array[Array[Double]]], nprobe: Int,
      refineFactor: Int = 4): DataFrame = {
    require(refineFactor >= 1,
      s"refineFactor must be >= 1, got $refineFactor")
    // lazy pin: the candidate lineage (probe + window) is consumed
    // twice below — once by the fetch's key collect, once by the
    // re-score join — and would re-execute the whole probe otherwise
    val candidates = ivfPqTopKFromCodes(codeTable, queries, vecCol,
        queryIdCol, k * refineFactor, centroids, books, nprobe)
      .select(col("query_id"), col("corpus_id"))
      .localCheckpoint(false)
    val fetched = graft.text.Curation.fetchByKeys(
      corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv")),
      "corpus_id", candidates)
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).as("qv"))
    // exact squared L2 — the metric the ADC approximates; sequential
    // index-order fold (the engine-wide double-arithmetic convention,
    // so a cross-engine oracle can replay it)
    val rescored = candidates
      .join(fetched, Seq("corpus_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("exact_dist",
        aggregate(
          zip_with(col("cv"), col("qv"), (a, b) =>
            (a.cast("double") - b.cast("double")) *
              (a.cast("double") - b.cast("double"))),
          lit(0.0), (acc, v) => acc + v))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("exact_dist"), col("corpus_id"))
    rescored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("exact_dist"),
        col("rank"))
  }

  private def requireIvfPqShapes(centroids: Array[Array[Double]],
      books: Array[Array[Array[Double]]]): Unit = {
    require(books.nonEmpty && books.head.nonEmpty, "ivfpq needs codebooks")
    // a RAGGED caller-supplied model (a persisted table missing rows
    // for one subspace, say) must fail HERE with a named error, not
    // as an ArrayIndexOutOfBounds in the LUT build or the encode
    // kernel
    require(books.forall(_.length == books.head.length),
      s"ragged codebooks: ksub differs across subspaces " +
        s"(${books.map(_.length).mkString(",")})")
    require(books.forall(_.forall(_.length == books.head.head.length)),
      "ragged codebooks: codeword dims differ")
    val covered = books.length * books.head.head.length
    require(covered == centroids.head.length,
      s"codebooks cover $covered dims, centroids have " +
        s"${centroids.head.length}")
  }

  /** Hard cap on the query-table collects behind the driver-side
    * per-query LUT builders ([[pqTopKWithCodebooks]],
    * [[ivfPqTopKFromCodes]]). Those entry points are few-queries by
    * contract — each query costs an m×ksub LUT built on the driver —
    * and a caller who points a corpus-scale query table at one should
    * get a NAMED error at plan-build, not a silent driver stall/OOM
    * (the ScaleGuard stance, [[graft.text.Dedup]]'s all-pairs
    * precedent). `var` so specs can exercise the boundary without a
    * 10k-row fixture. */
  private[graft] var MaxQueryCollect: Int = 10000

  // bounded collect via CollectLimit (stops pulling partitions at the
  // cap) — the MaxProbeCollect pattern from graft.text.Curation
  private def collectQueryRows(queries: DataFrame, queryIdCol: String,
      vecCol: String, caller: String): Array[org.apache.spark.sql.Row] = {
    val rows = queries
      .select(col(queryIdCol).as("query_id"), col(vecCol).as("qv"))
      .limit(MaxQueryCollect + 1).collect()
    require(rows.length <= MaxQueryCollect,
      s"$caller: query table exceeds $MaxQueryCollect rows — the " +
        "per-query LUT build is driver-side by contract (few " +
        "queries). Batch the query table, or use bruteForceTopK / " +
        "sq8TopKFromCodes (broadcast queries, no driver collect) " +
        "for corpus-scale query sets.")
    rows
  }

  // the ONE hash-ranked sampling rule every driver-side model fit
  // uses (ivfTopK, pqCodebooks, ivfPqTrain): xxhash64(seed, id)
  // ascending — a bare limit() takes whatever partitions answer
  // first, so models (hence results) would differ across
  // runs/layouts/AQE re-plans
  private def hashRankedSample(corpus: DataFrame, vecCol: String,
      idCol: String, sampleSize: Int, seed: Long)
      : Array[Array[Double]] =
    corpus
      .select(col(vecCol), xxhash64(lit(seed), col(idCol)).as("hr_"))
      .orderBy(col("hr_")).limit(sampleSize)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  /** Residual PQ encode as a broadcast-kernel mapPartitions pass —
    * the corpus-scale form of `pqEncode(rv, books)` over a frame
    * carrying (corpus_id, cv, centroid_id); the centroid vectors ride
    * the broadcast (indexed by the row's centroid_id) rather than a
    * join — a per-row dim-double centroid column is pure transport
    * weight at corpus scale. Bit-identical
    * to the expression path (spec-pinned): the same sequential
    * `(rv[t] − w[t])²` accumulate per subspace (rv = element-wise
    * `cv − centroid` in index order), ascending-code iteration with
    * strict `<` = the (dist, code) struct-min tie-break, and the
    * expression form's malformed contract, which is PER SUBSPACE —
    * a subspace whose slice touches a null or missing element gets a
    * null dist for every candidate there, and array_min resolves to
    * (null, 0) = code 0, while the OTHER subspaces of the same row
    * still encode normally (so a single null element zeroes one code,
    * not the row, and a longer-than-dim vector encodes from its first
    * dim elements exactly as the slices would). */
  private[graft] def pqEncodeResidualKernel(df: DataFrame,
      centroids: Array[Array[Double]],
      books: Array[Array[Array[Double]]]): DataFrame = {
    val spark = df.sparkSession
    val m = books.length
    val ksub = books.head.length
    val ds = books.head.head.length
    val bcB = spark.sparkContext.broadcast(books)
    val bcC = spark.sparkContext.broadcast(centroids)
    val prepared = df.select(col("corpus_id"), col("centroid_id"),
      col("cv"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      prepared.schema("corpus_id"),
      prepared.schema("centroid_id"),
      org.apache.spark.sql.types.StructField("codes",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType, containsNull = false))))
    prepared.mapPartitions { rows =>
      val bks = bcB.value
      val cents = bcC.value
      rows.map { r =>
        val nullVec = r.isNullAt(2)
        val v = if (nullVec) null else r.getSeq[Number](2)
        val cent = cents(r.getInt(1))
        val codes = Array.tabulate(m) { j =>
          val base = j * ds
          var ok = !nullVec && base + ds <= v.length
          if (ok) {
            var t = 0
            while (ok && t < ds) {
              if (v(base + t) == null) ok = false
              t += 1
            }
          }
          if (!ok) 0
          else {
            var best = 0
            var bd = Double.MaxValue
            var c = 0
            while (c < ksub) {
              val w = bks(j)(c)
              var s = 0.0
              var t = 0
              while (t < ds) {
                val diff = (v(base + t).doubleValue() -
                  cent(base + t)) - w(t)
                s += diff * diff; t += 1
              }
              if (s < bd) { bd = s; best = c }
              c += 1
            }
            best
          }
        }
        org.apache.spark.sql.Row(r.get(0), r.get(1), codes.toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  // driver-side squared L2, sequential index order — the same
  // operation order as the literal/kernel assignment forms, so the
  // query-side probe choice can never diverge from the corpus side's
  private def sqDistTo(v: Array[Double], c: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < c.length) { val diff = v(i) - c(i); d += diff * diff; i += 1 }
    d
  }

  private def nearestSq(p: Array[Double],
      centroids: Array[Array[Double]]): Int = {
    var best = 0
    var bd = Double.MaxValue
    var j = 0
    while (j < centroids.length) {
      val d = sqDistTo(p, centroids(j))
      if (d < bd) { bd = d; best = j }
      j += 1
    }
    best
  }

  /** Squared-L2 literal argmin — [[ivfAssignLiteral]]'s shape with the
    * IVFADC metric: one codegen'd map pass, zero exchange, (dist,
    * centroid_id) lexicographic tie-break via struct array_min.
    * Malformed vectors (null / wrong length / null element) yield a
    * null dist, which struct ordering sorts first → centroid_id 0 —
    * the contract the kernel form below mirrors bit-for-bit. */
  private[graft] def ivfPqAssignLiteral(corpus: DataFrame,
      vecCol: String, idCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val assignExpr = array(centroids.zipWithIndex.map {
      case (cvec, i) =>
        val w = array(cvec.map(lit): _*)
        struct(
          aggregate(zip_with(col("cv"), w, (x, c) =>
            (x.cast("double") - c) * (x.cast("double") - c)),
            lit(0.0), (acc, v) => acc + v).as("dist"),
          lit(i).as("centroid_id"))
    }: _*)
    corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
      .withColumn("centroid_id",
        array_min(assignExpr).getField("centroid_id"))
      .select(col("corpus_id"), col("cv"), col("centroid_id"))
  }

  /** Broadcast-kernel squared-L2 argmin — [[ivfAssignKernel]]'s shape
    * with the IVFADC metric, for nlist×dim past
    * [[LiteralAssignMaxTerms]]: plan size independent of nlist,
    * bit-identical to the literal form (same sequential
    * subtract-square-accumulate per element, ascending-id iteration
    * with strict `<` = the (dist, id) tie-break, malformed rows →
    * centroid 0). */
  private[graft] def ivfPqAssignKernel(corpus: DataFrame,
      vecCol: String, idCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val spark = corpus.sparkSession
    val bcC = spark.sparkContext.broadcast(centroids)
    val prepared = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).as("cv"))
    val outSchema = prepared.schema.add("centroid_id",
      org.apache.spark.sql.types.IntegerType)
    val dim = centroids.head.length
    prepared.mapPartitions { rows =>
      val cents = bcC.value
      rows.map { r =>
        val malformed = r.isNullAt(1) || {
          val v0 = r.getSeq[Number](1)
          v0.length != dim || v0.contains(null)
        }
        if (malformed)
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ 0)
        else {
          val v = r.getSeq[Number](1)
          var best = 0
          var bd = Double.MaxValue
          var j = 0
          while (j < cents.length) {
            val c = cents(j)
            var s = 0.0
            var i = 0
            while (i < c.length) {
              val diff = v(i).doubleValue() - c(i)
              s += diff * diff
              i += 1
            }
            if (s < bd) { bd = s; best = j }
            j += 1
          }
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ best)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** tiny driver-side k-means (for IVF coarse quantization) */
  def kmeans(points: Array[Array[Double]], k: Int, iterations: Int,
      seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty)
    val rng = new scala.util.Random(seed)
    val dim = points.head.length
    var centroids = rng.shuffle(points.toVector).take(k).map(_.clone)
      .toArray
    for (_ <- 0 until iterations) {
      val sums = Array.fill(k)(Array.ofDim[Double](dim))
      val counts = Array.ofDim[Int](k)
      points.foreach { p =>
        var best = 0; var bestD = Double.MaxValue
        for (c <- 0 until centroids.length) {
          var d = 0.0
          var j = 0
          while (j < dim) {
            val diff = p(j) - centroids(c)(j); d += diff * diff; j += 1
          }
          if (d < bestD) { bestD = d; best = c }
        }
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += p(j); j += 1 }
      }
      for (c <- 0 until k if counts(c) > 0; j <- 0 until dim)
        centroids(c)(j) = sums(c)(j) / counts(c)
    }
    centroids
  }
}
