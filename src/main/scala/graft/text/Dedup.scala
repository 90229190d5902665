package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication for 100 TB text corpora.
  *
  * Scale design: every method reduces to hash-keyed groupBys/joins (one
  * shuffle each, map-side combined) — no cross joins over the corpus.
  * MinHash LSH turns near-dup detection into an equi-join on band
  * buckets; candidate verification only touches bucket collisions. */
object Dedup {

  /** Exact dedup on normalized content: keeps the smallest `idCol` per
    * fingerprint. One hash-shuffle, no sort. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keyed = df.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
    val keep = keyed.groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
    keyed.join(keep, Seq("fp", idCol), "left_semi")
  }

  // (a legacy `minhashSignature(text, numHashes, k)` pure-Column
  // signature was removed: it had zero callers, re-evaluated the
  // inlined shingle expression per hash index — the documented
  // O(tokens²) inline-split trap — and its xxhash64(i, s) values were
  // bucket-incompatible with every Remix64-based signature path; use
  // `shingleHashes` + `minhashSigExpr` / `signatureTable` instead)

  /** Near-duplicate pairs via MinHash+LSH: band-bucket grouping, then
    * exact shingle-set Jaccard on bucket co-members only.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= minJaccard.
    *
    * Plan shape (the 100 TB-safe version):
    *  - documents are scanned ONCE: shingles explode once, each shingle
    *    string is hashed once, and ONE groupBy computes all `numHashes`
    *    min-aggregates (cheap 8-byte remixes, not string re-hashes) PLUS
    *    the distinct shingle-hash set used later for verification —
    *    map-side combined, linear in corpus size;
    *  - candidate pairs come from a groupBy on band buckets (not a
    *    bucket self-join), so a skewed bucket can't blow up a join: a
    *    bucket over `maxBucketSize` (a mass-duplication cluster) emits
    *    linear star pairs against its smallest id instead of quadratic
    *    all-pairs — every member is still linked to the cluster
    *    representative, which is what dedup keep/drop needs. NOTE: pair
    *    completeness therefore holds only for buckets <= maxBucketSize;
    *    in an over-cap bucket, a member whose jaccard to the
    *    representative is < minJaccard is not re-paired against other
    *    co-members, so qualifying pairs strictly inside a giant
    *    heterogeneous bucket can be missed (raise maxBucketSize if that
    *    matters more than skew protection);
    *  - no pre-verify `.distinct()` over candidates (that full shuffle
    *    dominated at scale); the small post-verify result is deduped.
    * Defaults (128 hashes, 16 bands of 8) put the LSH S-curve threshold
    * near (1/16)^(1/8) ~ 0.71 — band collisions of non-near-dups are
    * vanishingly rare, so the verify join stays tiny. */
  /** Skew-capped pair explosion shared by every bucket-join dedup path
    * (minhash bands, simhash blocks, embedding buckets, semdedup
    * clusters): buckets of SORTED members `<= maxBucketSize` emit all
    * ordered pairs (a before b); bigger buckets emit linear star pairs
    * against the first (minimum) member — a degenerate mass-duplicate
    * bucket costs O(n), never O(n²). Returns columns (a, b) of the
    * members' element type. */
  private[graft] def cappedPairs(buckets: DataFrame, membersCol: String,
      maxBucketSize: Int): DataFrame = {
    val ms = col(membersCol)
    // all (ms[i], ms[j]) i<j pairs via TWO codegen generators —
    // posexplode picks the left member, explode(slice(...)) its
    // later partners — instead of one interpreted nested-transform
    // lambda building the m²/2 pair array per bucket (higher-order
    // functions don't codegen; this is the hot inner step of every
    // candidate-pair path). Same pair stream: slice's 1-based start
    // i+2 = "elements after 0-based index i", length size(ms) clamps.
    val small = buckets.where(size(ms) <= maxBucketSize)
      .select(ms.as("ms_"), posexplode(ms).as(Seq("i_", "a")))
      .select(col("a"),
        explode(slice(col("ms_"), col("i_") + 2, size(col("ms_"))))
          .as("b"))
    val big = buckets.where(size(ms) > maxBucketSize)
      .select(element_at(ms, 1).as("a"),
        explode(slice(ms, lit(2), size(ms))).as("b"))
    small.unionByName(big)
  }

  /** Exploded (idCol, s) rows — one row per (document, word-shingle),
    * `s` the 64-bit shingle hash. This is the shared upstream of every
    * minhash path (signatures, banding, set verification) and the
    * expensive part of all of them (tokenize + shingle + hash +
    * explode over the full corpus). Compute it ONCE per corpus —
    * at ingest, or checkpointed at the head of a multi-query session —
    * and feed the `*FromHashes` variants; every downstream hash is an
    * 8-byte remix of `s`, never a re-scan of text. */
  def shingleHashes(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3): DataFrame = {
    // `s` is the output hash column and toks__/sh_str are working
    // names — an idCol colliding with them would silently alias
    require(!Seq("toks__", "sh_str", "s").contains(idCol),
      s"idCol $idCol collides with a reserved working/output column")
    df.withColumn("toks__", TextAnalysis.tokens(lower(col(textCol))))
      .select(col(idCol),
        explode(TextAnalysis.shinglesFromTokens(col("toks__"), k))
          .as("sh_str"))
      .select(col(idCol), xxhash64(col("sh_str")).as("s"))
  }

  /** Fixed splitmix64 finalizer — deterministic per-index constants
    * for the min-hash remixes (NOT a per-run random source). */
  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Per-doc signature-plus-shingle-set table — THE stored artifact of
    * signatures-at-ingest: one groupBy over [[shingleHashes]] rows
    * computing all `numHashes` min-hash columns (h0..h[n-1]) AND the
    * distinct hash set (`gh`), lazily localCheckpointed. Every LSH
    * band layout derives from it by slicing signature columns — a
    * band family over `m <= numHashes` hashes uses h0..h[m-1], whose
    * values are IDENTICAL to a fresh m-hash table (the remix constants
    * are indexed, not width-dependent) — so one stored table serves
    * intra-corpus pair detection, delta-vs-corpus, and clustering at
    * different hash widths.
    *
    * The i-th min-hash remixes the ALREADY-UNIFORM 64-bit shingle
    * hash with a splitmix64-derived multiply-add (odd multiplier,
    * wrapping Remix64 expression): a single Java FMA per (i, row)
    * instead of a fresh xxhash64 — this min-agg stage is the cost
    * center of every LSH path, and min-wise LSH only needs per-i
    * orderings that are independent-ish permutations of a uniform
    * input, not a full re-hash of it. */
  def signatureTable(hashed: DataFrame, idCol: String,
      numHashes: Int = 128, checkpoint: Boolean = true): DataFrame = {
    val minAggs = (0 until numHashes).map { i =>
      min(graft.functions.Remix64(col("s"),
        splitmix64(2L * i) | 1L, splitmix64(2L * i + 1))).as(s"h$i")
    }
    val sigs = hashed.groupBy(col(idCol))
      .agg(minAggs.head, (minAggs.tail :+
        collect_set(col("s")).as("gh")): _*)
    // the barrier serves MULTI-consumer in-memory use (band + verify
    // branches would otherwise recompute the agg); an ingest that
    // writes the table straight to parquet has ONE consumer and must
    // not pin a corpus-scale artifact in the block manager —
    // checkpoint = false is the stored-ingest shape
    if (checkpoint) sigs.localCheckpoint(false) else sigs
  }

  /** (docSets, banded) band layout off a [[signatureTable]]: `banded`
    * explodes each doc's `bands` bucket keys from the first
    * `numHashes` signature columns; `docSets` carries the verify-side
    * shingle sets. The table may be wider than `numHashes`. */
  private def bandsFromSigTable(sigTable: DataFrame, idCol: String,
      numHashes: Int, bands: Int): (DataFrame, DataFrame) = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val docSets = sigTable.select(col(idCol), col("gh"))
    val banded = sigTable
      .select(col(idCol),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
      .select(col(idCol),
        explode(transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(b, slice(col("sig"), b * rowsPerBand + 1,
            lit(rowsPerBand))))).as("bucket"))
    (docSets, banded)
  }

  /** Shared LSH front half: per-doc distinct hashed-shingle sets
    * (`gh`) and banded bucket keys, from precomputed [[shingleHashes]]
    * rows — builds a fresh [[signatureTable]] then bands it. */
  private def signatureBandsFromHashes(hashed: DataFrame, idCol: String,
      numHashes: Int, bands: Int): (DataFrame, DataFrame) =
    bandsFromSigTable(signatureTable(hashed, idCol, numHashes), idCol,
      numHashes, bands)

  private def signatureBands(df: DataFrame, textCol: String,
      idCol: String, numHashes: Int, bands: Int, k: Int)
      : (DataFrame, DataFrame) =
    signatureBandsFromHashes(shingleHashes(df, textCol, idCol, k),
      idCol, numHashes, bands)

  /** Per-ROW minhash signature over a hashed-shingle ARRAY column —
    * the stateless twin of the min-agg path (identical values: same
    * remix constants over the same distinct-hash set), usable where a
    * groupBy is unavailable or unwanted, e.g. append-mode streaming
    * ingest. */
  def minhashSigExpr(ghCol: Column, numHashes: Int = 128): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(ghCol, h => graft.functions.Remix64(h,
        splitmix64(2L * i) | 1L, splitmix64(2L * i + 1))))
    }: _*)

  /** Banded bucket keys of a signature array — per-row twin of the
    * bucket explode in [[minhashCandidates]] (same xxhash64(band,
    * slice) keys). Duplicate buckets within one row are dropped. */
  def bandBucketsExpr(sigCol: Column, numHashes: Int = 128,
      bands: Int = 16): Column = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    array_distinct(transform(sequence(lit(0), lit(bands - 1)), b =>
      xxhash64(b, slice(sigCol, b * rowsPerBand + 1, lit(rowsPerBand)))))
  }

  /** Hashed distinct shingle set as a per-row expression — the
    * stateless twin of [[shingleHashes]]' explode + collect_set.
    *
    * The token array is BOUND through a single-element transform before
    * the shingle lambda touches it: `shinglesFromTokens` references its
    * token expression k+1 times per shingle, and an inlined split would
    * re-tokenize the document per reference — the O(tokens²) trap
    * `TextAnalysis.wordShingles` documents. The lambda variable is
    * evaluated once per row, so this stays a pure expression usable in
    * streaming projections. */
  def shingleHashSetExpr(textCol: Column, k: Int = 3): Column =
    element_at(
      transform(array(TextAnalysis.tokens(lower(textCol))), toks =>
        array_distinct(transform(
          TextAnalysis.shinglesFromTokens(toks, k),
          s => xxhash64(s)))),
      1)

  /** Corpus-side index for STREAMING near-dup ingest
    * ([[graft.streaming.StreamingDedup.nearDupIngestStream]]): built
    * once in batch from [[shingleHashes]] rows, then joined
    * stream-static by every arriving micro-batch. Returns
    * (bucketTable(bucket, corpus_id), docTable(corpus_id, gh,
    * cbuckets)); over-cap buckets keep their `maxBucketSize` lowest
    * ids in BOTH tables, so the stream side's min-shared-bucket
    * dedup stays consistent with what is joinable. */
  def streamingCorpusIndex(corpusHashed: DataFrame, idCol: String,
      numHashes: Int = 128, bands: Int = 16,
      maxBucketSize: Int = 200): (DataFrame, DataFrame) = {
    val (sets, banded) =
      signatureBandsFromHashes(corpusHashed, idCol, numHashes, bands)
    val capped = banded.groupBy(col("bucket"))
      .agg(sort_array(collect_set(col(idCol))).as("ids"))
      .select(col("bucket"),
        explode(slice(col("ids"), 1, maxBucketSize)).as("corpus_id"))
      .localCheckpoint(false)
    val perDoc = capped.groupBy(col("corpus_id"))
      .agg(collect_set(col("bucket")).as("cbuckets"))
    (capped,
      sets.select(col(idCol).as("corpus_id"), col("gh"))
        .join(perDoc, "corpus_id"))
  }

  /** Incremental near-dup detection: which DELTA documents (today's
    * ingest) near-duplicate an existing CORPUS document — the daily
    * shape of a continuously curated 100 TB corpus, where re-running
    * all-pairs dedup per batch is unaffordable. Returns
    * (delta_id, corpus_id, jaccard) for verified pairs.
    *
    * Scale shape: both sides band independently; candidates come from
    * a hash equi-join of delta buckets against corpus buckets (the
    * corpus side dedups (bucket, id) and caps degenerate buckets at
    * `maxBucketSize`, so a mass-duplicate family costs O(cap), not
    * O(family)); verification touches only colliding pairs. The
    * corpus signatures can be precomputed and stored — only the delta
    * explodes per run.
    *
    * Recall caveat (mirrors [[minhashCandidates]]' over-cap note): an
    * over-cap corpus bucket keeps only its `maxBucketSize` LOWEST ids —
    * the slice always includes the bucket representative (min id), so
    * a delta doc near-duplicating a mass-duplicate family still
    * matches the family's representative, but a match whose ONLY
    * shared bucket member is a high-id corpus doc beyond the cap is
    * missed. Raise `maxBucketSize` when completeness against
    * degenerate buckets matters more than skew protection.
    *
    * `bands = 0` (the default) auto-sizes the band count from
    * `minJaccard` like [[nearDupPairs]] — the S-curve threshold lands
    * at or below 0.8·minJaccard, so pairs just above the cutoff still
    * collide with high probability; a fixed band count whose
    * threshold sits ABOVE minJaccard (e.g. 16 bands of 8 ≈ 0.71 at
    * the 0.5 default) silently drops most true pairs near the
    * cutoff.
    *
    * ID-namespace precondition (also on
    * [[nearDupAgainstCorpusFromHashes]]): delta and corpus ids must
    * come from ONE namespace — equal id means the same document. The
    * self-pair guard suppresses any pair with coinciding ids (that's
    * what lets one shared table serve as both sides), so two
    * independent tables with colliding auto-increment ids would lose
    * a true cross-table match; re-key one side first. */
  def nearDupAgainstCorpus(delta: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String, numHashes: Int = 128,
      bands: Int = 0, k: Int = 3, minJaccard: Double = 0.5,
      maxBucketSize: Int = 200): DataFrame = {
    val nb = if (bands > 0) bands else bandsFor(numHashes, minJaccard)
    deltaVsCorpusFromBands(
      signatureBands(delta, textCol, idCol, numHashes, nb, k),
      signatureBands(corpus, textCol, idCol, numHashes, nb, k),
      idCol, minJaccard, maxBucketSize)
  }

  /** [[nearDupAgainstCorpus]] over precomputed [[shingleHashes]] rows
    * for each side (per-doc hashes are independent, so filters of one
    * shared corpus frame work) — the true incremental shape: corpus
    * hashes computed once at ingest, only the delta is new text.
    * `bands = 0` auto-sizes from `minJaccard` (see
    * [[nearDupAgainstCorpus]]). */
  def nearDupAgainstCorpusFromHashes(deltaHashed: DataFrame,
      corpusHashed: DataFrame, idCol: String, numHashes: Int = 128,
      bands: Int = 0, minJaccard: Double = 0.5,
      maxBucketSize: Int = 200): DataFrame = {
    val nb = if (bands > 0) bands else bandsFor(numHashes, minJaccard)
    deltaVsCorpusFromBands(
      signatureBandsFromHashes(deltaHashed, idCol, numHashes, nb),
      signatureBandsFromHashes(corpusHashed, idCol, numHashes, nb),
      idCol, minJaccard, maxBucketSize)
  }

  private def deltaVsCorpusFromBands(d: (DataFrame, DataFrame),
      c: (DataFrame, DataFrame), idCol: String, minJaccard: Double,
      maxBucketSize: Int): DataFrame = {
    val (dSets, dBands) = d
    val (cSets, cBands) = c
    val cCapped = cBands.groupBy(col("bucket"))
      .agg(sort_array(collect_set(col(idCol))).as("ids"))
      .select(col("bucket"),
        explode(slice(col("ids"), 1, maxBucketSize)).as("corpus_id"))
    val candidates = dBands
      .select(col("bucket"), col(idCol).as("delta_id"))
      .dropDuplicates("bucket", "delta_id")
      .join(cCapped, "bucket")
      // the delta/corpus sides may be OVERLAPPING filters of one
      // shared table (the advertised stored-artifact shape): a doc
      // present on both sides must not match ITSELF at jaccard 1.0 —
      // an ingest gate keying on "has a corpus match" would otherwise
      // discard the whole overlapping delta. PRECONDITION this guard
      // imposes: delta and corpus ids must share ONE namespace (equal
      // id ⟹ same document). Two independent tables whose
      // auto-increment ids collide would have a true cross-table pair
      // at coinciding ids silently suppressed — re-key one side
      // before calling. Null-SAFE negation so a null-id row on ONE
      // side (allowed — ids are only compared, never joined on) still
      // pairs against non-null ids instead of vanishing under `=!=`'s
      // three-valued logic. COROLLARY of the one-namespace rule for
      // nulls: `null <=> null` is TRUE, so two DISTINCT documents that
      // BOTH carry null ids are suppressed like a self-match — null
      // ids must be confined to at most one side (or re-keyed) when
      // null-vs-null pairs matter.
      .where(!(col("delta_id") <=> col("corpus_id")))
      .select(col("delta_id"), col("corpus_id"))
      .dropDuplicates("delta_id", "corpus_id")
    candidates
      .join(dSets.select(col(idCol).as("delta_id"), col("gh").as("gh_a")),
        Seq("delta_id"))
      .join(cSets.select(col(idCol).as("corpus_id"),
        col("gh").as("gh_b")), Seq("corpus_id"))
      .withColumn("ni",
        size(array_intersect(col("gh_a"), col("gh_b"))).cast("double"))
      .withColumn("jaccard", col("ni") /
        (size(col("gh_a")) + size(col("gh_b")) - col("ni")))
      .where(col("jaccard") >= minJaccard)
      .select(col("delta_id"), col("corpus_id"), col("jaccard"))
  }

  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 128, bands: Int = 16, k: Int = 3,
      minJaccard: Double = 0.5, maxBucketSize: Int = 200): DataFrame =
    candidatesFromBands(signatureBands(df, textCol, idCol, numHashes,
      bands, k), idCol, minJaccard, maxBucketSize)

  /** [[minhashCandidates]] over precomputed [[shingleHashes]] rows —
    * skips the corpus text scan entirely. */
  def minhashCandidatesFromHashes(hashed: DataFrame, idCol: String,
      numHashes: Int = 128, bands: Int = 16,
      minJaccard: Double = 0.5, maxBucketSize: Int = 200): DataFrame =
    candidatesFromBands(signatureBandsFromHashes(hashed, idCol,
      numHashes, bands), idCol, minJaccard, maxBucketSize)

  /** [[minhashCandidates]] over a STORED [[signatureTable]] — the
    * fully-incremental shape: signatures live as a table, each pair
    * query only bands, buckets, and verifies. `numHashes` may be
    * narrower than the stored width (prefix slice, identical values
    * to a fresh narrow table). */
  def minhashCandidatesFromSigTable(sigTable: DataFrame, idCol: String,
      numHashes: Int = 128, bands: Int = 16,
      minJaccard: Double = 0.5, maxBucketSize: Int = 200): DataFrame =
    candidatesFromBands(bandsFromSigTable(sigTable, idCol, numHashes,
      bands), idCol, minJaccard, maxBucketSize)

  /** [[nearDupPairs]]' auto-banding over a stored [[signatureTable]]. */
  def nearDupPairsFromSigTable(sigTable: DataFrame, idCol: String,
      minJaccard: Double = 0.5, numHashes: Int = 128,
      maxBucketSize: Int = 200): DataFrame =
    minhashCandidatesFromSigTable(sigTable, idCol, numHashes,
      bandsFor(numHashes, minJaccard), minJaccard, maxBucketSize)

  /** [[nearDupAgainstCorpusFromHashes]] over stored
    * [[signatureTable]] slices — per-doc rows are independent, so the
    * delta/corpus sides may be filters of ONE shared table.
    *
    * `bands = 0` (the default) auto-sizes the band count from
    * `minJaccard` exactly like [[nearDupPairsFromSigTable]] — the
    * S-curve threshold lands at or below 0.8·minJaccard, so pairs
    * just above the cutoff still collide with high probability. A
    * fixed band count (e.g. the `FromHashes` sibling's 16) at a low
    * minJaccard silently drops true pairs near the cutoff. */
  def nearDupAgainstCorpusFromSigTables(deltaSig: DataFrame,
      corpusSig: DataFrame, idCol: String, numHashes: Int = 128,
      bands: Int = 0, minJaccard: Double = 0.5,
      maxBucketSize: Int = 200): DataFrame = {
    val nb = if (bands > 0) bands else bandsFor(numHashes, minJaccard)
    deltaVsCorpusFromBands(
      bandsFromSigTable(deltaSig, idCol, numHashes, nb),
      bandsFromSigTable(corpusSig, idCol, numHashes, nb),
      idCol, minJaccard, maxBucketSize)
  }

  private def candidatesFromBands(sets: (DataFrame, DataFrame),
      idCol: String, minJaccard: Double, maxBucketSize: Int)
      : DataFrame = {
    val (docSets, banded) = sets
    val buckets = banded.groupBy(col("bucket"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .where(size(col("ids")) >= 2)
    // dedupe candidates BEFORE the verify join: a true near-dup pair
    // collides in up to `bands` buckets, so without this the expensive
    // set-intersection join runs `bands`× per pair. The dedup shuffle
    // moves only (long, long) rows — orders of magnitude lighter than
    // the shingle-set join it prunes.
    val candidates = cappedPairs(buckets, "ids", maxBucketSize)
      .select(col("a").as("id_a"), col("b").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // verify on hashed distinct shingles: long-set intersection sizes
    // equal the string-set sizes (64-bit collisions are negligible) at a
    // fraction of the comparison cost
    candidates
      .join(docSets.select(col(idCol).as("id_a"), col("gh").as("gh_a")),
        Seq("id_a"))
      .join(docSets.select(col(idCol).as("id_b"), col("gh").as("gh_b")),
        Seq("id_b"))
      .withColumn("ni",
        size(array_intersect(col("gh_a"), col("gh_b"))).cast("double"))
      .withColumn("jaccard", col("ni") /
        (size(col("gh_a")) + size(col("gh_b")) - col("ni")))
      .where(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** exact Jaccard over two shingle arrays (distinct semantics). The
    * intersection — the expensive sub-expression — is evaluated once. */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a); val db = array_distinct(b)
    // bind the intersection size through a single-element higher-order
    // context so codegen evaluates it once (a bare repeated expression
    // would be computed for both numerator and denominator)
    aggregate(array(size(array_intersect(da, db)).cast("double")),
      lit(0.0), (_, ni) => ni / (size(da) + size(db) - ni))
  }

  /** SimHash: `bits`-bit signature; each bit is the sign of the sum of
    * ±1 votes from every token's hash bit. Hamming-close signatures =
    * near-dups. Pure expression: ONE xxhash64 per token and a single
    * fold carrying all `bits` vote counters (was: a full token-array
    * re-hash per bit, `bits`× the hashing cost). */
  def simhash(text: Column, bits: Int = 64): Column = {
    val masks = array((0 until bits).map(i => lit(1L << i)): _*)
    val hashed = transform(TextAnalysis.tokens(lower(text)),
      t => xxhash64(t))
    val votes = aggregate(hashed,
      transform(sequence(lit(0), lit(bits - 1)), _ => lit(0)),
      (acc, h) => zip_with(acc, masks, (a, m) =>
        a + when(h.bitwiseAND(m) =!= 0, 1).otherwise(-1)))
    aggregate(zip_with(votes, masks, (v, m) =>
      when(v > 0, m).otherwise(0L)), lit(0L), (acc, b) => acc + b)
  }

  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs at Hamming distance <= `maxHamming`:
    * the signature splits into `maxHamming + 1` disjoint bit blocks,
    * and by pigeonhole any pair within the radius agrees EXACTLY on
    * at least one block — so candidates come from equi-joins on
    * (block index, block bits), verified with one XOR popcount.
    * Guaranteed recall (not probabilistic like minhash banding), one
    * shuffle per block via a single explode+groupBy, and the same
    * over-cap star-pair skew guard as [[minhashCandidates]]. */
  def simhashNearDups(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, bits: Int = 64,
      maxBucketSize: Int = 1000): DataFrame =
    simhashNearDupsFromSigs(
      df.select(col(idCol), simhash(col(textCol), bits).as("sig")),
      idCol, "sig", maxHamming, bits, maxBucketSize)

  /** [[simhashNearDups]] over PRECOMPUTED signatures — for corpora
    * whose simhashes are already stored (the standing-corpus shape:
    * signatures are computed once at ingest, pair detection re-runs),
    * or for alternative signature functions (cross-engine-portable
    * md5-derived signatures, character-level simhash). Same pigeonhole
    * block join, skew cap, and XOR-popcount verify. */
  def simhashNearDupsFromSigs(sigDf: DataFrame, idCol: String,
      sigCol: String, maxHamming: Int = 3, bits: Int = 64,
      maxBucketSize: Int = 1000): DataFrame = {
    val nBlocks = maxHamming + 1
    require(bits % nBlocks == 0,
      s"bits $bits must divide into ${nBlocks} blocks")
    val blockBits = bits / nBlocks
    val mask = if (blockBits == 64) -1L else (1L << blockBits) - 1
    val sigs = sigDf
      .select(col(idCol), col(sigCol).as("sig"))
      .localCheckpoint(false) // feeds block explode + both verify sides
    val banded = sigs.select(col(idCol), col("sig"),
      explode(array((0 until nBlocks).map(b =>
        struct(lit(b).as("blk"),
          shiftrightunsigned(col("sig"), b * blockBits)
            .bitwiseAND(lit(mask)).as("bb"))): _*))
        .as("k"))
    val buckets = banded.groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col(idCol).as("id"),
        col("sig").as("s")))).as("ms"))
      .where(size(col("ms")) >= 2)
    cappedPairs(buckets, "ms", maxBucketSize)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hammingDistance(col("a.s"), col("b.s")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Production near-dup path: LSH candidate generation + exact
    * (hashed-shingle-set) Jaccard re-rank. This is the plan to run at
    * 100 TB — NO blocked self-join anywhere: candidates come from
    * `minhashCandidates`' band-bucket groupBy, and only bucket
    * co-members are compared exactly. The band count is chosen so the
    * LSH S-curve threshold (1/bands)^(1/rowsPerBand) sits at or below
    * 0.8*`minJaccard` — a margin that puts the steep part of the
    * S-curve BELOW the cutoff, so pairs just above minJaccard still
    * collide with high probability instead of the ~50-63% you get when
    * the threshold sits exactly at the cutoff
    * (e.g. minJaccard=0.5 -> 64 bands of 2, threshold 0.125;
    * 0.3 -> 64 bands of 2). */
  def nearDupPairs(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, minJaccard: Double = 0.5, numHashes: Int = 128,
      maxBucketSize: Int = 200): DataFrame =
    minhashCandidates(df, textCol, idCol, numHashes,
      bandsFor(numHashes, minJaccard), k, minJaccard, maxBucketSize)

  /** [[nearDupPairs]] over precomputed [[shingleHashes]] rows. */
  def nearDupPairsFromHashes(hashed: DataFrame, idCol: String,
      minJaccard: Double = 0.5, numHashes: Int = 128,
      maxBucketSize: Int = 200): DataFrame =
    minhashCandidatesFromHashes(hashed, idCol, numHashes,
      bandsFor(numHashes, minJaccard), minJaccard, maxBucketSize)

  private def bandsFor(numHashes: Int, minJaccard: Double): Int = {
    val bandChoices = (1 to numHashes).filter(numHashes % _ == 0)
    bandChoices.find { b =>
      math.pow(1.0 / b, b.toDouble / numHashes) <= 0.8 * minJaccard
    }.getOrElse(bandChoices.last)
  }

  /** n-gram Jaccard near-dup pairs: ALL pairs within each block get an
    * exact string-shingle Jaccard — the non-LSH baseline.
    *
    * SCALE WARNING: work is quadratic in the largest block; a coarse
    * key (e.g. language) makes one dominant block O(n²). Use a
    * fingerprint bucket ([[TextAnalysis.rollingFingerprint]] /
    * [[TextAnalysis.rollingFingerprintFromShingles]]) whose block
    * sizes track clone-cluster sizes, or the LSH production path
    * [[nearDupPairs]].
    *
    * `blockingCols` must be non-empty: an unblocked call is a FULL
    * CROSS JOIN of the corpus with itself, which no cluster survives —
    * the same plan-time stance [[graft.core.ScaleGuard]] takes on
    * unpartitioned windows. A small corpus that genuinely wants exact
    * all-pairs opts in explicitly via `allPairsUnblocked = true`
    * (gated to [[allPairsMaxRows]] input rows, counted before the
    * join is built, so the opt-in cannot silently quadratic-bomb
    * either). */
  /** Input-row cap for [[ngramJaccardPairs]]' explicit
    * `allPairsUnblocked` opt-in: 100k rows ≈ 5·10⁹ candidate pairs,
    * the most a deliberate exact-baseline run should ever mean. */
  val allPairsMaxRows: Long = 100000L

  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, minJaccard: Double = 0.3,
      blockingCols: Seq[Column] = Nil,
      allPairsUnblocked: Boolean = false): DataFrame = {
    require(!df.columns.contains("toks__"),
      "input already has reserved working column toks__")
    require(blockingCols.nonEmpty || allPairsUnblocked,
      "ngramJaccardPairs with empty blockingCols is a full O(n²) " +
        "cross join; pass blocking columns (rollingFingerprint is the " +
        "usual choice) or opt in with allPairsUnblocked = true for a " +
        s"small (< $allPairsMaxRows row) corpus")
    if (blockingCols.isEmpty) {
      val n = df.count()
      require(n <= allPairsMaxRows,
        s"allPairsUnblocked on $n rows would build ~${n * n / 2} " +
          s"candidate pairs (cap $allPairsMaxRows rows); block the " +
          "corpus or use nearDupPairs")
    }
    // materialize tokens BEFORE shingling: shinglesFromTokens over an
    // inline split would re-evaluate the split per element (O(tokens²)
    // per row). The localCheckpoint is load-bearing, not a cache hint:
    // without it the join's isnotnull(blockKey) filter is pushed below
    // the projections with the aliases substituted — re-deriving the
    // whole blocking expression per row WITH the split inlined into
    // the per-element lambdas (O(tokens²) again, 10× wall-clock at
    // sf0.1) — and the shingle arrays are recomputed per join side.
    val withSh = df
      .withColumn("toks__", TextAnalysis.tokens(lower(col(textCol))))
      .select(col(idCol) +:
        TextAnalysis.shinglesFromTokens(col("toks__"), k).as("sh") +:
        blockingCols: _*)
      .localCheckpoint(false)
    val blockNames = blockingCols.indices.map(i => s"blk$i")
    val named = blockNames.zipWithIndex.foldLeft(withSh) {
      case (d, (n, i)) => d.withColumnRenamed(
        withSh.columns(i + 2), n)
    }
    val a = named.select(col(idCol).as("id_a") +: col("sh").as("sh_a") +:
      blockNames.map(col): _*)
    val b = named.select(col(idCol).as("id_b") +: col("sh").as("sh_b") +:
      blockNames.map(col): _*)
    val joined = if (blockNames.isEmpty) a.crossJoin(b)
      else a.join(b, blockNames)
    joined.where(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding-cosine near-dup pairs: LSH-style blocking on the sign of a
    * few hash-derived hyperplane projections, cosine verify on candidates.
    *
    * Skew-capped like `minhashCandidates`: candidate pairs come from a
    * groupBy on the bucket (not a bucket self-join), so a degenerate
    * bucket — a mass-duplicated embedding, or a low-entropy corpus
    * collapsing onto few sign patterns — emits linear star pairs
    * against its smallest id instead of quadratic all-pairs. Norms are
    * computed once per vector, not once per pair, and the dot product
    * is the native codegen'd expression. Completeness holds for buckets
    * <= maxBucketSize; over-cap buckets link every member to the
    * representative only.
    *
    * Sizing `planes`: expected bucket occupancy is n/2^planes and
    * verify work is n·occupancy/2 pairs, so planes must GROW with the
    * corpus — a fixed plane count turns quadratic at scale. Pass
    * `planes = 0` (the scale default) to auto-size to
    * log2(n / 8) from a count of the input, keeping occupancy ~8 and
    * verify cost linear in n. More planes = faster but lower recall
    * per table for merely-similar pairs — each plane splits a true
    * near-dup pair with probability angle/π (~1.4% at cosine 0.95;
    * EXACT duplicates are never split) — so for recall-critical runs
    * at lower thresholds, union several explicit-`planes` runs with
    * different `seed`s. */
  def embeddingNearDups(df: DataFrame, vecCol: String, idCol: String,
      minCosine: Double = 0.95, planes: Int = 0, seed: Long = 42,
      maxBucketSize: Int = 1000): DataFrame = {
    import graft.similarity.Similarity
    // auto mode sizes planes from the corpus and, in the same action,
    // probes the embedding dimension so the plane matrix can be
    // precomputed as literals (identical buckets, planes×dim fewer
    // hash evaluations per row)
    val probed: Option[(Long, Int, Int)] =
      if (planes > 0) None
      else {
        val r = df.agg(count(lit(1)), min(size(col(vecCol))),
          max(size(col(vecCol)))).head()
        // empty/all-null input: no dim to probe -> generic bucket path
        if (r.isNullAt(1) || r.isNullAt(2)) Some((r.getLong(0), -1, -2))
        else Some((r.getLong(0), r.getInt(1), r.getInt(2)))
      }
    val nPlanes = probed match {
      case None => planes
      case Some((n, _, _)) =>
        math.max(8, math.min(24,
          math.ceil(math.log(math.max(n, 2L) / 8.0) /
            math.log(2.0)).toInt))
    }
    val bucketOf = (v: Column) => probed match {
      case Some((_, dmin, dmax)) if dmin == dmax =>
        Similarity.hyperplaneBucketPrecomputed(v, nPlanes, seed, dmax)
      case _ => Similarity.hyperplaneBucket(v, nPlanes, seed)
    }
    embeddingNearDupsWithBucket(df, vecCol, idCol, minCosine,
      bucketOf(col(vecCol)), maxBucketSize)
  }

  /** [[embeddingNearDups]] with a CALLER-SUPPLIED bucket expression
    * instead of hash-derived hyperplanes — for stored cluster/bucket
    * columns, and for replicable clusterings (e.g. leading-dimension
    * sign bits) that a cross-engine oracle or test can reproduce.
    * Same zero-norm filter, skew-capped pair explosion, and hoisted
    * norms; the recall/occupancy contract moves to the caller's
    * bucketing. */
  def embeddingNearDupsWithBucket(df: DataFrame, vecCol: String,
      idCol: String, minCosine: Double, bucket: Column,
      maxBucketSize: Int = 1000): DataFrame = {
    import graft.similarity.Similarity
    val base = df.withColumn("bucket__", bucket)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("bucket__"))
      .withColumn("nrm", Similarity.norm(col("v")))
      .where(col("nrm") > 0)
    val buckets = base
      .select(col("id"), col("bucket__").as("bucket"))
      .groupBy(col("bucket"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")) >= 2)
    cappedPairs(buckets, "ids", maxBucketSize)
      .select(col("a").as("id_a"), col("b").as("id_b"))
      .join(base.select(col("id").as("id_a"), col("v").as("va"),
        col("nrm").as("na")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("v").as("vb"),
        col("nrm").as("nb")), Seq("id_b"))
      .withColumn("cosine",
        Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Exact-substring duplicate spans at n-gram granularity — the
    * distributed stand-in for suffix-array ExactSubstr dedup
    * ("Deduplicating Training Data Makes Language Models Better",
    * Lee et al. 2022): every length-`n` token window is hashed, and a
    * window whose hash occurs >= `minOccurrences` times corpus-wide
    * (same-doc repeats count — a doc repeating its own boilerplate is
    * still a duplicated span) is a duplicate span. Returns one row per
    * input doc: (idCol, n_dup_grams, covered_tokens, n_tokens,
    * dup_frac_micro) where covered_tokens is the size of the UNION of
    * the overlapping [pos, pos+n-1] windows — the trim/drop signal for
    * substring-level dedup (drop docs with dup_frac above a threshold,
    * or cut the covered spans).
    *
    * Scale shape: documents are tokenized once and the gram table is
    * MATERIALIZED once (lazy localCheckpoint) — it feeds both the
    * occurrence count and the position semi-join, and its projections
    * differ per branch, so without the barrier Catalyst re-plans the
    * tokenize+slice+hash explode per consumer (the multi-consumer trap
    * `signatureBandsFromHashes` documents). The explode hashes each
    * window inside the mapper (gram STRINGS never shuffle — only the
    * hash + position), then ONE map-side-combined groupBy counts
    * occurrences per hash, a left-semi equi-join keeps positions of
    * over-threshold grams (never a self-join), and the interval union
    * is one window over (doc, pos): consecutive hit positions `p_prev,
    * p` add `min(p - p_prev, n)` newly-covered tokens, the first adds
    * `n` — no per-doc interval list materializes. The gram table is
    * ~tokens-per-doc rows, the honest cost of substring-level dedup
    * (at 100 TB it is the stored artifact of the pass, exactly like
    * the shingle-hash frame); everything downstream of the count
    * filter is hit-scale, not corpus-scale.
    *
    * `gramHash` defaults to xxhash64 (8-byte keys); pass an
    * md5-composed hash for cross-engine-portable gates. */
  def duplicateSpans(df: DataFrame, textCol: String, idCol: String,
      n: Int = 50, minOccurrences: Int = 2,
      gramHash: Column => Column = xxhash64(_)): DataFrame = {
    require(n >= 2, "span gram size n must be >= 2")
    require(minOccurrences >= 2, "minOccurrences must be >= 2")
    val reserved = Seq("toks__", "nt__", "pos__", "h__")
    val clash = reserved.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has reserved working columns: ${clash.mkString(",")}")

    // tokenize ONCE: base feeds the gram explode AND the final
    // n_tokens join; without the barrier each consumer re-runs the
    // split (and the explode branch twice more below)
    val base = df
      // null text folds to "" BEFORE tokenizing: size(null) is -1
      // under non-ANSI SQL, which would emit n_tokens = -1 rows and
      // corrupt downstream token accounting (the Html.blocks null
      // trap, same fix)
      .select(col(idCol),
        TextAnalysis.tokens(coalesce(col(textCol), lit("")))
          .as("toks__"))
      .withColumn("nt__", size(col("toks__")))
      .localCheckpoint(false)
    // sequence(1, stop) DESCENDS when stop < 1 — short docs must map to
    // an empty window list, not [1, 0]
    val starts = when(col("nt__") >= n,
      sequence(lit(1), col("nt__") - (n - 1))).otherwise(
      array().cast("array<int>"))
    // gram table materializes once for its two consumers (occurrence
    // count + position semi-join)
    val grams = base.select(col(idCol), col("nt__"),
        posexplode(transform(starts,
          i => gramHash(concat_ws(" ", slice(col("toks__"), i, lit(n)))))))
      .select(col(idCol), col("nt__"), (col("pos") + 1).as("pos__"),
        col("col").as("h__"))
      .localCheckpoint(false)
    val dup = grams.groupBy(col("h__"))
      .agg(count(lit(1)).as("cnt__"))
      .where(col("cnt__") >= minOccurrences)
      .select(col("h__"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos__"))
    val covered = grams.join(dup, Seq("h__"), "left_semi")
      .withColumn("cov__", least(
        coalesce(col("pos__") - lag(col("pos__"), 1).over(w), lit(n)),
        lit(n)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup_grams"),
        sum(col("cov__")).cast("long").as("covered_tokens"))
    base.select(col(idCol), col("nt__").cast("long").as("n_tokens"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        col("n_tokens"),
        round(coalesce(col("covered_tokens"), lit(0L)) * lit(1e6)
          / col("n_tokens")).cast("long").as("dup_frac_micro"))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — the
    * MOSS algorithm): per document, the selected (position, hash)
    * pairs where each window of `w` consecutive word-`k`-gram hashes
    * contributes its MINIMUM hash, ties resolved to the RIGHTMOST
    * position. Guarantee: any substring match of at least `w + k - 1`
    * tokens between two documents shares at least one fingerprint
    * hash — the local, position-robust dedup/plagiarism signature
    * that a single global min ([[TextAnalysis.rollingFingerprint]])
    * cannot give. Expected density ~ 2/(w+1) fingerprints per gram.
    *
    * Returns (idCol, pos, gram_hash) distinct, pos 1-based. Hashes
    * are folded to 40 bits so (hash, tiebreak-position) packs into
    * ONE long window-min — no struct comparators, identical min
    * semantics in any engine. Documents are limited to 2^20 - 1
    * grams (a ~1M-token doc; chunk longer docs upstream) — enforced
    * loudly, never truncated silently.
    *
    * Scale shape: one explode (gram hashing map-side), ONE window
    * partitioned by document ordered by position with a `w`-row
    * frame, one distinct — all document-bounded; no corpus-wide sort
    * or join anywhere. `gramHash` defaults to xxhash64; pass an
    * md5-composed hash for cross-engine-portable gates. */
  def winnowFingerprints(df: DataFrame, textCol: String, idCol: String,
      k: Int = 5, w: Int = 4,
      gramHash: Column => Column = xxhash64(_)): DataFrame = {
    require(!df.columns.contains("toks__"),
      "input already has reserved working column toks__")
    winnowFingerprintsFromTokens(
      df.select(col(idCol),
        TextAnalysis.tokens(col(textCol)).as("toks__")),
      "toks__", idCol, k, w, gramHash)
  }

  /** [[winnowFingerprints]] as a PURE ROW EXPRESSION — identical
    * selection (same packed keys, same window mins), computed with
    * sliding `array_min` windows over an in-row key array instead of
    * a keyed window function. Two consequences: the plan has NO
    * exchange at all (the window form shuffles by document), and the
    * operator is Structured-Streaming append-mode compatible (window
    * functions are not). The trade: the whole document's gram-key
    * array materializes in the row (~8 MB at the 2^20-gram cap), so
    * the window form remains for callers who prefer spill-friendly
    * per-gram rows. WinnowSpec proves both forms emit the same set. */
  def winnowFingerprintsInRow(df: DataFrame, textCol: String,
      idCol: String, k: Int = 5, w: Int = 4,
      gramHash: Column => Column = xxhash64(_)): DataFrame = {
    require(k >= 1 && w >= 1)
    val reserved = Seq("toks__", "nt__", "m__", "keys__", "win__")
    val clash = reserved.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has reserved working columns: ${clash.mkString(",")}")
    val maxPos = (1 << 20) - 1
    val base = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks__"))
      .withColumn("nt__", size(col("toks__")))
      .withColumn("m__",
        when(col("nt__") - (k - 1) > maxPos,
          raise_error(concat(lit(s"winnowFingerprintsInRow: document "),
            col(idCol).cast("string"),
            lit(s" exceeds $maxPos grams — chunk it upstream"))))
          .otherwise(greatest(col("nt__") - (k - 1), lit(0))))
    val keyOf = (i: Column) => shiftleft(
      gramHash(concat_ws(" ", slice(col("toks__"), i, lit(k))))
        .bitwiseAND(lit((1L << 40) - 1)), 20) +
      (lit(maxPos) - i).cast("long")
    val keyed = base
      .withColumn("keys__", when(col("m__") >= 1,
        transform(sequence(lit(1), col("m__")), keyOf))
        .otherwise(array().cast("array<long>")))
    val wins = when(col("m__") >= 1,
      array_distinct(transform(
        sequence(lit(1), greatest(col("m__") - (w - 1), lit(1))),
        s => array_min(slice(col("keys__"), s, lit(w))))))
      .otherwise(array().cast("array<long>"))
    // array_distinct already dedupes within the document and ids are
    // unique across documents, so NO trailing distinct — the whole
    // plan stays stateless (what makes it streaming-append legal)
    keyed.select(col(idCol), explode(wins).as("win__"))
      .select(col(idCol),
        (lit(maxPos) - col("win__").bitwiseAND(lit(maxPos.toLong)))
          .cast("long").as("pos"),
        shiftright(col("win__"), 20).as("gram_hash"))
  }

  /** [[winnowFingerprints]] over a pre-tokenized frame — the
    * stored-tokenization-artifact entry point, same contract as the
    * other `*FromTokens` operators. */
  def winnowFingerprintsFromTokens(df: DataFrame, toksCol: String,
      idCol: String, k: Int = 5, w: Int = 4,
      gramHash: Column => Column = xxhash64(_)): DataFrame = {
    require(k >= 1 && w >= 1)
    val reserved = Seq("nt__", "m__", "pos__", "h__", "key__", "win__")
    val clash = reserved.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has reserved working columns: ${clash.mkString(",")}")
    val maxPos = (1 << 20) - 1
    val base = df
      .select(col(idCol), col(toksCol).as("toks__"))
      .withColumn("nt__", size(col("toks__")))
      .withColumn("m__",
        when(col("nt__") - (k - 1) > maxPos,
          raise_error(concat(lit(s"winnowFingerprints: document "),
            col(idCol).cast("string"),
            lit(s" exceeds $maxPos grams — chunk it upstream"))))
          .otherwise(greatest(col("nt__") - (k - 1), lit(0))))
    val starts = when(col("m__") >= 1,
      sequence(lit(1), col("m__"))).otherwise(array().cast("array<int>"))
    val grams = base.select(col(idCol), col("m__"),
        posexplode(transform(starts,
          i => gramHash(concat_ws(" ", slice(col("toks__"), i, lit(k)))))))
      .select(col(idCol), col("m__"), (col("pos") + 1).as("pos__"),
        col("col").bitwiseAND(lit((1L << 40) - 1)).as("h__"))
    // (hash, rightmost-tiebreak) as one long: smaller key == smaller
    // hash, or equal hash and LARGER position
    val key = shiftleft(col("h__"), 20) + (lit(maxPos) - col("pos__"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos__"))
      .rowsBetween(Window.currentRow, w - 1)
    // documents shorter than k tokens have no grams and emit nothing
    grams.withColumn("key__", min(key).over(win))
      // valid window starts only; a doc with fewer than w grams has
      // the single degenerate window starting at position 1
      .where(col("pos__") <= greatest(col("m__") - (w - 1), lit(1)))
      .select(col(idCol),
        (lit(maxPos) - col("key__").bitwiseAND(lit(maxPos.toLong)))
          .cast("long").as("pos"),
        shiftright(col("key__"), 20).as("gram_hash"))
      .distinct()
  }
}
