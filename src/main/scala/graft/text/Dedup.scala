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

  /** MinHash signature: `numHashes` independent min-hashes over word
    * shingles, as one nested higher-order expression (no explode). */
  def minhashSignature(text: Column, numHashes: Int = 16, k: Int = 3)
      : Column = {
    val sh = TextAnalysis.wordShingles(text, k)
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(sh, s => xxhash64(i, s))))
  }

  /** Near-duplicate candidate pairs via MinHash+LSH: band-bucket
    * equi-join, then exact shingle-set Jaccard on the candidates only.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= minJaccard.
    *
    * Plan shape (the 100 TB-safe version): shingles explode once, ONE
    * groupBy computes all `numHashes` min-aggregates (map-side combined,
    * linear in corpus size — no nested per-row recomputation), banding is
    * tiny array math on the signature, and the full shingle arrays join
    * back only for the (rare) bucket-collision candidates. */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 16, bands: Int = 4, k: Int = 3,
      minJaccard: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    val shingled = df
      .withColumn("toks_", TextAnalysis.tokens(lower(col(textCol))))
      .select(col(idCol),
        TextAnalysis.shinglesFromTokens(col("toks_"), k).as("shingles"))
    val exploded = shingled.select(col(idCol),
      explode(col("shingles")).as("s"))
    val minAggs = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("s"))).as(s"h$i"))
    val sig = exploded.groupBy(col(idCol))
      .agg(minAggs.head, minAggs.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
    val banded = sig.select(col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(b, concat_ws(",",
          slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))))
      .withColumnRenamed("col", "bucket")
    val candidates = banded.select(col("bucket"), col(idCol).as("id_a"))
      .join(banded.select(col("bucket"), col(idCol).as("id_b")),
        Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    // verify on hashed distinct shingles: long-array intersection sizes
    // equal the string-set sizes (64-bit collisions are negligible) at a
    // fraction of the comparison cost
    val hashed = shingled.select(col(idCol),
      array_distinct(transform(col("shingles"), s => xxhash64(s)))
        .as("gh"))
    candidates
      .join(hashed.select(col(idCol).as("id_a"), col("gh").as("gh_a")),
        Seq("id_a"))
      .join(hashed.select(col(idCol).as("id_b"), col("gh").as("gh_b")),
        Seq("id_b"))
      .withColumn("ni",
        size(array_intersect(col("gh_a"), col("gh_b"))).cast("double"))
      .withColumn("jaccard", col("ni") /
        (size(col("gh_a")) + size(col("gh_b")) - col("ni")))
      .where(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** exact Jaccard over two shingle arrays (distinct semantics) */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a); val db = array_distinct(b)
    val inter = size(array_intersect(da, db)).cast("double")
    inter / (size(da) + size(db) - size(array_intersect(da, db)))
  }

  /** SimHash: `bits`-bit signature; each bit is the sign of the sum of
    * ±1 votes from every token's hash bit. Hamming-close signatures =
    * near-dups. Pure expression (aggregate over the token array). */
  def simhash(text: Column, bits: Int = 64): Column = {
    val toks = TextAnalysis.tokens(lower(text))
    val bitCols = (0 until bits).map { i =>
      val vote = aggregate(toks, lit(0),
        (acc, t) => acc +
          when(shiftright(xxhash64(t), i).bitwiseAND(1) === 1, 1)
            .otherwise(-1))
      when(vote > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    bitCols.reduce(_ + _)
  }

  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** n-gram Jaccard near-dup pairs with cheap blocking (shared rolling
    * fingerprint bucket) — the non-LSH baseline. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, minJaccard: Double = 0.3,
      blockingCols: Seq[Column] = Nil): DataFrame = {
    val withSh = df.select(col(idCol) +:
      TextAnalysis.wordShingles(col(textCol), k).as("sh") +:
      blockingCols: _*)
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
    */
  def embeddingNearDups(df: DataFrame, vecCol: String, idCol: String,
      minCosine: Double = 0.95, planes: Int = 8, seed: Long = 42)
      : DataFrame = {
    import graft.similarity.Similarity
    val bucketed = df.select(col(idCol), col(vecCol).as("v"))
      .withColumn("bucket",
        Similarity.hyperplaneBucket(col("v"), planes, seed))
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"),
      col("v").as("va"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"),
      col("v").as("vb"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("va"), col("vb")))
      .where(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
