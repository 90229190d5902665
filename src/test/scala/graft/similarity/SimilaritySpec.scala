package graft.similarity

import graft.TestSpark
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val emb = Tables.table(spark, TestSpark.sfDir, "embeddings").cache()

  test("cosine of a vector with itself is 1") {
    val r = emb.limit(5)
      .select(Similarity.cosine($"embedding", $"embedding"))
      .collect().map(_.getDouble(0))
    r.foreach(v => assert(math.abs(v - 1.0) < 1e-9))
  }

  test("bruteForceTopK returns k ranked neighbours, self first") {
    val q = emb.where($"vec_id" < 3)
    val top = Similarity.bruteForceTopK(emb, q, "embedding", "vec_id",
      "vec_id", k = 5)
    val rows = top.collect()
    assert(rows.length == 15)
    val self = rows.filter(r => r.getAs[Long]("query_id") ==
      r.getAs[Long]("corpus_id"))
    assert(self.length == 3 && self.forall(_.getAs[Int]("rank") == 1))
  }

  test("lshTopK recall against brute force is reasonable") {
    val q = emb.where($"vec_id" < 8)
    val exact = Similarity.bruteForceTopK(emb, q, "embedding", "vec_id",
      "vec_id", k = 5).select($"query_id", $"corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, q, "embedding", "vec_id",
      "vec_id", k = 5, planes = 6).select($"query_id", $"corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall=$recall") // multi-probe 1-bit, 6 planes
  }

  test("ivfTopK matches brute force for most queries at high nprobe") {
    val q = emb.where($"vec_id" < 8)
    val exact = Similarity.bruteForceTopK(emb, q, "embedding", "vec_id",
      "vec_id", k = 3).select($"query_id", $"corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, q, "embedding", "vec_id", "vec_id",
      k = 3, nlist = 4, nprobe = 4).select($"query_id", $"corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // nprobe == nlist probes everything -> identical to brute force
    assert(ivf == exact)
  }

  test("ivfTopK's default quantizer is reproducible: identical " +
      "results under any input partitioning") {
    // the sample is hash-ranked by id, not limit()-of-whatever-
    // partition-answers-first — so centroids (hence buckets, hence
    // results) are a pure function of the data
    val q = emb.where($"vec_id" < 5)
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopK(c, q, "embedding", "vec_id", "vec_id",
          k = 3, nlist = 4, nprobe = 2, sampleSize = 64)
        .select($"query_id", $"corpus_id", $"rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
    val a = run(emb)
    assert(a == run(emb.repartition(17)))
    assert(a == run(emb.repartition(3, $"vec_id")))
  }

  test("hyperplane bucketing is deterministic and spreads vectors") {
    val b1 = emb.select(Similarity.hyperplaneBucket($"embedding", 8, 42)
      .as("b")).collect().map(_.getLong(0))
    val b2 = emb.select(Similarity.hyperplaneBucket($"embedding", 8, 42)
      .as("b")).collect().map(_.getLong(0))
    assert(b1.toSeq == b2.toSeq)
    assert(b1.distinct.length > 10)
  }

  test("precomputed-plane buckets are bit-identical to the generic form") {
    val dim = emb.select(size($"embedding")).head().getInt(0)
    for (planes <- Seq(8, 14); seed <- Seq(42L, 7L)) {
      val gen = emb.select(
        Similarity.hyperplaneBucket($"embedding", planes, seed).as("b"))
        .collect().map(_.getLong(0))
      val pre = emb.select(Similarity.hyperplaneBucketPrecomputed(
        $"embedding", planes, seed, dim).as("b"))
        .collect().map(_.getLong(0))
      assert(gen.toSeq == pre.toSeq, s"planes=$planes seed=$seed")
    }
  }

  test("pq: codes compress, ADC search finds the right cluster") {
    // 4 well-separated clusters in 8-dim; PQ must route each query to
    // its own cluster's members
    val rnd = new scala.util.Random(3)
    def jitter() = (rnd.nextDouble() - 0.5).toFloat * 0.2f
    val centers = Seq(
      Array(10f, 0f, 0f, 0f, 10f, 0f, 0f, 0f),
      Array(0f, 10f, 0f, 0f, 0f, 10f, 0f, 0f),
      Array(0f, 0f, 10f, 0f, 0f, 0f, 10f, 0f),
      Array(0f, 0f, 0f, 10f, 0f, 0f, 0f, 10f))
    val corpus = (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(_ + jitter()))
    }.toDF("vec_id", "embedding")
    val queries = centers.zipWithIndex.map { case (c, i) =>
      (1000L + i, c.map(_ + jitter()))
    }.toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooks(corpus, "embedding", "vec_id",
      m = 4, ksub = 8, sampleSize = 200)
    val codes = corpus.select($"vec_id",
      Similarity.pqEncode($"embedding", books).as("codes")).collect()
    assert(codes.forall { r =>
      val cs = r.getSeq[Int](1)
      cs.length == 4 && cs.forall(c => c >= 0 && c < 8)
    })
    val top = Similarity.pqTopK(corpus, queries, "embedding", "vec_id",
      "vec_id", k = 10, m = 4, ksub = 8, sampleSize = 200)
      .collect()
    assert(top.length == 40)
    // every neighbor of query 1000+i belongs to cluster i (ids ≡ i mod 4)
    assert(top.forall(r =>
      r.getLong(1) % 4 == r.getLong(0) - 1000L))
    // ADC distance within the right cluster is far below cross-cluster
    assert(top.forall(_.getDouble(2) < 50.0))
  }

  test("pqTopK default codebooks are a pure function of the data: " +
      "results are invariant under repartitioning/layout") {
    // same clustered corpus shape as the pq test; what must NOT
    // matter is which partitions answer first (the old bare limit()
    // sample made codebooks — hence codes, hence top-k — depend on
    // partition layout)
    val rnd = new scala.util.Random(11)
    def jitter() = (rnd.nextDouble() - 0.5).toFloat * 0.2f
    val centers = Seq(
      Array(10f, 0f, 0f, 0f, 10f, 0f, 0f, 0f),
      Array(0f, 10f, 0f, 0f, 0f, 10f, 0f, 0f),
      Array(0f, 0f, 10f, 0f, 0f, 0f, 10f, 0f),
      Array(0f, 0f, 0f, 10f, 0f, 0f, 0f, 10f))
    val corpus = (0 until 120).map { i =>
      (i.toLong, centers(i % 4).map(_ + jitter()))
    }.toDF("vec_id", "embedding")
    val queries = centers.zipWithIndex.map { case (c, i) =>
      (1000L + i, c.map(_ + jitter()))
    }.toDF("vec_id", "embedding")
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.pqTopK(c, queries, "embedding", "vec_id", "vec_id",
          k = 5, m = 4, ksub = 4, sampleSize = 64)
        .orderBy($"query_id", $"rank")
        .select($"query_id", $"corpus_id", $"rank")
        .as[(Long, Long, Int)].collect().toSeq
    val a = run(corpus)
    assert(a == run(corpus.repartition(13)))
    assert(a == run(corpus.repartition(3, $"vec_id")))
    assert(a == run(corpus.orderBy($"vec_id".desc)))
  }

  test("semDedup: zero-norm vectors never drop their bucket-mates") {
    import graft.similarity.Similarity
    // all share one bucket expression; vec 2 is all-zero (0/0 cosine
    // would be NaN, which Spark orders ABOVE any threshold)
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.semDedup(df, "embedding", "vec_id",
        minCosine = 0.9, bucket = lit("all"))
      .orderBy($"vec_id").collect()
      .map(x => (x.getLong(0), x.getLong(3)))
    // 1 and 3 are orthogonal; 2 has no direction: nothing drops
    assert(r.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 0L)))
  }

  test("semDedup: a mass-duplicate bucket stays linear and still drops clones") {
    import graft.similarity.Similarity
    val many = spark.range(500)
      .select($"id".as("vec_id"),
        array(lit(1.0f), lit(2.0f), lit(3.0f)).as("embedding"))
    val r = Similarity.semDedup(many, "embedding", "vec_id",
        minCosine = 0.95, bucket = lit("all"), maxBucketSize = 100)
      .agg(sum($"dropped"), sum($"n_close")).head()
    // star pairs against the min id: every non-representative drops,
    // and pair count is linear (499), not 500*499/2
    assert(r.getLong(0) == 499L)
    assert(r.getLong(1) == 499L)
  }

  test("semDedup keep-first: lower id kept, close higher ids dropped") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.2f)),
      (2L, Array(0.99f, 0.01f, 0.2f)),  // ~v1 -> dropped vs 1
      (3L, Array(0.98f, 0.02f, 0.21f)), // ~v1,v2 -> n_close 2
      (4L, Array(0.1f, 1.0f, -0.4f)),   // same bucket, far -> kept
      (5L, Array(-1.0f, -0.01f, 0.0f))) // other bucket, alone -> kept
      .toDF("vec_id", "embedding")
    val bucket = when(element_at($"embedding", 1) >= 0, "p")
      .otherwise("n")
    val r = Similarity.semDedup(vecs, "embedding", "vec_id",
        minCosine = 0.95, bucket = bucket)
      .orderBy($"vec_id").collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq((1L, 0L, 0L), (2L, 1L, 1L), (3L, 2L, 1L),
      (4L, 0L, 0L), (5L, 0L, 0L)))
    // production form runs with hyperplane buckets
    val auto = Similarity.semDedupAuto(vecs, "embedding", "vec_id",
      minCosine = 0.95, planes = 4)
    assert(auto.count() == 5)
  }

  test("sq8 quantization: exact scale/codes, zero-vector guard") {
    val df = Seq(
      (1L, Array(127.0f, -254.0f, 63.5f)),
      (2L, Array(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = df.select($"vec_id",
        Similarity.sq8Scale($"embedding").as("s"),
        Similarity.sq8Codes($"embedding",
          Similarity.sq8Scale($"embedding")).as("c"))
      .orderBy($"vec_id").collect()
    assert(got(0).getDouble(1) == 2.0)
    assert(got(0).getSeq[Int](2) == Seq(64, -127, 32)) // 63.5/2 -> 32
    assert(got(1).getDouble(1) == 0.0)
    assert(got(1).getSeq[Int](2) == Seq(0, 0, 0))
  }

  test("sq8TopK: self-retrieval first, high recall vs exact ranking") {
    val q = emb.where($"vec_id" < 10)
    val sq = Similarity.sq8TopK(emb, q, "embedding", "vec_id",
      "vec_id", k = 5).cache()
    // a vector's quantized cosine with itself is exactly 1 -> rank 1
    // (id tiebreak favors itself only if no other vector also hits 1,
    // so assert membership of self in the top ranks instead)
    val self = sq.where($"query_id" === $"corpus_id")
    assert(self.count() == 10)
    assert(self.where($"cosine_q" < 0.999999).count() == 0)
    // recall@5 vs the exact float ranking: int8 on unit-ish vectors
    // shifts only near-ties
    val exact = Similarity.bruteForceTopK(emb, q, "embedding",
      "vec_id", "vec_id", k = 5)
    val overlap = sq.select($"query_id", $"corpus_id")
      .intersect(exact.select($"query_id", $"corpus_id")).count()
    assert(overlap >= 40L, s"recall@5 overlap $overlap of 50")
    sq.unpersist()
  }

  test("sq8 stored-code table round-trips through array<tinyint> " +
      "parquet with identical retrieval") {
    val q = emb.where($"vec_id" < 5)
    val dir = java.nio.file.Files
      .createTempDirectory("sq8codes").toString
    // persist the ingest artifact in its 1-byte-per-dim at-rest form
    Similarity.sq8CodeTable(emb, "embedding", "vec_id")
      .withColumn("codes", $"codes".cast("array<tinyint>"))
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
      .withColumn("codes", $"codes".cast("array<int>"))
    val a = Similarity.sq8TopKFromCodes(stored, q, "embedding",
        "vec_id", "vec_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .sortBy(x => (x._1, x._3))
    val b = Similarity.sq8TopK(emb, q, "embedding", "vec_id",
        "vec_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .sortBy(x => (x._1, x._3))
    assert(a.toSeq == b.toSeq,
      "codes must fit int8 exactly — the tinyint round-trip is lossless")
  }

  test("ivf assignment: literal-expression and broadcast-kernel forms " +
      "are bit-identical at nlist 256 (the auto-switch contract)") {
    // 256 centroids x the embedding dim pushes the literal form past
    // its comfort zone — exactly where ivfTopKWithCentroids switches
    // to the kernel; both forms must agree on EVERY row, ties
    // included, or the switch would change retrieval results
    val sample = emb
      .select(col("embedding"),
        xxhash64(lit(7L), col("vec_id")).as("hr_"))
      .orderBy(col("hr_")).limit(256)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val lit256 = Similarity
      .ivfAssignLiteral(emb, "embedding", "vec_id", sample)
      .select(col("corpus_id"), col("centroid_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    val ker256 = Similarity
      .ivfAssignKernel(emb, "embedding", "vec_id", sample)
      .select(col("corpus_id"), col("centroid_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(lit256.toSeq == ker256.toSeq)
    // and the auto-switch picks the kernel here: 256 x dim exceeds
    // the literal-term budget for any dim > 64
    val dim = sample.head.length
    if (256L * dim > Similarity.LiteralAssignMaxTerms) {
      val topk = Similarity.ivfTopKWithCentroids(emb, emb.limit(2),
        "embedding", "vec_id", "vec_id", k = 3, sample, nprobe = 4)
      assert(topk.count() > 0)
    }
    // MALFORMED vectors must agree too (null embedding, wrong
    // length, null element): the literal form's dists all go null
    // and array_min resolves to (null, 0) — centroid 0 — and the
    // kernel must never NPE or diverge on the same rows
    val idx = sequence(lit(1), lit(dim))
    val weird = spark.range(9001, 9004).toDF("vec_id")
      .select($"vec_id",
        when($"vec_id" === 9001, lit(null)
            .cast("array<float>"))
          .when($"vec_id" === 9002,
            array(lit(1.0f), lit(2.0f)))
          .otherwise(transform(idx, i =>
            when(i === 1, lit(null).cast("float"))
              .otherwise(i.cast("float")))).as("embedding"))
      .unionByName(emb.limit(5).select($"vec_id", $"embedding"))
    def run(f: (org.apache.spark.sql.DataFrame, String, String,
        Array[Array[Double]]) => org.apache.spark.sql.DataFrame) =
      f(weird, "embedding", "vec_id", sample)
        .select($"corpus_id", $"centroid_id")
        .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    val litW = run(Similarity.ivfAssignLiteral)
    val kerW = run(Similarity.ivfAssignKernel)
    assert(litW.toSeq == kerW.toSeq, s"lit=${litW.toSeq} ker=${kerW.toSeq}")
    assert(litW.filter(_._1 >= 9001).forall(_._2 == 0))
  }

  test("ivfpq: residual ADC is exact on a representable fixture — " +
      "every vector self-retrieves at distance 0 inside its own cell") {
    // corpus vectors constructed as centroid + codeword concat, all
    // values exactly representable in float, so the residual IS a
    // codeword pair: encode recovers it, the LUT distance to it is 0,
    // and ADC(q, q) = 0 < ADC(q, anything else)
    val cents = Array(Array(10.0, 10, 10, 10),
      Array(-10.0, -10, -10, -10))
    val books = Array(
      Array(Array(1.0, 0.0), Array(2.0, 1.0)),
      Array(Array(0.0, 3.0), Array(4.0, -1.0)))
    val rows = for {
      cid <- 0 to 1; c0 <- 0 to 1; c1 <- 0 to 1
    } yield {
      val v = Array(
        cents(cid)(0) + books(0)(c0)(0),
        cents(cid)(1) + books(0)(c0)(1),
        cents(cid)(2) + books(1)(c1)(0),
        cents(cid)(3) + books(1)(c1)(1))
      ((cid * 4 + c0 * 2 + c1).toLong, v.map(_.toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.ivfPqTopKWithParams(df, df, "embedding",
        "vec_id", "vec_id", k = 1, cents, books, nprobe = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.length == 8)
    got.foreach { case (q, c, d) =>
      assert(q == c && d == 0.0, s"query $q retrieved $c at $d")
    }
  }

  test("ivfpq with nprobe = nlist equals an independent brute-force " +
      "residual-ADC ranking; partitioning-invariant") {
    // parameters mirror the q152 gate: id-picked coarse centroids and
    // codebooks over the real embeddings — the EXPECTED ranking is
    // recomputed here from scratch (plain scala doubles), not via any
    // engine code path
    val all = emb.orderBy($"vec_id")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(_.toDouble).toArray).toMap
    val cents = (100L to 103L).map(all).toArray
    val books = Array.tabulate(8) { j =>
      (200L to 207L).map(i => all(i).slice(j * 8, (j + 1) * 8)).toArray
    }
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < b.length) { val x = a(i) - b(i); d += x * x; i += 1 }
      d
    }
    def assign(v: Array[Double]): Int =
      cents.indices.minBy(c => (sq(v, cents(c)), c))
    def codes(v: Array[Double]): Array[Int] = {
      val cell = cents(assign(v))
      val rv = Array.tabulate(64)(i => v(i) - cell(i))
      Array.tabulate(8) { j =>
        books(j).indices.minBy(c =>
          (sq(rv.slice(j * 8, (j + 1) * 8), books(j)(c)), c))
      }
    }
    val queries = (0L until 4L).toArray
    val expected = queries.flatMap { qid =>
      val qv = all(qid)
      all.toSeq.map { case (cid, cv) =>
        val cell = cents(assign(cv))
        val qr = Array.tabulate(64)(i => qv(i) - cell(i))
        val cc = codes(cv)
        val adc = (0 until 8).map { j =>
          sq(qr.slice(j * 8, (j + 1) * 8), books(j)(cc(j)))
        }.sum
        (qid, cid, adc)
      }.sortBy(x => (x._3, x._2)).take(5).zipWithIndex
        .map { case ((q, c, _), i) => (q, c, i + 1) }
    }.toSet
    def run(df: org.apache.spark.sql.DataFrame) = Similarity
      .ivfPqTopKWithParams(df, emb.where($"vec_id" < 4), "embedding",
        "vec_id", "vec_id", k = 5, cents, books, nprobe = cents.length)
      .select($"query_id", $"corpus_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(run(emb) == expected)
    assert(run(emb.repartition(7)) == expected)
  }

  test("ivfpq squared-L2 assignment: literal and kernel forms agree " +
      "at nlist 256 including malformed vectors (auto-switch parity)") {
    val sample = emb
      .select(col("embedding"),
        xxhash64(lit(11L), col("vec_id")).as("hr_"))
      .orderBy(col("hr_")).limit(256)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dim = sample.head.length
    val idx = sequence(lit(1), lit(dim))
    val weird = spark.range(9001, 9004).toDF("vec_id")
      .select($"vec_id",
        when($"vec_id" === 9001, lit(null).cast("array<float>"))
          .when($"vec_id" === 9002, array(lit(1.0f), lit(2.0f)))
          .otherwise(transform(idx, i =>
            when(i === 1, lit(null).cast("float"))
              .otherwise(i.cast("float")))).as("embedding"))
      .unionByName(emb.select($"vec_id", $"embedding"))
    def run(f: (org.apache.spark.sql.DataFrame, String, String,
        Array[Array[Double]]) => org.apache.spark.sql.DataFrame) =
      f(weird, "embedding", "vec_id", sample)
        .select($"corpus_id", $"centroid_id")
        .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    val l = run(Similarity.ivfPqAssignLiteral)
    val k2 = run(Similarity.ivfPqAssignKernel)
    assert(l.toSeq == k2.toSeq)
    assert(l.filter(_._1 >= 9001).forall(_._2 == 0))
  }

  test("ivfpq residual encode: the mapPartitions kernel is " +
      "bit-identical to the pqEncode expression path, malformed and " +
      "over-long vectors included") {
    val all = emb.orderBy($"vec_id")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(_.toDouble).toArray).toMap
    val cents = (100L to 107L).map(all).toArray
    val books = Array.tabulate(8) { j =>
      (200L to 215L).map(i => all(i).slice(j * 8, (j + 1) * 8)).toArray
    }
    val dim = 64
    val idx = sequence(lit(1), lit(dim))
    val weird = spark.range(9001, 9005).toDF("vec_id")
      .select($"vec_id",
        when($"vec_id" === 9001, lit(null).cast("array<float>"))
          .when($"vec_id" === 9002, array(lit(1.0f), lit(2.0f)))
          .when($"vec_id" === 9003, transform(idx, i =>
            when(i === 1, lit(null).cast("float"))
              .otherwise(i.cast("float"))))
          // LONGER than dim: the expression path encodes from the
          // first dim elements (subspace slices never reach past
          // them) — the kernel must match, not zero out
          .otherwise(transform(sequence(lit(1), lit(dim + 6)), i =>
            i.cast("float"))).as("embedding"))
      .unionByName(emb.select($"vec_id", $"embedding"))
    val centDf = cents.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("centroid_id", "centroid")
    val assigned = Similarity
      .ivfPqAssignLiteral(weird, "embedding", "vec_id", cents)
      .localCheckpoint(false) // both paths read the same assignment
    def canon(rows: Array[(Long, Seq[Int])]) = rows.sortBy(_._1).toSeq
    val kernel = canon(Similarity
      .pqEncodeResidualKernel(assigned, cents, books)
      .select($"corpus_id", $"codes").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))))
    // the expression twin reattaches the centroid by JOIN (the shape
    // the kernel's broadcast indexing replaces)
    val expr = canon(assigned
      .join(centDf, Seq("centroid_id"))
      .withColumn("rv_", zip_with($"cv", $"centroid",
        (x, c) => x.cast("double") - c))
      .select($"corpus_id",
        Similarity.pqEncode($"rv_", books).as("codes"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))))
    assert(kernel == expr)
    // malformed contract is PER SUBSPACE: the null and too-short rows
    // zero every code, the single-null-element row zeroes ONLY its
    // subspace (the others still encode), the over-long row encodes
    // from its first dim elements
    val byId = kernel.toMap
    (9001L to 9002L).foreach(id =>
      assert(byId(id) == Seq.fill(8)(0), s"row $id"))
    assert(byId(9003L).head == 0)
    assert(byId(9003L).tail != Seq.fill(7)(0))
    assert(byId(9004L) != Seq.fill(8)(0))
  }

  test("ivfpq stored-code table: partitionBy(centroid_id) parquet IS " +
      "the inverted file — the probe partition-prunes to its nprobe " +
      "cells and retrieval is identical to the in-memory pipeline") {
    val all = emb.orderBy($"vec_id")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(_.toDouble).toArray).toMap
    val cents = (100L to 107L).map(all).toArray
    val books = Array.tabulate(8) { j =>
      (200L to 215L).map(i => all(i).slice(j * 8, (j + 1) * 8)).toArray
    }
    val dir = java.nio.file.Files
      .createTempDirectory("ivfpqcodes").toString
    Similarity.ivfPqCodeTable(emb, "embedding", "vec_id", cents, books)
      .write.partitionBy("centroid_id").mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val q = emb.where($"vec_id" < 4)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3)))
      .sortBy(x => (x._1, x._4)).toSeq
    val fromStored = Similarity.ivfPqTopKFromCodes(stored, q,
      "embedding", "vec_id", k = 5, cents, books, nprobe = 2)
    val inMemory = Similarity.ivfPqTopKWithParams(emb, q, "embedding",
      "vec_id", "vec_id", k = 5, cents, books, nprobe = 2)
    assert(canon(fromStored) == canon(inMemory))
    // the probed-cell filter reaches the scan as a PARTITION filter —
    // directory-level pruning, the property that makes the layout an
    // inverted FILE rather than a table that happens to hold codes
    val planStr = fromStored.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*centroid_id[^\\]]*".r
      .findFirstIn(planStr)
    assert(pf.nonEmpty, s"no partition filter in:\n$planStr")
    assert(pf.get.contains("IN") || pf.get.contains("in("),
      s"partition filter is not the probed-cell IN: ${pf.get}")
  }

  test("ivfpq trained path (k-means coarse + residual codebooks) " +
      "returns k ranked rows per query, deterministic under " +
      "repartitioning") {
    val q = emb.where($"vec_id" < 3)
    def run(df: org.apache.spark.sql.DataFrame) = Similarity
      .ivfPqTopK(df, q, "embedding", "vec_id", "vec_id", k = 5,
        nlist = 4, m = 8, ksub = 8, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .sortBy(x => (x._1, x._3)).toSeq
    val a = run(emb)
    assert(a.length == 15)
    assert(run(emb.repartition(5)) == a)
    // self-ADC is only provably minimal WITHIN the query's own cell
    // (other probed cells score against different residuals), so
    // rank 1 is not a theorem here — but on this corpus (pairwise
    // cosine ≤ ~0.51, quantization error ≪ inter-vector distance)
    // every query's self lands in its top-5, a meaningful recall
    // floor for the trained path
    val self = a.filter(x => x._1 == x._2)
    assert(self.length == 3, s"self rows missing from top-5: $a")
  }

  // shared q152-shaped model fixture for the refine tests: id-picked
  // coarse centroids + codebooks over the real embeddings
  private def refineFixture() = {
    val all = emb.orderBy($"vec_id")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(_.toDouble).toArray).toMap
    val cents = (100L to 103L).map(all).toArray
    val books = Array.tabulate(8) { j =>
      (200L to 207L).map(i => all(i).slice(j * 8, (j + 1) * 8)).toArray
    }
    (all, cents, books)
  }

  private def sqD(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < b.length) { val x = a(i) - b(i); d += x * x; i += 1 }
    d
  }

  // ground-truth exact squared-L2 top-k, recomputed in plain scala
  private def exactL2Top(all: Map[Long, Array[Double]],
      queries: Seq[Long], k: Int): Map[Long, Seq[Long]] =
    queries.map { qid =>
      qid -> all.toSeq.map { case (cid, cv) => (cid, sqD(all(qid), cv)) }
        .sortBy(x => (x._2, x._1)).take(k).map(_._1)
    }.toMap

  test("ivfPqTopKRefined: full probe + corpus-covering over-fetch " +
      "equals the independent exact squared-L2 ranking (the refine " +
      "ceiling — compression error fully recovered)") {
    val (all, cents, books) = refineFixture()
    val expected = exactL2Top(all, 0L until 4L, 5).flatMap {
      case (q, ids) => ids.zipWithIndex.map { case (c, i) => (q, c, i + 1) }
    }.toSet
    val codeTable = Similarity.ivfPqCodeTable(emb, "embedding",
      "vec_id", cents, books)
    val got = Similarity.ivfPqTopKRefined(codeTable, emb,
        emb.where($"vec_id" < 4), "embedding", "vec_id", "vec_id",
        k = 5, cents, books, nprobe = cents.length,
        refineFactor = 100)
      .select($"query_id", $"corpus_id", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
  }

  test("ivfPqTopKRefined: recall@5 vs exact L2 never drops below the " +
      "unrefined ADC probe's at the same nprobe") {
    val (all, cents, books) = refineFixture()
    val truth = exactL2Top(all, 0L until 8L, 5)
    val q = emb.where($"vec_id" < 8)
    val codeTable = Similarity.ivfPqCodeTable(emb, "embedding",
      "vec_id", cents, books)
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"query_id", $"corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
      truth.map { case (qid, ids) =>
        ids.count(got.getOrElse(qid, Set.empty)) / 5.0
      }.sum / truth.size
    }
    val plain = recall(Similarity.ivfPqTopKFromCodes(codeTable, q,
      "embedding", "vec_id", k = 5, cents, books, nprobe = 2))
    val refined = recall(Similarity.ivfPqTopKRefined(codeTable, emb,
      q, "embedding", "vec_id", "vec_id", k = 5, cents, books,
      nprobe = 2, refineFactor = 4))
    assert(refined >= plain,
      s"refine dropped recall: $refined < $plain")
    // the re-rank must actually be exact: every refined hit that IS
    // in the truth set carries the truth's exact distance ordering
    assert(refined > 0.0)
  }

  test("MaxQueryCollect: a corpus-scale query table fails the " +
      "driver-side LUT entry points with a named error instead of " +
      "collecting it") {
    val (_, cents, books) = refineFixture()
    val codeTable = Similarity.ivfPqCodeTable(emb, "embedding",
      "vec_id", cents, books).localCheckpoint(true)
    val q4 = emb.where($"vec_id" < 4)
    val old = Similarity.MaxQueryCollect
    try {
      Similarity.MaxQueryCollect = 3
      val e1 = intercept[IllegalArgumentException] {
        Similarity.pqTopKWithCodebooks(emb, q4, "embedding", "vec_id",
          "vec_id", k = 5, books)
      }
      assert(e1.getMessage.contains("pqTopKWithCodebooks") &&
        e1.getMessage.contains("exceeds 3"))
      val e2 = intercept[IllegalArgumentException] {
        Similarity.ivfPqTopKFromCodes(codeTable, q4, "embedding",
          "vec_id", k = 5, cents, books, nprobe = 2)
      }
      assert(e2.getMessage.contains("ivfPqTopKFromCodes"))
      // AT the cap the collect proceeds — the guard is a boundary,
      // not an off-by-one truncation of legal query sets
      Similarity.MaxQueryCollect = 4
      assert(Similarity.ivfPqTopKFromCodes(codeTable, q4, "embedding",
        "vec_id", k = 5, cents, books, nprobe = 2).count() == 20)
    } finally Similarity.MaxQueryCollect = old
  }

  test("ivfPqTopKManyQueries: bit-identical to the driver-LUT probe " +
      "and legal past MaxQueryCollect (no driver collect anywhere)") {
    val (_, cents, books) = refineFixture()
    val codeTable = Similarity.ivfPqCodeTable(emb, "embedding",
      "vec_id", cents, books).localCheckpoint(true)
    val q = emb.where($"vec_id" < 8)
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3)))
      .sortBy(x => (x._1, x._4)).toSeq
    val lut = canon(Similarity.ivfPqTopKFromCodes(codeTable, q,
      "embedding", "vec_id", k = 5, cents, books, nprobe = 3))
    // EXACT double equality — the kernel replays the LUT arithmetic
    // (per-subspace subtotal then the j-ascending fold), not an
    // epsilon-close reimplementation
    val old = Similarity.MaxQueryCollect
    try {
      Similarity.MaxQueryCollect = 4 // 8 queries: LUT path would refuse
      val many = canon(Similarity.ivfPqTopKManyQueries(codeTable, q,
        "embedding", "vec_id", k = 5, cents, books, nprobe = 3))
      assert(many == lut)
    } finally Similarity.MaxQueryCollect = old
  }

  test("ivfPqTopKManyQueries fails loudly on malformed queries and " +
      "model-mismatched codes") {
    val (_, cents, books) = refineFixture()
    val codeTable = Similarity.ivfPqCodeTable(emb, "embedding",
      "vec_id", cents, books).localCheckpoint(true)
    def chain(t: Throwable): String = {
      var msgs = List.empty[String]
      var cur = t
      while (cur != null) {
        msgs ::= String.valueOf(cur.getMessage); cur = cur.getCause
      }
      msgs.mkString(" | ")
    }
    val badQ = Seq((99L, Seq(1f, 2f, 3f))).toDF("vec_id", "embedding")
    val e1 = intercept[Throwable] {
      Similarity.ivfPqTopKManyQueries(codeTable, badQ, "embedding",
        "vec_id", k = 5, cents, books, nprobe = 2).count()
    }
    assert(chain(e1).contains("malformed query vector"), chain(e1))
    val stale = codeTable.withColumn("codes",
      transform(col("codes"), c => c + 1000))
    val e2 = intercept[Throwable] {
      Similarity.ivfPqTopKManyQueries(stale,
        emb.where($"vec_id" < 2), "embedding", "vec_id", k = 5,
        cents, books, nprobe = 2).count()
    }
    assert(chain(e2).contains("different quantizer"), chain(e2))
  }

  test("ivfPqTopKFromCodes fails LOUDLY on a code table that does " +
      "not fit the supplied model (stale persisted quantizer), " +
      "instead of ranking garbage or null distances first") {
    import spark.implicits._
    // m=2, ksub=2, ds=2 model over dim-4 vectors
    val cents = Array(Array(0.0, 0.0, 0.0, 0.0))
    val books = Array(
      Array(Array(1.0, 0.0), Array(2.0, 1.0)),
      Array(Array(0.0, 3.0), Array(4.0, -1.0)))
    val q = Seq((0L, Seq(0.5f, 0.5f, 0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    // a code beyond ksub-1 — e.g. persisted under a larger-ksub model
    val staleKsub = Seq((1L, 0, Seq(3, 0)))
      .toDF("corpus_id", "centroid_id", "codes")
    val e1 = intercept[Throwable] {
      Similarity.ivfPqTopKFromCodes(staleKsub, q, "embedding",
        "vec_id", k = 1, cents, books, nprobe = 1).collect()
    }
    assert(msgChain(e1).contains("does not fit the supplied model"),
      msgChain(e1))
    // wrong code arity — persisted under a different m
    val staleM = Seq((1L, 0, Seq(0)))
      .toDF("corpus_id", "centroid_id", "codes")
    val e2 = intercept[Throwable] {
      Similarity.ivfPqTopKFromCodes(staleM, q, "embedding",
        "vec_id", k = 1, cents, books, nprobe = 1).collect()
    }
    assert(msgChain(e2).contains("does not fit the supplied model"),
      msgChain(e2))
    // a NULL code element must fail too: array_min/array_max SKIP
    // nulls, so an in-range-looking [null, 0] row would otherwise
    // fold a null adc_dist that nulls-first ordering ranks at 1
    val nullCode = Seq((1L, 0)).toDF("corpus_id", "centroid_id")
      .withColumn("codes", array(lit(null).cast("int"), lit(0)))
    val e3 = intercept[Throwable] {
      Similarity.ivfPqTopKFromCodes(nullCode, q, "embedding",
        "vec_id", k = 1, cents, books, nprobe = 1).collect()
    }
    assert(msgChain(e3).contains("does not fit the supplied model"),
      msgChain(e3))
    // a WELL-FORMED table still ranks normally through the check
    val fine = Seq((1L, 0, Seq(0, 0)), (2L, 0, Seq(1, 1)))
      .toDF("corpus_id", "centroid_id", "codes")
    assert(Similarity.ivfPqTopKFromCodes(fine, q, "embedding",
      "vec_id", k = 1, cents, books, nprobe = 1).count() == 1)
  }

  test("ivfPqTrainDistributed (large-nlist form): valid model " +
      "shapes, deterministic under repartitioning, retrieval " +
      "through the standard engines with self in top-5") {
    def run(df: org.apache.spark.sql.DataFrame) = Similarity
      .ivfPqTrainDistributed(df, "embedding", "vec_id", nlist = 4,
        m = 8, ksub = 8, sampleSize = 256, lloydIters = 3)
    val (cents, books) = run(emb)
    assert(cents.length == 4 && cents.head.length == 64)
    assert(books.length == 8 && books.forall(_.length == 8) &&
      books.forall(_.forall(_.length == 8)))
    val (cents2, books2) = run(emb.repartition(7))
    assert(cents2.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    assert(books2.map(_.map(_.toSeq).toSeq).toSeq ==
      books.map(_.map(_.toSeq).toSeq).toSeq)
    val q = emb.where($"vec_id" < 3)
    val got = Similarity.ivfPqTopKWithParams(emb, q, "embedding",
        "vec_id", "vec_id", k = 5, cents, books, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(got.length == 15)
    // the corpus-trained quantizer meets the trained-path recall bar:
    // every query's self lands in its top-5 (the q152-family floor)
    assert(got.count(x => x._1 == x._2) == 3, got.toSeq)
  }
}
