package graft.text

import graft.TestSpark
import graft.core.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs =
    Tables.table(spark, TestSpark.sfDir, "documents").cache()

  test("qualityFilter keeps ~ the requested fraction, per language") {
    val n = docs.count()
    val kept = Curation.qualityFilter(docs, "text", keepFraction = 0.5)
    val k = kept.count()
    assert(k > 0 && k < n)
    // per-language keep rates all land near 50% (sketch-approximate,
    // ties at the cutoff can push past it)
    val langRates = docs
      .withColumn("lang", TextAnalysis.languageId($"text"))
      .groupBy($"lang").count()
      .join(kept.withColumn("lang", TextAnalysis.languageId($"text"))
        .groupBy($"lang").count().withColumnRenamed("count", "kept"),
        "lang")
      .select($"lang", $"kept" / $"count")
      .collect()
    langRates.foreach { r =>
      val rate = r.getDouble(1)
      assert(rate > 0.3 && rate < 0.75, s"${r.getString(0)}: $rate")
    }
    // the kept docs are the HIGH-quality side: their minimum per-language
    // score >= the dropped docs' ... at least mean-wise
    val scoredAll = docs.withColumn("q",
      TextAnalysis.qualityScore($"text"))
    val meanAll = scoredAll.agg(avg($"q")).head().getDouble(0)
    val meanKept = kept.withColumn("q",
      TextAnalysis.qualityScore($"text")).agg(avg($"q")).head().getDouble(0)
    assert(meanKept > meanAll)
    // schema is untouched (helper columns dropped)
    assert(kept.columns.toSeq == docs.columns.toSeq)
  }

  test("stratifiedSample: deterministic, per-stratum rates, drops rest") {
    val df = spark.range(0, 20000)
      .select($"id",
        element_at(array(lit("en"), lit("de"), lit("fr")),
          (pmod($"id", lit(3)) + 1).cast("int")).as("lang"))
    val fractions = Map("en" -> 0.5, "de" -> 0.1)
    val s1 = Curation.stratifiedSample(df, "lang", fractions, Seq("id"))
    val s2 = Curation.stratifiedSample(df.repartition(13), "lang",
      fractions, Seq("id"))
    // identical rows under a different partitioning
    assert(s1.select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
      s2.select($"id").collect().map(_.getLong(0)).sorted.toSeq)
    val rates = s1.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / 6667.0).toMap
    assert(!rates.contains("fr")) // stratum not in fractions -> dropped
    assert(math.abs(rates("en") - 0.5) < 0.05, s"en ${rates("en")}")
    assert(math.abs(rates("de") - 0.1) < 0.03, s"de ${rates("de")}")
    // a different seed draws a different sample
    val s3 = Curation.stratifiedSample(df, "lang", fractions, Seq("id"),
      seed = 7L)
    assert(s3.select($"id").collect().map(_.getLong(0)).sorted.toSeq !=
      s1.select($"id").collect().map(_.getLong(0)).sorted.toSeq)
    // the portable md5 draw keeps the same semantics (rates, dropped
    // strata, partitioning invariance) with a different permutation
    val m1 = Curation.stratifiedSample(df, "lang", fractions, Seq("id"),
      draw = graft.functions.Draws.md5Uniform)
    val m2 = Curation.stratifiedSample(df.repartition(17), "lang",
      fractions, Seq("id"), draw = graft.functions.Draws.md5Uniform)
    assert(m1.select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
      m2.select($"id").collect().map(_.getLong(0)).sorted.toSeq)
    val mRates = m1.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / 6667.0).toMap
    assert(!mRates.contains("fr"))
    assert(math.abs(mRates("en") - 0.5) < 0.05)
  }

  test("heuristicStats computes Gopher/C4 signals and keep verdict") {
    val df = Seq(
      // 60 clean words, sentence lines -> keep
      (1L, (1 to 60).map(i => "word" + i).grouped(20)
        .map(_.mkString(" ") + " ends.").mkString("\n")),
      // lorem ipsum kill flag
      (2L, (1 to 60).map(i => "word" + i).mkString(" ") + " lorem ipsum"),
      // code-ish: curly brace
      (3L, (1 to 60).map(i => "fn" + i).mkString(" ") + " { }"),
      // too short
      (4L, "tiny doc"),
      // bullet-heavy: every line starts with -
      (5L, (1 to 60).map(i => "- item" + i).mkString("\n")))
      .toDF("doc_id", "text")
    val r = Curation.heuristicStats(df, "text")
      .select($"doc_id", $"keep", $"n_words", $"has_lorem", $"has_brace",
        $"frac_bullet_lines")
      .orderBy($"doc_id").collect()
    assert(r.map(x => x.getLong(0) -> x.getLong(1)).toSeq ==
      Seq(1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 0L))
    assert(r(1).getLong(3) == 1L) // lorem flagged
    assert(r(2).getLong(4) == 1L) // brace flagged
    assert(r(4).getDouble(5) == 1.0) // all lines bulleted
    val kept = Curation.heuristicFilter(df, "text")
    assert(kept.columns.toSeq == df.columns.toSeq)
    assert(kept.select($"doc_id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L))
  }

  test("piiStats counts and redactPii removes emails/IPs/phones") {
    val df = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org or 10.0.0.17 " +
        "and 555-123-4567 thanks"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.co c@d.io one ip 192.168.1.1"))
      .toDF("doc_id", "text")
    val stats = Curation.piiStats(df, "text").orderBy($"doc_id")
      .select($"n_emails", $"n_ipv4", $"n_phones")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(stats.toSeq == Seq((1L, 1L, 1L), (0L, 0L, 0L), (2L, 1L, 0L)))
    val red = df.select(Curation.redactPii($"text")).orderBy($"text")
      .as[String].collect().mkString(" ")
    assert(!red.contains("jane.doe") && !red.contains("10.0.0.17") &&
      !red.contains("555-123-4567") && !red.contains("a@b.co") &&
      !red.contains("192.168.1.1"))
    assert(red.contains("<EMAIL>") && red.contains("<IP>") &&
      red.contains("<PHONE>"))
  }

  test("chunkTokens windows cover every token with the right overlap") {
    val df = Seq((7L, (1 to 100).map(i => "t" + i).mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Curation.chunkTokens(df, "text", Seq("doc_id"),
      maxTokens = 32, stride = 16).orderBy($"chunk_idx").collect()
    // starts 0,16,...,96 -> 7 chunks; sizes 32 except the tail
    assert(chunks.length == 7)
    assert(chunks.map(_.getLong(2)).toSeq ==
      Seq(32L, 32L, 32L, 32L, 32L, 20L, 4L))
    assert(chunks.head.getString(3).startsWith("t1 t2 "))
    assert(chunks.last.getString(3) == "t97 t98 t99 t100")
    // consecutive chunks overlap by maxTokens - stride tokens
    val first = chunks(0).getString(3).split(" ")
    val second = chunks(1).getString(3).split(" ")
    assert(first.drop(16).toSeq == second.take(16).toSeq)
  }

  test("tfIdfTopTerms surfaces the discriminative term") {
    // 30 distinct words shared by every doc (idf = 1, tf = 1 each);
    // the doc-specific rare term wins on idf despite equal-ish tf
    val common = (1 to 30).map(i => "c" + i).mkString(" ")
    val df = Seq(
      (1L, s"$common zebra zebra"),
      (2L, s"$common yak"),
      (3L, common))
      .toDF("doc_id", "text")
    val r = Curation.tfIdfTopTerms(df, "text", "doc_id")
      .orderBy($"doc_id").collect()
    assert(r(0).getString(1) == "zebra")
    assert(r(1).getString(1) == "yak")
    // doc 3 is all-common: every term ties, lexicographic tie-break
    assert(r(2).getString(1) == "c1")
    assert(r(0).getLong(3) == 2L) // zebra tf
  }

  test("mixtureWeights: largest exact-mixture subsample") {
    val df = (Seq.fill(100)("a") ++ Seq.fill(50)("b") ++
      Seq.fill(200)("c") ++ Seq.fill(99)("ignored"))
      .zipWithIndex.map(_.swap).toDF("id", "src")
    val w = Curation.mixtureWeights(df, "src",
      Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
      .orderBy($"src").collect()
    // ratios n/T: a 200, b 200, c 800 -> c_min = 200: a and b keep
    // fully, c keeps 200*0.25 = 50 of 200; 'ignored' drops
    assert(w.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(w.map(_.getDouble(3)).toSeq == Seq(1.0, 1.0, 0.25))
    assert(w.map(_.getLong(4)).toSeq == Seq(100L, 50L, 50L))
    // unbalanced target: b becomes the binding stratum (50/0.2 = 250)
    val w2 = Curation.mixtureWeights(df, "src",
      Map("a" -> 0.2, "b" -> 0.2, "c" -> 0.6)).orderBy($"src").collect()
    assert(w2.map(_.getLong(4)).toSeq == Seq(50L, 50L, 150L))
    assert(w2(1).getDouble(3) == 1.0)
    assert(w2.map(_.getDouble(3)).forall(f => f > 0 && f <= 1.0))
  }

  test("exactSamplePerStratum: exact counts, deterministic, seeded") {
    val df = spark.range(0, 3000)
      .select($"id", concat(lit("s"), pmod($"id", lit(3))).as("src"))
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select($"id").collect().map(_.getLong(0)).sorted.toSeq
    val s1 = Curation.exactSamplePerStratum(df, "src", 25, Seq("id"))
    assert(s1.groupBy($"src").count().collect()
      .forall(_.getLong(1) == 25L))
    val s2 = Curation.exactSamplePerStratum(df.repartition(11), "src",
      25, Seq("id"))
    assert(ids(s1) == ids(s2)) // partitioning-invariant
    val s3 = Curation.exactSamplePerStratum(df, "src", 25, Seq("id"),
      seed = 7L)
    assert(ids(s1) != ids(s3)) // seed changes the draw
    // n larger than a stratum keeps the whole stratum
    val tiny = df.where($"id" < 5)
    assert(Curation.exactSamplePerStratum(tiny, "src", 25, Seq("id"))
      .count() == 5L)
  }

  test("chunkTokens: empty/whitespace docs yield no chunks") {
    val df = Seq((1L, "one two three"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val out = Curation.chunkTokens(df, "text", Seq("doc_id"), 8, 4)
    assert(out.select($"doc_id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L))
  }

  test("mixtureWeights: a target stratum absent from the data zeroes the mixture") {
    val df = Seq.fill(100)("a").zipWithIndex.map(_.swap)
      .toDF("id", "src")
    val w = Curation.mixtureWeights(df, "src",
      Map("a" -> 0.5, "z" -> 0.5)).orderBy($"src").collect()
    // largest exact 50/50 mixture with zero 'z' docs is EMPTY
    assert(w.map(_.getString(0)).toSeq == Seq("a", "z"))
    assert(w.map(_.getLong(4)).toSeq == Seq(0L, 0L))
    assert(w.map(_.getDouble(3)).toSeq == Seq(0.0, 0.0))
  }

  test("packGreedy: null sizes pack as zero instead of NPE-ing") {
    val df = Seq(("a", 1L, Some(60L)), ("a", 2L, None),
      ("a", 3L, Some(50L))).toDF("src", "seq", "n")
    val out = Curation.packGreedy(df, "n", 100L, Seq("src"), Seq("seq"))
      .orderBy($"seq").collect().map(r => (r.getLong(3), r.getLong(4)))
    // null row occupies no budget: 60 -> p0; null -> p0@60; 50 -> p1
    assert(out.toSeq == Seq((0L, 0L), (0L, 60L), (1L, 0L)))
  }

  test("packGreedy: budget respected, offsets contiguous, deterministic") {
    val df = Seq(
      ("a", 1L, 60L), ("a", 2L, 50L), ("a", 3L, 10L), ("a", 4L, 30L),
      ("a", 5L, 200L), // oversized: own pack
      ("a", 6L, 5L),
      ("b", 1L, 100L), ("b", 2L, 1L))
      .toDF("src", "seq", "n")
    def run(d: org.apache.spark.sql.DataFrame) =
      Curation.packGreedy(d, "n", budget = 100L, Seq("src"), Seq("seq"))
        .orderBy($"src", $"seq").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(3),
          r.getLong(4))).toSeq
    val out = run(df)
    // a: 60 -> p0; 50 would overflow -> p1; 10,30 fit p1; 200 -> p2
    //    alone; 5 -> p3 (200 filled p2 past budget)
    assert(out == Seq(
      ("a", 1L, 0L, 0L), ("a", 2L, 1L, 0L), ("a", 3L, 1L, 50L),
      ("a", 4L, 1L, 60L), ("a", 5L, 2L, 0L), ("a", 6L, 3L, 0L),
      ("b", 1L, 0L, 0L), ("b", 2L, 1L, 0L)))
    assert(run(df.repartition(5)) == out) // partitioning-invariant
    // no pack except oversized singletons exceeds the budget
    val packSums = out.groupBy(r => (r._1, r._3)).values
      .map(rows => rows.map(r => r._4).max)
    assert(packSums.forall(_ <= 100L))
  }

  test("decontaminateSemantic flags embedding-close docs only") {
    val probes = Seq(Tuple1(Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("embedding")
    val corpus = Seq(
      (1L, Array(2.0f, 0.0f, 0.0f, 0.0f)),   // same direction, cos=1
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),   // orthogonal
      (3L, Array(0.9f, 0.1f, 0.0f, 0.0f)))   // near-parallel
      .toDF("vec_id", "embedding")
    val r = Curation.decontaminateSemantic(corpus, probes, "embedding",
        "vec_id", minCosine = 0.9)
      .orderBy($"vec_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((1L, 1L, 1L), (2L, 0L, 0L), (3L, 1L, 1L)))
  }

  test("decontaminateSemantic ignores zero-norm vectors on both sides") {
    // a zero-norm probe would otherwise flag the ENTIRE corpus (0/0 =
    // NaN, and NaN > threshold under Spark's ordering); a zero-norm
    // corpus doc would match every probe
    val probes = Seq(
      Tuple1(Array(0.0f, 0.0f, 0.0f, 0.0f)),  // degenerate probe
      Tuple1(Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("embedding")
    val corpus = Seq(
      (1L, Array(2.0f, 0.0f, 0.0f, 0.0f)),    // matches real probe
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),    // orthogonal -> clean
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)))    // zero-norm corpus doc
      .toDF("vec_id", "embedding")
    val r = Curation.decontaminateSemantic(corpus, probes, "embedding",
        "vec_id", minCosine = 0.9)
      .orderBy($"vec_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((1L, 1L, 1L), (2L, 0L, 0L), (3L, 0L, 0L)))
  }

  test("curation operators reject reserved working-column collisions") {
    val df = Seq((1L, "some text here", 0L)).toDF("id", "text", "toks_")
    intercept[IllegalArgumentException] {
      Curation.heuristicStats(df, "text")
    }
    intercept[IllegalArgumentException] {
      Curation.chunkTokens(df, "text", Seq("id"))
    }
    intercept[IllegalArgumentException] {
      Curation.tfIdfTopTerms(df, "text", "id")
    }
    intercept[IllegalArgumentException] {
      Curation.unigramLogProb(df, "text", "id")
    }
    intercept[IllegalArgumentException] {
      Curation.mixtureWeights(Seq((1L, "a")).toDF("id", "src"), "src",
        Map("a" -> 0.25, "b" -> 0.25)) // shares sum to 0.5
    }
  }

  test("dedupLines drops cross-document boilerplate, keeps order") {
    val df = Seq(
      (1L, "unique opening line\nSHARED FOOTER\nmore body text"),
      (2L, "different content here\n  SHARED FOOTER  \ntail line"),
      (3L, "third document body\nSHARED FOOTER"),
      (4L, "no boilerplate at all\njust original text"))
      .toDF("doc_id", "text")
    val r = Curation.dedupLines(df, "text", "doc_id", maxDocs = 3)
      .orderBy($"doc_id").collect()
    // the footer appears (trimmed) in 3 docs >= maxDocs -> dropped
    // everywhere, including the padded variant in doc 2
    assert(r.map(_.getLong(2)).toSeq == Seq(1L, 1L, 1L, 0L))
    assert(r(0).getString(3) == "unique opening line\nmore body text")
    assert(r(1).getString(3) == "different content here\ntail line")
    assert(r(2).getString(3) == "third document body")
    // boilerplate-free doc reconstructs byte-identically
    assert(r(3).getString(3) == "no boilerplate at all\njust original text")
    assert(r.map(_.getLong(1)).toSeq == Seq(3L, 3L, 2L, 2L))
    // below the threshold nothing is dropped
    val loose = Curation.dedupLines(df, "text", "doc_id", maxDocs = 4)
      .agg(sum($"n_dropped")).head().getLong(0)
    assert(loose == 0L)
    // empty lines never count as boilerplate
    val blanky = Seq((1L, "a\n\nb"), (2L, "c\n\nd"), (3L, "e\n\nf"))
      .toDF("doc_id", "text")
    val rb = Curation.dedupLines(blanky, "text", "doc_id", maxDocs = 2)
      .agg(sum($"n_dropped")).head().getLong(0)
    assert(rb == 0L)
    // null-text docs keep their row (one row per doc is the contract;
    // join-back callers must not lose documents)
    val withNull = Seq((1L, "a\nb"), (2L, null), (3L, "a\nc"))
      .toDF("doc_id", "text")
    val rn = Curation.dedupLines(withNull, "text", "doc_id", maxDocs = 2)
      .orderBy($"doc_id").collect()
    assert(rn.length == 3)
    assert(rn(1).getString(3) == "")
  }

  test("decontaminate flags k-gram overlap with the probe set") {
    val probes = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words alpha beta gamma more tail content here"),
      (2L, "completely clean document with no benchmark overlap at all"),
      // two shared trigrams: "alpha beta gamma", "beta gamma delta"
      (3L, "xx alpha beta gamma delta yy"))
      .toDF("doc_id", "text")
    val r = Curation.decontaminate(corpus, probes, "text", "doc_id",
        k = 3)
      .orderBy($"doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((1L, 1L, 1L), (2L, 0L, 0L), (3L, 2L, 1L)))
  }

  test("hashedNgramBuckets emits unigrams then bigrams, in range") {
    def buckets(df: org.apache.spark.sql.DataFrame, b: Int) = df
      .withColumn("toks", TextAnalysis.tokens($"text"))
      .select($"doc_id", Curation.hashedNgramBuckets($"toks", b).as("bk"))
    val df = Seq((1L, "a b c"), (2L, "solo")).toDF("doc_id", "text")
    val r = buckets(df, 64).orderBy($"doc_id").collect()
      .map(x => x.getSeq[Int](1))
    assert(r(0).length == 5)          // 3 unigrams + 2 bigrams
    assert(r(1).length == 1)          // no bigrams for one token
    assert(r.flatten.forall(k => k >= 0 && k < 64))
    // feature identity, not position: shared tokens share buckets
    val Seq(b1, b2) =
      buckets(Seq((1L, "x y"), (2L, "y x")).toDF("doc_id", "text"), 1024)
      .orderBy($"doc_id").collect().map(_.getSeq[Int](1)).toSeq
    assert(b1.take(2).toSet == b2.take(2).toSet) // unigram buckets swap
    assert(b1(2) != b2(2) || b1 == b2)           // bigrams differ (generically)
  }

  test("linearScore: mean pooling, bias, and a planted spam weight") {
    val df = Seq(
      (1L, "good words entirely unrelated to spam"),
      (2L, "buy now buy now buy now"),
      (3L, "good words entirely unrelated to spam")) // clone of 1
      .toDF("doc_id", "text")
    // all-zero model -> every doc scores exactly the bias
    val zero = Curation.linearScore(df, "text", "doc_id",
      Array.fill(128)(0.0), bias = 0.25)
      .collect().map(_.getDouble(2))
    assert(zero.forall(_ == 0.25))
    // constant model -> bias + w for any text (mean of equal weights)
    val const = Curation.linearScore(df, "text", "doc_id",
      Array.fill(128)(0.5), bias = 1.0)
      .collect().map(_.getDouble(2))
    assert(const.forall(s => math.abs(s - 1.5) < 1e-12))
    // plant a negative weight on the bucket of "buy now": doc 2 drops
    val spamBucket = Seq(Tuple1("buy now")).toDF("f")
      .select(pmod(xxhash64($"f"), lit(128)).cast("int")).head().getInt(0)
    val w = Array.fill(128)(0.0); w(spamBucket) = -1.0
    val scored = Curation.linearScore(df, "text", "doc_id", w)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored(2L) < scored(1L))
    assert(scored(1L) == scored(3L)) // identical text, identical score
    // n_feats = 2n-1
    val nf = Curation.linearScore(df, "text", "doc_id", w)
      .where($"doc_id" === 2L).head().getLong(1)
    assert(nf == 11) // 6 unigrams + 5 bigrams
  }

  test("bigramLogProb: pair counts, repeated transitions score higher") {
    val df = Seq(
      (1L, "a b a b a b a b"),   // one dominant transition each way
      (2L, "a b c d e f g h"),   // all transitions unique
      (3L, "solo"),              // no pairs
      (4L, "")).toDF("doc_id", "text")
    val r = Curation.bigramLogProb(df, "text", "doc_id")
      .orderBy($"doc_id").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(7L, 7L, 0L, 0L))
    // doc 1's transitions are corpus-frequent -> fewer bits per pair
    assert(r(0).getDouble(3) < r(1).getDouble(3))
    assert(r(2).isNullAt(3) && r(3).isNullAt(3))
    // deterministic
    val r2 = Curation.bigramLogProb(df, "text", "doc_id")
      .orderBy($"doc_id").collect()
    assert(r.map(_.getLong(2)).toSeq == r2.map(_.getLong(2)).toSeq)
  }

  test("vocabTopK ranks by count then token, truncates to k") {
    val df = Seq("b b b a a c", "a d d", " ").toDF("text")
    val v = Curation.vocabTopK(df, "text", k = 3)
      .orderBy($"rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // a=3, b=3 (tie -> a first), d=2; c cut at k=3; blank text adds no
    // empty token
    assert(v.toSeq == Seq((1L, "a", 3L), (2L, "b", 3L), (3L, "d", 2L)))
  }

  test("trainingOrder: dense per-shard positions, stable under " +
      "repartitioning, re-drawn by seed") {
    val df = (1L to 200L).toDF("doc_id")
    val t1 = Curation.trainingOrder(df, Seq("doc_id"), numShards = 4)
    // every shard's positions are exactly 0..count-1
    val dense = t1.groupBy($"shard").agg(count(lit(1)).as("n"),
        min($"pos").as("lo"), max($"pos").as("hi"))
      .where($"lo" =!= 0 || $"hi" =!= $"n" - 1).count()
    assert(dense == 0)
    assert(t1.select($"shard").distinct().count() == 4)
    // identical assignment regardless of input partitioning
    val t2 = Curation.trainingOrder(df.repartition(7), Seq("doc_id"),
      numShards = 4)
    assert(t1.join(t2, Seq("doc_id"))
      .where(t1("shard") =!= t2("shard") || t1("pos") =!= t2("pos"))
      .count() == 0)
    // a different seed is a different permutation
    val t3 = Curation.trainingOrder(df, Seq("doc_id"), numShards = 4,
      seed = 7L)
    assert(t1.join(t3, Seq("doc_id"))
      .where(t1("shard") =!= t3("shard") || t1("pos") =!= t3("pos"))
      .count() > 0)
  }

  test("bm25Score: closed-form check, tf saturation, zero for " +
      "no-overlap docs") {
    // corpus: 4 docs of 4 tokens each (avgdl = 4, N = 4)
    val corpus = Seq(
      (1L, "spark query plan join"),   // both query terms, tf 1 each
      (2L, "spark spark spark run"),   // tf saturation on "spark"
      (3L, "pandas numpy scipy frame"),// no overlap -> 0
      (4L, "query engine spark fast")  // both terms again
    ).toDF("doc_id", "text")
    val queries = Seq("spark query").toDF("text")
    val r = Curation.bm25Score(corpus, queries, "text", "doc_id")
      .orderBy($"doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // closed form: df(spark)=3, df(query)=2, N=4, dl=avgdl=4 so the
    // length norm is 1 and score(term) = ln((N-df+.5)/(df+.5)+1)
    //   * tf*2.2/(tf+1.2)
    def s(df: Int, tf: Int) =
      math.log((4 - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) /
        (tf + 1.2)
    def micro(x: Double) = math.round(x * 1e6)
    val both = micro(s(3, 1)) + micro(s(2, 1))
    assert(r(0) == (1L, 2L, both))
    assert(r(1) == (2L, 1L, micro(s(3, 3))))
    assert(r(2) == (3L, 0L, 0L))
    assert(r(3) == (4L, 2L, both))
    // tf saturation: tripled tf scores higher, but far below 3x
    assert(micro(s(3, 3)) > micro(s(3, 1)) &&
      micro(s(3, 3)) < 3 * micro(s(3, 1)))
    // rare term ("query") outscores common ("spark") at equal tf
    assert(micro(s(2, 1)) > micro(s(3, 1)))
  }

  test("bm25TopK: self-retrieval first, k truncation, per-query ranks") {
    val corpus = Seq(
      (1L, "spark query plan join"),
      (2L, "spark spark spark run"),
      (3L, "pandas numpy scipy frame"),
      (4L, "query engine spark fast"),
      (5L, "unrelated words entirely here")).toDF("doc_id", "text")
    val queries = Seq((10L, "spark query plan join"),
      (20L, "pandas numpy")).toDF("qid", "text")
    val r = Curation.bm25TopK(corpus, queries, "text", "doc_id",
        "qid", k = 2)
      .orderBy($"query_id", $"rank").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(4)))
    // query 10 = doc 1's text: doc 1 matches all 4 terms -> rank 1;
    // k=2 truncates the remaining matches to one more row
    assert(r.count(_._1 == 10L) == 2 && r.head == (10L, 1L, 1L))
    // query 20 matches only doc 3
    assert(r.filter(_._1 == 20L).toSeq == Seq((20L, 3L, 1L)))
    // ranks are dense from 1 within each query
    r.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq ==
        (1 to rows.length).map(_.toLong)) }
  }

  test("rrfFuse: hand-checked contributions, multi-list agreement " +
      "outranks single-list heads, k cut, deterministic ties, and " +
      "the 7812.5 half-way case floors identically everywhere") {
    // list A: (q, d, rank); list B overlaps on d=2 (rank 2 in both)
    val a = Seq((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 2L, 2L), (1L, 9L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val fused = Curation.rrfFuse(Seq(a, b), "query_id", "doc_id",
        k = 3)
      .orderBy($"rank")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    def m(rank: Long): Long = 1000000L / (60 + rank) // = floor
    // doc 2 appears in BOTH lists at rank 2: 2×m(2) beats every
    // single-list head m(1) — the hybrid-agreement property
    assert(fused.head == (2L, 2 * m(2), 2L, 1L), fused.toSeq)
    // singles ranked by their one contribution; k=3 cuts doc 3
    // (m(3) < m(1)); ties on the fused score break by doc_id — docs
    // 1 and 9 both carry m(1), so 1 before 9
    assert(fused.toSeq == Seq(
      (2L, 2 * m(2), 2L, 1L),
      (1L, m(1), 1L, 2L),
      (9L, m(1), 1L, 3L)), fused.toSeq)
    // the scaladoc's half-way case, pinned THROUGH the engine: rank
    // 68 at c=60 makes 1e6/128 = 7812.5 exactly — a ROUND here would
    // sit on a cross-engine tie rule (the q145 failure class); floor
    // is 7812 everywhere
    val half = Curation.rrfFuse(
        Seq(Seq((1L, 5L, 68L)).toDF("query_id", "doc_id", "rank")),
        "query_id", "doc_id", k = 1)
      .select($"rrf_micro").as[Long].head()
    assert(half == 7812L, s"halfway contribution drifted: $half")
    // empty rankings refused
    val e = intercept[IllegalArgumentException] {
      Curation.rrfFuse(Seq.empty, "query_id", "doc_id", k = 1)
    }
    assert(e.getMessage.contains("at least one ranking"))
  }

  test("capPerKey keeps the n best per key with dense 1-based ranks") {
    val df = Seq(
      ("a", 1L, 50L), ("a", 2L, 90L), ("a", 3L, 70L), ("a", 4L, 90L),
      ("b", 5L, 10L))
      .toDF("source", "doc_id", "quality")
    val kept = Curation.capPerKey(df, Seq("source"), 2,
        Seq($"quality".desc, $"doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .sortBy(_._2)
    // a: quality-90 docs 2 and 4 win (tiebreak doc_id); b: under cap
    assert(kept.toSeq == Seq(("a", 2L, 1L), ("a", 4L, 2L),
      ("b", 5L, 1L)))
  }

  test("capPerKey plan keeps the rank-limit pushdown (WindowGroupLimit)") {
    // the per-domain cap is only skew-safe because Spark's
    // InferWindowGroupLimit prunes each map partition to n rows per
    // key BEFORE the shuffle — without it a mega-domain lands
    // corpus-scale on one reducer. Pin the plan shape so an optimizer
    // regression (or an operator rewrite that blocks the rule, e.g. a
    // projection between the filter and the window) fails loudly.
    val df = Seq(("a", 1L, 50L), ("a", 2L, 90L), ("b", 3L, 10L))
      .toDF("source", "doc_id", "quality")
    val plan = Curation.capPerKey(df, Seq("source"), 2,
        Seq($"quality".desc, $"doc_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("exactSamplePerStratum plan keeps the rank-limit pushdown") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L))
      .toDF("src", "id")
    val plan = Curation.exactSamplePerStratum(df, "src", 1, Seq("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("importanceWeights rank target-like raw docs above off-domain") {
    val medical = Seq("patient dose trial clinical symptom therapy",
      "dose trial outcome patient clinical remission therapy",
      "clinical patient symptom dose therapy trial screening")
    val code = Seq("compile linker segfault pointer mutex thread heap",
      "pointer heap mutex compile segfault linker stack thread")
    val target = medical.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val raw = Seq(
      (10L, "trial dose patient clinical therapy symptom remission"),
      (11L, "segfault mutex pointer linker compile thread heap stack"),
      (12L, "weather tomorrow sunny rain forecast breeze cloud"))
      .toDF("doc_id", "text")
    val w = Curation.importanceWeights(raw, target, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    // n_feats = unigrams + bigrams = 2*len - 1
    assert(w(10L)._1 == 13 && w(11L)._1 == 15)
    // the in-domain doc must out-weigh both off-domain docs
    assert(w(10L)._2 > w(11L)._2 && w(10L)._2 > w(12L)._2,
      s"weights: $w")
    // deterministic under repartitioning
    val w2 = Curation.importanceWeights(raw.repartition(5),
        target.repartition(3), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w.map { case (k, v) => k -> v._2 } == w2)
    val _ = code // anchors the off-domain vocabulary used above
  }

  test("importanceWeights: xxhash production default == md5-portable " +
      "bucketer (weights and ranking)") {
    // q110 gates the md5-PORTABLE bucketer (the one DuckDB can
    // replay); production runs the 2.5x-cheaper xxhash64 default.
    // With per-feature bucket counts, the add-one log-ratio of a
    // bucket depends only on its counts, not its index — so absent
    // collisions the two bucketers produce IDENTICAL weight_micro.
    // This planted corpus has ~80 distinct features; at 4096 buckets
    // the xxhash assignment DOES collide (measured: docs 10/11 shift
    // by the same 405466 micros), so the exact check runs at 65536
    // buckets where both assignments are collision-free, and the
    // induced ranking is asserted independently so a future fixture
    // edit that introduces a collision still has to preserve the
    // ordering evidence.
    val target = Seq(
      (0L, "patient dose trial clinical symptom therapy"),
      (1L, "dose trial outcome patient clinical remission therapy"),
      (2L, "clinical patient symptom dose therapy trial screening"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (10L, "trial dose patient clinical therapy symptom remission"),
      (11L, "patient trial dose outcome screening clinical"),
      (12L, "segfault mutex pointer linker compile thread heap stack"),
      (13L, "weather tomorrow sunny rain forecast breeze cloud"))
      .toDF("doc_id", "text")
    // 4 hex chars = 0..65535 (the q110 gate's 3-hex form at its 4096)
    val md5Portable = (f: Column, b: Int) =>
      conv(substring(md5(f), 1, 4), 16, 10).cast("int")
    def weights(bucketOf: (Column, Int) => Column) =
      Curation.importanceWeights(raw, target, "text", "doc_id",
          buckets = 65536, bucketOf = bucketOf)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    val prod = weights((f, b) =>
      pmod(xxhash64(f), lit(b)).cast("int"))
    val port = weights(md5Portable)
    assert(prod == port, s"prod=$prod port=$port")
    // ranking evidence in its own right: in-domain docs above every
    // off-domain doc under BOTH bucketers
    for (w <- Seq(prod, port); in <- Seq(10L, 11L); out <- Seq(12L, 13L))
      assert(w(in)._2 > w(out)._2, s"doc $in !> doc $out in $w")
  }

  test("weightedSample prefers heavy rows, exact n, deterministic") {
    // 20 light rows (log-weight 0) + 5 heavy rows (log-ratio ln(20)
    // in micros): across seeds, heavies appear far above their 20%
    // head-count share
    val df = ((0L until 20L).map(i => (i, 0L)) ++
      (100L until 105L).map(i => (i, math.round(math.log(20.0) * 1e6))))
      .toDF("doc_id", "weight_micro")
    val heavyRates = (1L to 30L).map { seed =>
      val got = Curation.weightedSample(df, "weight_micro",
        Seq("doc_id"), n = 5, seed = seed)
        .select($"doc_id").as[Long].collect()
      assert(got.length == 5 && got.distinct.length == 5)
      got.count(_ >= 100L)
    }
    // E[heavies] ≈ 5 * (5*20)/(5*20+20) ≈ 4.2 of 5; demand > 3 on avg
    assert(heavyRates.sum > 3 * 30, s"heavy picks: ${heavyRates.sum}")
    // deterministic under repartitioning at fixed seed
    val a = Curation.weightedSample(df, "weight_micro", Seq("doc_id"),
      5, 7L).select($"doc_id").as[Long].collect().sorted
    val b = Curation.weightedSample(df.repartition(7), "weight_micro",
      Seq("doc_id"), 5, 7L).select($"doc_id").as[Long].collect().sorted
    assert(a.toSeq == b.toSeq)
  }

  test("quantileBuckets: exact tercile cuts, ties share a bucket, " +
      "hierarchical cumsum matches the naive single-window plan") {
    // stratum A: scores 1..9 -> terciles {1,2,3}/{4,5,6}/{7,8,9};
    // stratum B: a tie block straddling the 1/3 cut must land whole
    val rows = (1 to 9).map(i => ("A", i.toLong)) ++
      Seq(("B", 1L), ("B", 5L), ("B", 5L), ("B", 5L), ("B", 9L),
        ("B", 9L))
    val df = rows.toDF("s", "score")
    val got = Curation.quantileBuckets(df, "score", Seq("s"),
        Seq(1.0 / 3, 2.0 / 3), Seq("head", "middle", "tail"))
      .select($"s", $"score", $"bucket")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(2))
      .toMap
    assert((1 to 3).forall(i => got(("A", i.toLong)) == "head"))
    assert((4 to 6).forall(i => got(("A", i.toLong)) == "middle"))
    assert((7 to 9).forall(i => got(("A", i.toLong)) == "tail"))
    // B: tot=6, cuts at 2 and 4. cum(1)=1 head; cum(5)=4 -> the whole
    // tie block is middle (<= 2/3*6); cum(9)=6 tail
    assert(got(("B", 1L)) == "head" && got(("B", 5L)) == "middle" &&
      got(("B", 9L)) == "tail")
    // random data: hierarchical prefix sum == naive per-stratum window,
    // including negative scores across bin boundaries (binShift 2 ->
    // many bins exercised), invariant under partitioning
    val rnd = new scala.util.Random(7)
    val big = (1 to 400).map(i =>
      (s"s${i % 3}", (rnd.nextInt(200) - 100).toLong))
      .toDF("s", "score")
    def naive(df0: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      val cum = df0.groupBy($"s", $"score").count()
        .withColumn("cum", sum($"count").over(
          Window.partitionBy($"s").orderBy($"score")))
        .withColumn("tot", sum($"count").over(Window.partitionBy($"s")))
        .select($"s", $"score",
          when($"cum" <= lit(1.0 / 3) * $"tot", "head")
            .when($"cum" <= lit(2.0 / 3) * $"tot", "middle")
            .otherwise("tail").as("bucket"))
      df0.join(cum, Seq("s", "score"))
    }
    def key(df0: org.apache.spark.sql.DataFrame) = df0
      .select($"s", $"score", $"bucket")
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val fast = Curation.quantileBuckets(big, "score", Seq("s"),
      Seq(1.0 / 3, 2.0 / 3), Seq("head", "middle", "tail"), binShift = 2)
    assert(key(fast) == key(naive(big)))
    val fast2 = Curation.quantileBuckets(big.repartition(11), "score",
      Seq("s"), Seq(1.0 / 3, 2.0 / 3), Seq("head", "middle", "tail"),
      binShift = 2)
    assert(key(fast2) == key(naive(big)))
  }

  test("quantileBuckets preserves null-keyed rows with a null bucket") {
    val df = Seq((Some("A"), Some(1L)), (Some("A"), Some(2L)),
      (Some("A"), Some(3L)), (None, Some(9L)), (Some("A"), None))
      .toDF("s", "score")
    val got = Curation.quantileBuckets(df, "score", Seq("s"),
      Seq(1.0 / 3, 2.0 / 3), Seq("head", "middle", "tail"))
    assert(got.count() == 5, "null stratum/score rows must survive")
    assert(got.where($"s".isNull || $"score".isNull)
      .where($"bucket".isNotNull).count() == 0)
    assert(got.where($"bucket".isNotNull).count() == 3)
  }

  test("perplexityBuckets: per-source thirds, head more fluent than tail") {
    val got = Curation.perplexityBuckets(docs, "text", "doc_id",
      Seq("source")).cache()
    val n = got.count()
    assert(n == docs.count()) // every doc has tokens in this corpus
    // per (source, bucket) counts stay within one of a perfect third
    val counts = got.groupBy($"source", $"bucket").count()
      .collect().map(r =>
        (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val perSource = counts.keys.map(_._1).toSeq.distinct
    perSource.foreach { s =>
      val tot = counts.collect { case ((`s`, _), c) => c }.sum
      Seq("head", "middle", "tail").foreach { b =>
        val c = counts.getOrElse((s, b), 0L)
        assert(math.abs(c - tot / 3.0) <= tot / 3.0 * 0.2 + 2,
          s"$s/$b: $c of $tot")
      }
    }
    // fluency ordering: mean bits head < middle < tail, globally
    val m = got.groupBy($"bucket").agg(avg($"bits_micro").as("b"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("head") < m("middle") && m("middle") < m("tail"))
    got.unpersist()
  }

  test("dedupLinesApprox: boilerplate drops, rare lines NEVER drop " +
      "(safe direction), and with ample sketch it equals the exact " +
      "operator") {
    val docs = (0 until 300).map { i =>
      val lines = Seq(s"unique line $i",
        if (i % 2 == 0) "subscribe banner" else s"other ${i % 50}",
        s"tail ${i * 13}")
      (i.toLong, lines.mkString("\n"))
    }.toDF("doc_id", "text")
    val approx = Curation.dedupLinesApprox(docs.repartition(9),
      "text", "doc_id", maxDocs = 10, sketchK = 4096)
    val exact = Curation.dedupLines(docs, "text", "doc_id",
      maxDocs = 10)
    def snap(d: org.apache.spark.sql.DataFrame) = d
      .orderBy($"doc_id")
      .select($"doc_id", $"n_lines", $"n_dropped", $"text")
      .as[(Long, Long, Long, String)].collect().toSeq
    // with a sketch far larger than the distinct-line count, the
    // lower bounds are exact and the two operators agree exactly
    assert(snap(approx) == snap(exact))
    // the banner died everywhere; unique lines all survived
    val kept = snap(approx).map(_._4)
    assert(kept.forall(!_.contains("subscribe banner")))
    assert(kept.zipWithIndex.forall { case (t, i) =>
      t.contains(s"unique line $i")
    })
    // safe direction under a STARVED sketch: nothing below the
    // boilerplate threshold is ever dropped (lower bounds only
    // shrink, so drops can only disappear, never appear)
    val starved = Curation.dedupLinesApprox(docs.repartition(9),
      "text", "doc_id", maxDocs = 10, sketchK = 8)
    val exactDropped = snap(exact).map(r => r._1 -> r._3).toMap
    snap(starved).foreach { case (id, _, dropped, _) =>
      assert(dropped <= exactDropped(id), s"doc $id over-dropped")
    }
  }

  test("dedupLinesApprox guarantee AT the sizing boundary: a banner " +
      "whose df sits exactly at maxDocs + floor(N/(sketchK+1)) is " +
      "dropped — the scaladoc inequality holds with zero slack") {
    // construction: 30 docs x 3 unique lines + a banner in the first
    // 15 -> N = 15*4 + 15*3 = 105 qualifying distinct-per-doc lines;
    // sketchK = 7 gives slack floor(105/8) = 13, so the banner's
    // df = 15 satisfies f - slack = 2 = maxDocs with EQUALITY — the
    // guarantee's worst case, where any off-by-one in the sketch's
    // lower bound (or its cross-partition merge) would let the
    // banner survive
    val f = 15
    val sketchK = 7
    val maxDocs = 2L
    val docs = (0 until 30).map { i =>
      val base = Seq(s"unique alpha $i", s"unique beta $i",
        s"unique gamma $i")
      val lines = if (i < f) base :+ "boundary banner line" else base
      (i.toLong, lines.mkString("\n"))
    }.toDF("doc_id", "text")
    val n = 15 * 4 + 15 * 3
    assert(f - n / (sketchK + 1) == maxDocs) // the edge, exactly
    val got = Curation.dedupLinesApprox(docs.repartition(5), "text",
        "doc_id", maxDocs = maxDocs, sketchK = sketchK)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_dropped", $"text")
      .as[(Long, Long, String)].collect().toSeq
    got.foreach { case (id, dropped, text) =>
      assert(!text.contains("boundary banner line"), s"doc $id")
      assert(dropped == (if (id < f) 1L else 0L), s"doc $id")
      assert(text.contains(s"unique alpha $id"))
    }
  }

  test("chunkBySentences: greedy boundary-respecting packing, " +
      "oversized sentence isolation, no mid-sentence cuts") {
    val df = Seq(
      (1L, "One two three. Four five. Six seven eight nine. Ten."),
      (2L, "A single short one."),
      (3L, "This very first sentence alone has more than six tokens" +
        " inside. Tiny tail."),
      (4L, ""), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Curation.chunkBySentences(df, "text", Seq("doc_id"),
        maxTokens = 6)
      .orderBy($"doc_id", $"chunk_idx")
      .select($"doc_id", $"chunk_idx", $"n_tokens", $"chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    val d1 = got.filter(_._1 == 1L).map(_._4)
    // greedy: [s1(3) + s2(2) = 5] [s3(4) + s4(1) = 5]
    assert(d1 == Seq("One two three. Four five.",
      "Six seven eight nine. Ten."), d1.toString)
    // every chunk ends at a sentence boundary
    assert(d1.forall(_.endsWith(".")))
    assert(got.filter(_._1 == 2L).map(_._4) ==
      Seq("A single short one."))
    // an oversized sentence gets its OWN chunk, untorn
    val d3 = got.filter(_._1 == 3L)
    assert(d3.length == 2 && d3.head._3 > 6 &&
      d3(1)._4 == "Tiny tail.", d3.toString)
    // empty/null docs produce no chunks
    assert(!got.exists(r => r._1 == 4L || r._1 == 5L))
    // reassembly: chunks joined = sentences joined (nothing lost)
    val sents = df.where($"doc_id" === 1L)
      .select(TextAnalysis.sentences($"text")).as[Seq[String]].head()
    assert(d1.mkString(" ") == sents.mkString(" "))
  }

  test("dedupSentences: corpus-wide first-occurrence keeper, " +
      "within-doc repeats, empty docs survive, partition-invariant") {
    val df = Seq(
      (1L, "Alpha beta gamma. Shared legal disclaimer here. Tail one."),
      (2L, "Shared legal disclaimer here. Unique middle two. Tail two."),
      (3L, "Repeat me. Repeat me. Only once though."),
      (4L, ""), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Curation.dedupSentences(d, "text", "doc_id")
        .orderBy($"doc_id")
        .select($"doc_id", $"n_sentences", $"n_dropped", $"text")
        .as[(Long, Long, Long, String)].collect().toSeq
    val got = run(df)
    // doc 1 owns the disclaimer (first occurrence); doc 2 loses it
    assert(got(0) == (1L, 3L, 0L,
      "Alpha beta gamma. Shared legal disclaimer here. Tail one."))
    assert(got(1) == (2L, 3L, 1L,
      "Unique middle two. Tail two."))
    // within-doc repeat: second "Repeat me." drops
    assert(got(2) == (3L, 3L, 1L, "Repeat me. Only once though."))
    // empty/null docs survive as one row with text = ""
    assert(got(3) == (4L, 0L, 0L, ""))
    assert(got(4) == (5L, 0L, 0L, ""))
    // keeper rule is a pure function of the data, not the layout
    assert(run(df.repartition(7)) == got)
    // minSentChars: short sentences are never deduped
    val short = Seq((1L, "Ok. Ok. A longer sentence."),
      (2L, "Ok. A longer sentence."))
      .toDF("doc_id", "text")
    val kept = Curation.dedupSentences(short, "text", "doc_id",
        minSentChars = 5)
      .orderBy($"doc_id").select($"text").as[String].collect().toSeq
    assert(kept == Seq("Ok. Ok. A longer sentence.", "Ok."))
  }

  test("dedupSentencesAgainst: two-step ingest (stored sentenceHashes" +
      " + delta) is EXACTLY the corpus-wide pass on the delta rows") {
    val all = Seq(
      (1L, "Stored opening line here. Shared disclaimer sentence."),
      (2L, "Another stored doc. Shared disclaimer sentence."),
      (3L, "Delta doc one. Shared disclaimer sentence. Fresh claim."),
      (4L, "Delta doc two. Fresh claim. Totally new thing."),
      (5L, "")).toDF("doc_id", "text")
    val batch = Curation.dedupSentences(all, "text", "doc_id")
      .where($"doc_id" >= 3).orderBy($"doc_id")
      .select($"doc_id", $"n_sentences", $"n_dropped", $"text")
      .as[(Long, Long, Long, String)].collect().toSeq
    val stored = Curation.sentenceHashes(
      all.where($"doc_id" < 3), "text", "doc_id")
    // stored artifact shape: one row per (doc, position) with hash
    assert(stored.columns.toSeq ==
      Seq("doc_id", "sent_idx", "sent_chars", "sent_hash"))
    assert(stored.count() == 4)
    val delta = Curation.dedupSentencesAgainst(
        all.where($"doc_id" >= 3), stored, "text", "doc_id")
      .orderBy($"doc_id")
      .select($"doc_id", $"n_sentences", $"n_dropped", $"text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(delta == batch, s"delta=$delta batch=$batch")
    // the known disclaimer died; delta-internal first-wins applied
    assert(delta.head == (3L, 3L, 1L, "Delta doc one. Fresh claim."))
    assert(delta(1) == (4L, 3L, 1L, "Delta doc two. Totally new thing."))
    assert(delta(2) == (5L, 0L, 0L, ""))
  }

  test("perplexityBucketsKn: KN-bigram bits drive the thirds; docs " +
      "too short for a bigram get NO bucket (kept by callers)") {
    val withShort = docs.select($"doc_id", $"source", $"text")
      .unionByName(Seq((90001L, "srcX", "solitary"),
        (90002L, "srcX", "word")).toDF("doc_id", "source", "text"))
    val got = Curation.perplexityBucketsKn(withShort, "text",
      "doc_id", Seq("source")).cache()
    // single-token docs carry no bigram evidence: bucket null
    val shorts = got.where($"doc_id" >= 90001L)
      .select($"bucket").collect().map(_.isNullAt(0))
    assert(shorts.length == 2 && shorts.forall(identity))
    // scored docs: buckets equal composing the pieces by hand
    val bits = Curation.knBigramLogProb(
        docs.select($"doc_id", $"text"), "text", "doc_id")
      .where($"n_pairs" > 0)
      .select($"doc_id", round(-$"logprob_micro".cast("double") /
        $"n_pairs").cast("long").as("bits_micro"))
    val manual = Curation.quantileBuckets(
      docs.select($"doc_id", $"source").join(bits, "doc_id"),
      "bits_micro", Seq("source"), Seq(1.0 / 3, 2.0 / 3),
      Seq("head", "middle", "tail"))
    val a = got.where($"bucket".isNotNull)
      .select($"doc_id", $"bucket").as[(Long, String)]
      .collect().toMap
    val b = manual.select($"doc_id", $"bucket").as[(Long, String)]
      .collect().toMap
    assert(a == b && a.nonEmpty)
    // fluency ordering still holds under the bigram LM
    val m = got.where($"bucket".isNotNull).groupBy($"bucket")
      .agg(avg($"bits_micro").as("b"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("head") < m("middle") && m("middle") < m("tail"))
    got.unpersist()
  }

  test("temperatureMixture: alpha=1 is the natural mixture, small " +
      "alpha boosts rare strata, shares sum to 1") {
    val df = (Seq.fill(90)("big") ++ Seq.fill(10)("small"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    val nat = Curation.temperatureMixture(df, "s", alpha = 1.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // alpha = 1: p_alpha == p_raw, boost == 1 (micros)
    nat.values.foreach { case (praw, palpha, boost) =>
      assert(praw == palpha && boost == 1000000L)
    }
    val t = Curation.temperatureMixture(df, "s", alpha = 0.3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(t("small")._3 > 1000000L, "rare stratum must up-boost")
    assert(t("big")._3 < 1000000L, "dominant stratum must down-boost")
    // normalized shares sum to ~1e6 in micros (rounding slack)
    assert(math.abs(t.values.map(_._2).sum - 1000000L) <= 2)
  }

  test("contaminationReport: graded fraction consistent with " +
      "decontaminate's boolean flag") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated text about spark catalyst engines"),
      (3L, "the quick brown fox jumps over entirely different words"))
      .toDF("doc_id", "text")
    val probes = Seq(
      (100L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val rep = Curation.contaminationReport(corpus, probes, "text",
        "doc_id", k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1 IS a probe: every gram shared -> fraction exactly 1e6
    assert(rep(1L) == ((6L, 6L, 1000000L)))
    // doc 2 shares nothing
    assert(rep(2L)._2 == 0L && rep(2L)._3 == 0L)
    // doc 3 shares a proper prefix: strictly between
    assert(rep(3L)._2 > 0L && rep(3L)._3 > 0L && rep(3L)._3 < 1000000L)
    // graded report agrees with the boolean operator
    val flags = Curation.decontaminate(corpus, probes, "text",
        "doc_id", k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    rep.foreach { case (id, (_, shared, _)) =>
      assert((shared > 0) == (flags(id) == 1L))
    }
  }

  test("fitPlaneMicro recovers a planted plane exactly and is " +
      "partitioning-invariant; distillScore zeroes its residuals") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 300).map { i =>
      val x1 = rnd.nextInt(1000).toLong
      val x2 = rnd.nextInt(500).toLong
      (i.toLong, x1, x2, 3000000L + 2L * x1 - 7L * x2)
    }
    val df = rows.toDF("id", "x1", "x2", "y")
    val (b0, b1, b2) =
      graft.stats.Fitting.fitPlaneMicro(df, "x1", "x2", "y")
    assert(math.abs(b0 - 3000000.0) < 1e-3 &&
      math.abs(b1 - 2.0) < 1e-9 && math.abs(b2 + 7.0) < 1e-9,
      s"got ($b0, $b1, $b2)")
    val again =
      graft.stats.Fitting.fitPlaneMicro(df.repartition(13), "x1", "x2", "y")
    assert((b0, b1, b2) == again, "exact sums must kill order effects")
    val (w, scored) = Curation.distillScore(df, "id", "x1", "x2", "y")
    assert(w == ((b0, b1, b2)))
    assert(scored.where($"resid_micro" =!= 0L).count() == 0,
      "a perfectly planar y must leave zero residual micros")
    // collinear features fail loudly instead of emitting NaN weights
    val bad = rows.map { case (i, x1, _, y) => (i, x1, 2L * x1, y) }
      .toDF("id", "x1", "x2", "y")
    intercept[IllegalArgumentException] {
      graft.stats.Fitting.fitPlaneMicro(bad, "x1", "x2", "y")
    }
  }

  test("knBigramLogProb: hand-computed Kneser-Ney on a two-context " +
      "toy corpus") {
    // corpus pairs: (a b) x2, (a c) x1, (b a) x1  ->
    // bigram counts: ab=2, ac=1, ba=1; B=3; n1=2, n2=1 -> D=2/4=0.5
    // ctx a: cv=3, n1v=2; ctx b: cv=1, n1v=1
    // cont: a follows 1 distinct ctx, b follows 1, c follows 1
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "b a"))
      .toDF("doc_id", "text")
    val got = Curation.knBigramLogProb(df, "text", "doc_id")
      .orderBy($"doc_id")
      .select($"doc_id", $"n_pairs", $"logprob_micro")
      .as[(Long, Long, Long)].collect().toSeq
    val d = 0.5; val b = 3.0
    def p(c2: Double, cv: Double, n1v: Double, n1w: Double) =
      (math.max(c2 - d, 0.0) + d * n1v * (n1w / b)) / cv
    def micro(x: Double) =
      math.round(math.log(x) / math.log(2.0) * 1e6)
    assert(got(0) == ((1L, 1L, micro(p(2, 3, 2, 1)))))
    assert((got(1)._2, got(1)._3) == ((got(0)._2, got(0)._3)))
    assert(got(2) == ((3L, 1L, micro(p(1, 3, 2, 1)))))
    assert(got(3) == ((4L, 1L, micro(p(1, 1, 1, 1)))))
    // discounted mass flows to high-continuation words: within the
    // same context, the count-2 bigram outscores the count-1
    assert(got(0)._3 > got(2)._3)
  }

  test("knBigramLogProb is invariant under partitioning and " +
      "tolerates empty/null docs") {
    val df = Seq((1L, "x y z x y"), (2L, "y z y z"), (3L, null),
      (4L, "solo")).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Curation.knBigramLogProb(d, "text", "doc_id")
        .orderBy($"doc_id")
        .select($"doc_id", $"n_pairs", $"logprob_micro")
        .as[(Long, Long, Long)].collect().toSeq
    val a = run(df)
    assert(a == run(df.repartition(7)))
    assert(a.find(_._1 == 3L).get._2 == 0L) // null text: zero pairs
    assert(a.find(_._1 == 4L).get._2 == 0L) // one-token doc
  }

  test("knTrigramLogProb matches an independent reimplementation " +
      "and is partitioning-invariant") {
    val df = Seq((1L, "a b c a b d"), (2L, "a b c c"),
      (3L, "b c a b c"), (4L, "x y"), (5L, null))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Curation.knTrigramLogProb(d, "text", "doc_id")
        .orderBy($"doc_id")
        .select($"doc_id", $"n_triples", $"logprob_micro")
        .as[(Long, Long, Long)].collect().toSeq
    val got = run(df)
    assert(got == run(df.repartition(9)))
    assert(got.find(_._1 == 4L).get._2 == 0L) // too short for triples
    assert(got.find(_._1 == 5L).get._2 == 0L)

    // independent reimplementation straight from count maps
    val docs = Seq(1L -> "a b c a b d", 2L -> "a b c c",
      3L -> "b c a b c")
    val triples = docs.flatMap { case (id, t) =>
      t.split(" ").sliding(3).map(s => (id, s(0), s(1), s(2)))
    }
    val c3 = triples.groupBy(x => (x._2, x._3, x._4))
      .view.mapValues(_.size.toDouble).toMap
    val cuv = c3.groupBy(k => (k._1._1, k._1._2))
      .view.mapValues(_.values.sum).toMap
    val n1uv = c3.keys.groupBy(k => (k._1, k._2))
      .view.mapValues(_.size.toDouble).toMap
    val chat = c3.keys.groupBy(k => (k._2, k._3))
      .view.mapValues(_.size.toDouble).toMap
    val chv = chat.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val n1cv = chat.keys.groupBy(_._1).view
      .mapValues(_.size.toDouble).toMap
    val n1cw = chat.keys.groupBy(_._2).view
      .mapValues(_.size.toDouble).toMap
    val bhat = chat.size.toDouble
    def disc(counts: Iterable[Double]) = {
      val n1 = counts.count(_ == 1.0); val n2 = counts.count(_ == 2.0)
      if (n1 + 2 * n2 == 0) 0.5 else n1.toDouble / (n1 + 2 * n2)
    }
    val d3 = disc(c3.values); val d2 = disc(chat.values)
    def p3(u: String, v: String, w: String): Double = {
      val p2 = (math.max(chat((v, w)) - d2, 0.0) +
        d2 * n1cv(v) * (n1cw(w) / bhat)) / chv(v)
      (math.max(c3((u, v, w)) - d3, 0.0) + d3 * n1uv((u, v)) * p2) /
        cuv((u, v))
    }
    def micro(x: Double) =
      math.round(math.log(x) / math.log(2.0) * 1e6)
    val wantDoc1 = Seq(("a","b","c"), ("b","c","a"), ("c","a","b"),
      ("a","b","d")).map(t => micro(p3(t._1, t._2, t._3))).sum
    assert(got.find(_._1 == 1L).get._3 == wantDoc1)
    assert(got.find(_._1 == 1L).get._2 == 4L)
  }

  test("dedupParagraphs plan: no window, keeper groupBy map-side " +
      "combines") {
    val df = Seq((1L, "a\n\nb"), (2L, "b\n\nc"))
      .toDF("doc_id", "text")
    val plan = Curation.dedupParagraphs(df, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_min") || plan.contains("partial"),
      plan)
  }

  test("dedupParagraphs keeps the corpus-wide first occurrence only") {
    val df = Seq(
      (1L, "intro one\n\nTHE VIRAL QUOTE\n\nclosing one"),
      (2L, "THE VIRAL QUOTE\n\nintro two\n\n  THE VIRAL QUOTE  "),
      (3L, "intro three\n\nTHE VIRAL QUOTE"),
      (4L, "all original\n\nnothing shared"))
      .toDF("doc_id", "text")
    val r = Curation.dedupParagraphs(df, "text", "doc_id")
      .orderBy($"doc_id").collect()
    // first occurrence = (doc 1, idx 1); every later copy dies,
    // including the whitespace-padded one (hash is over trim)
    assert(r.map(_.getLong(2)).toSeq == Seq(0L, 2L, 1L, 0L))
    assert(r(0).getString(3) ==
      "intro one\n\nTHE VIRAL QUOTE\n\nclosing one")
    assert(r(1).getString(3) == "intro two")
    assert(r(2).getString(3) == "intro three")
    assert(r(3).getString(3) == "all original\n\nnothing shared")
    assert(r.map(_.getLong(1)).toSeq == Seq(3L, 3L, 2L, 2L))
    // result is partitioning-independent (first-wins is (id, idx)
    // order, not encounter order)
    val again = Curation.dedupParagraphs(df.repartition(7), "text",
      "doc_id").orderBy($"doc_id").collect()
    assert(r.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // short/empty paragraphs are structure, not content: never deduped
    val blanky = Seq((1L, "a\n\n\n\nb"), (2L, "c\n\n\n\nd"))
      .toDF("doc_id", "text")
    val rb = Curation.dedupParagraphs(blanky, "text", "doc_id",
      minParaChars = 2).agg(sum($"n_dropped")).head().getLong(0)
    assert(rb == 0L)
    // null-text docs keep their row
    val withNull = Seq((1L, "aa\n\nbb"), (2L, null), (3L, "aa\n\ncc"))
      .toDF("doc_id", "text")
    val rn = Curation.dedupParagraphs(withNull, "text", "doc_id")
      .orderBy($"doc_id").collect()
    assert(rn.length == 3 && rn(1).getString(3) == "")
    assert(rn(2).getString(3) == "cc")
  }

  test("dedupParagraphsAgainst: stored corpus wins, then delta " +
      "first-wins — ingest order invariant") {
    val corpus = Seq(
      (1L, "old news paragraph\n\nshared history"),
      (2L, "other old content"))
      .toDF("doc_id", "text")
    val stored = Curation.paragraphHashes(corpus, "text", "doc_id")
    assert(stored.columns.toSeq ==
      Seq("doc_id", "para_idx", "para_chars", "para_hash"))
    assert(stored.count() == 3)
    val delta = Seq(
      (10L, "fresh take\n\nold news paragraph\n\nnew quote"),
      (11L, "new quote\n\nanother fresh one"))
      .toDF("doc_id", "text")
    val r = Curation.dedupParagraphsAgainst(delta, stored, "text",
      "doc_id").orderBy($"doc_id").collect()
    // doc 10 loses the corpus-known paragraph; doc 11 loses "new
    // quote" to doc 10's earlier copy (delta-internal first-wins)
    assert(r(0).getString(3) == "fresh take\n\nnew quote")
    assert(r(1).getString(3) == "another fresh one")
    assert(r.map(_.getLong(2)).toSeq == Seq(1L, 1L))
    // equivalence with the batch operator: dedup(corpus ++ delta)
    // restricted to delta ids gives the SAME surviving text — ingest
    // in two steps ≡ one corpus-wide pass
    val whole = Curation.dedupParagraphs(corpus.unionByName(delta),
        "text", "doc_id")
      .where($"doc_id" >= 10L).orderBy($"doc_id").collect()
    assert(whole.map(_.getString(3)).toSeq ==
      r.map(_.getString(3)).toSeq)
  }

  test("paragraphBloom flags every stored paragraph (no false " +
      "negatives), fpp-bounded false positives") {
    val corpus = spark.range(0, 2000)
      .selectExpr("id AS doc_id",
        "concat('stored para ', id, '\n\nstored tail ', id) AS text")
    val stored = Curation.paragraphHashes(corpus, "text", "doc_id")
    val bloom = Curation.paragraphBloom(stored, expectedItems = 4000,
      fpp = 0.01)
    // every stored paragraph must flag — the dedup guarantee
    val self = Curation.flagMaybeKnownParagraphs(corpus, "text",
      "doc_id", bloom)
    assert(self.where(!$"maybe_known").count() == 0)
    // fresh paragraphs flag at ~fpp, not en masse
    val fresh = spark.range(0, 2000)
      .selectExpr("id AS doc_id",
        "concat('brand new para ', id) AS text")
    val fp = Curation.flagMaybeKnownParagraphs(fresh, "text",
      "doc_id", bloom).where($"maybe_known").count()
    assert(fp <= 2000 * 0.05, s"false-positive count $fp")
    // sub-minParaChars paragraphs never flag
    val tiny = Seq((1L, "a\n\nstored para 7")).toDF("doc_id", "text")
    val ft = Curation.flagMaybeKnownParagraphs(tiny, "text", "doc_id",
      bloom, minParaChars = 2).orderBy($"para_idx").collect()
    assert(!ft(0).getBoolean(4) && ft(1).getBoolean(4))
  }

  test("sharded Bloom: same no-false-negative guarantee as the " +
      "monolith; incremental per-batch sub-filters merge to the " +
      "rebuild's filters bit-for-bit") {
    val shards = 8
    val corpus = spark.range(0, 2000)
      .selectExpr("id AS doc_id",
        "concat('stored para ', id, '\n\nstored tail ', id) AS text")
    val stored = Curation.paragraphHashes(corpus, "text", "doc_id")
    val table = Curation.paragraphBloomShards(stored, shards,
      expectedItems = 4000, fpp = 0.01).cache()
    assert(table.count() == shards)
    // no false negatives through the sharded probe path
    val self = Curation.flagMaybeKnownParagraphsSharded(corpus,
      "text", "doc_id", table, shards)
    assert(self.where(!$"maybe_known").count() == 0)
    // fresh paragraphs flag at ~fpp
    val fresh = spark.range(0, 2000)
      .selectExpr("id AS doc_id",
        "concat('brand new para ', id) AS text")
    val fp = Curation.flagMaybeKnownParagraphsSharded(fresh, "text",
      "doc_id", table, shards).where($"maybe_known").count()
    assert(fp <= 2000 * 0.05, s"false-positive count $fp")
    // GROWING index: two half-corpus sub-filter tables merged per
    // shard ≡ the monolithic rebuild, byte for byte
    val half1 = Curation.paragraphBloomShards(
      stored.where($"doc_id" < 1000), shards, 4000, 0.01)
    val half2 = Curation.paragraphBloomShards(
      stored.where($"doc_id" >= 1000), shards, 4000, 0.01)
    val merged = Curation.mergeBloomShards(half1.unionByName(half2))
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1))
      .toMap
    val whole = table.collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(merged.keySet == whole.keySet)
    whole.foreach { case (s, bytes) =>
      assert(java.util.Arrays.equals(merged(s), bytes), s"shard $s")
    }
    // probing the UNMERGED multi-row-per-shard table directly (the
    // per-batch layout the streaming store persists) must ALSO flag
    // everything — every sub-filter of a shard participates, not just
    // the first row the task happens to see
    val unmergedProbe = Curation.flagMaybeKnownParagraphsSharded(
      corpus, "text", "doc_id", half1.unionByName(half2), shards)
    assert(unmergedProbe.where(!$"maybe_known").count() == 0)
    table.unpersist()
  }

  test("dedup ladder rebuild is plan-independent: forcing the " +
      "drop-index join-back off the broadcast path (the " +
      "every-doc-affected degraded regime) changes no value") {
    val docs = (0L until 60L).map(i =>
      (i, s"unique line $i alpha\nSHARED FOOTER\nunique line $i omega"))
      .toDF("doc_id", "text")
    def runAll() = (
      Curation.dedupLines(docs, "text", "doc_id", maxDocs = 10)
        .orderBy($"doc_id").collect().toSeq,
      Curation.dedupParagraphs(docs, "text", "doc_id", sep = "\n")
        .orderBy($"doc_id").collect().toSeq,
      Curation.dedupSentences(docs, "text", "doc_id")
        .orderBy($"doc_id").collect().toSeq)
    val broadcastPath = runAll()
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try assert(runAll() == broadcastPath)
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      threshold)
  }

  test("flagMaybeKnownHashes: no false negatives through the sharded " +
      "probe, multi-row shards OR-merge, empty shards flag nothing") {
    val shards = 8
    val stored = (0L until 3000L).map(i => i * 2654435761L)
      .toDF("sent_hash")
    val blooms = Curation.sentenceBloomShards(stored, shards,
      expectedItems = 4000)
    // every stored hash must flag as maybe-known (per-shard Bloom
    // no-false-negative guarantee, hash-level probe)
    val storedProbe = Curation.flagMaybeKnownHashes(stored,
      "sent_hash", blooms, shards)
    assert(storedProbe.where(!$"maybe_known").count() == 0)
    // the UNMERGED multi-row-per-shard layout (two half-corpus
    // sub-filter tables, the per-batch store format) must also catch
    // everything — every sub-filter participates in the task-side
    // OR-merge
    val half1 = Curation.sentenceBloomShards(
      stored.where($"sent_hash" % 2 === 0), shards, 4000)
    val half2 = Curation.sentenceBloomShards(
      stored.where($"sent_hash" % 2 =!= 0), shards, 4000)
    val unmerged = Curation.flagMaybeKnownHashes(stored, "sent_hash",
      half1.unionByName(half2), shards)
    assert(unmerged.where(!$"maybe_known").count() == 0)
    // novel hashes are mostly unflagged (fpp-bounded, generous cap)
    val novel = (1L to 3000L).map(i => i * 40503L + 7L)
      .toDF("sent_hash")
    val fp = Curation.flagMaybeKnownHashes(novel, "sent_hash", blooms,
      shards).where($"maybe_known").count()
    assert(fp < 300, s"false positives $fp out of 3000")
    // a shard with NO filter rows flags nothing: probe against a
    // filter table missing some shards entirely
    val partial = blooms.where($"shard" < 2)
    val partialProbe = Curation.flagMaybeKnownHashes(stored,
      "sent_hash", partial, shards)
    assert(partialProbe
      .where(pmod($"sent_hash", lit(shards)) >= 2 && $"maybe_known")
      .count() == 0)
  }

  test("dedupParagraphsAgainstSharded equals the exact join form — " +
      "no false negatives through the bloom front, under minParaChars " +
      "and a SATURATED filter alike") {
    val corpus = (0 until 40).map { i =>
      (i.toLong, s"stored unique paragraph $i\n\nshared banner " +
        s"paragraph ${i % 5}\n\nxx")
    }.toDF("doc_id", "text")
    // delta: some docs repeat stored paragraphs, some repeat within
    // the delta, some are fresh; the "xx" short paragraph sits under
    // minParaChars and must never dedup
    val delta = Seq(
      (100L, "shared banner paragraph 2\n\nfresh delta thought\n\nxx"),
      (101L, "fresh delta thought\n\nanother fresh one"),
      (102L, "stored unique paragraph 7\n\nxx\n\nclosing fresh line"))
      .toDF("doc_id", "text")
    val minChars = 3
    val stored = Curation.paragraphHashes(corpus, "text", "doc_id")
    def run(expectedItems: Long) = {
      val blooms = Curation.paragraphBloomShards(
        stored.where($"para_chars" >= minChars), shards = 4,
        expectedItems = expectedItems)
      Curation.dedupParagraphsAgainstSharded(delta, stored, blooms,
          4, "text", "doc_id", minParaChars = minChars)
        .orderBy($"doc_id")
        .select($"doc_id", $"n_paras", $"n_dropped", $"text")
        .as[(Long, Long, Long, String)].collect().toSeq
    }
    val exact = Curation.dedupParagraphsAgainst(delta, stored,
        "text", "doc_id", minParaChars = minChars)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_paras", $"n_dropped", $"text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(run(256L) == exact)      // well-sized filters
    assert(run(4L) == exact)        // saturated: all MAYBEs, confirm
                                    // still exact
    // sanity on the content itself
    assert(exact.find(_._1 == 100L).get._4 ==
      "fresh delta thought\n\nxx")
    assert(exact.find(_._1 == 101L).get._4 == "another fresh one")
    // OVER-CAP regime: lower the probe-collect ceiling so the
    // whole-backlog-first-batch guard fires — every path degrades to
    // its distributed predecessor topology (co-grouped bloom probe,
    // shuffle semi-join confirm) and the OUTPUT must not change
    val prevCap = Curation.MaxProbeCollect
    Curation.MaxProbeCollect = 2
    try assert(run(256L) == exact)
    finally Curation.MaxProbeCollect = prevCap
  }

  test("over-cap probe sets degrade to the distributed topologies: " +
      "no false negatives, an fpp-bounded flag SUPERSET, and exact " +
      "fetches unchanged (the un-rate-limited first-batch guard)") {
    val shards = 8
    val stored = (0L until 2000L).map(i => i * 2654435761L)
      .toDF("sent_hash")
    // MULTI-row sub-filter layout (the between-compactions store
    // format) on purpose: the distributed fallback OR-MERGES a
    // shard's rows before probing, and the bit-union can flag a hash
    // no single sub-filter held (its k positions split across rows) —
    // so across the cap boundary the raw flags are a SUPERSET, never
    // equal in general; what IS preserved is the no-false-negative
    // guarantee (and dedup output, via the exact confirm — the
    // lowered-cap run in the sharded≡exact test above pins that)
    val blooms = Curation.sentenceBloomShards(
        stored.where($"sent_hash" % 2 === 0), shards, 4000)
      .unionByName(Curation.sentenceBloomShards(
        stored.where($"sent_hash" % 2 =!= 0), shards, 4000))
    // mixed probe: all stored hashes + novel ones
    val probe = stored.unionByName(
      (1L to 500L).map(i => i * 40503L + 7L).toDF("sent_hash"))
    def maybes() = Curation
      .flagMaybeKnownHashes(probe, "sent_hash", blooms, shards)
      .where($"maybe_known").select($"sent_hash")
      .as[Long].collect().toSet
    val inCap = maybes()
    val prevCap = Curation.MaxProbeCollect
    Curation.MaxProbeCollect = 10 // force the cogroup fallback
    val overCap = try {
      val oc = maybes()
      // fetchByKeys over the cap: shuffle semi-join, same EXACT rows
      // (no bloom in that path — membership is precise)
      val keys = (0L until 100L).map(i => i * 2654435761L)
        .toDF("sent_hash")
      val fetched = Curation.fetchByKeys(stored, "sent_hash", keys)
        .orderBy($"sent_hash").as[Long].collect().toSeq
      assert(fetched == keys.orderBy($"sent_hash")
        .as[Long].collect().toSeq)
      oc
    } finally Curation.MaxProbeCollect = prevCap
    val storedSet = stored.as[Long].collect().toSet
    // no false negatives in EITHER regime
    assert(storedSet.subsetOf(inCap))
    assert(storedSet.subsetOf(overCap))
    // the fallback's flags contain the scan-probe's (fpp-bounded
    // superset — never a lost maybe)
    assert(inCap.subsetOf(overCap))
    val extraFps = overCap.size - inCap.size
    assert(extraFps < 100, s"merged-filter extra FPs $extraFps")
  }

  test("dedup ladder never shuffles corpus text: measured shuffle " +
      "bytes are a small fraction of the (incompressible) text bytes") {
    // ~200 docs x ~10 KB of md5-hex text (shuffle compression can't
    // hide a text column that crosses an exchange) + one shared
    // boilerplate unit per doc so every rung actually drops
    // something. Long lines on purpose: the narrow (id, idx, hash)
    // shuffle cost scales with ROWS, text with BYTES — the gap is
    // the property under test.
    val docs = spark.range(200).toDF("doc_id")
      .withColumn("body", concat_ws("\n",
        transform(sequence(lit(0), lit(19)), i => concat_ws(" ",
          transform(sequence(lit(0), lit(15)), j =>
            md5(concat_ws("-", $"doc_id", i, j)))))))
      .select($"doc_id", concat($"body",
        lit("\nShared boilerplate footer sentence here. " +
          "All rights reserved by the syndicate.")).as("text"))
      .localCheckpoint(true) // input materialized OUTSIDE the window
    val textBytes = docs.agg(sum(length($"text"))).head().getLong(0)
    val shuffled = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit = shuffled.addAndGet(
        sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val lines = Curation.dedupLines(docs, "text", "doc_id",
        maxDocs = 10)
      val paras = Curation.dedupParagraphs(docs, "text", "doc_id",
        sep = "\n")
      val sents = Curation.dedupSentences(docs, "text", "doc_id")
      assert(lines.agg(sum($"n_dropped")).head().getLong(0) == 200L)
      assert(paras.agg(sum($"n_dropped")).head().getLong(0) == 199L)
      // each doc segments to 2 sentences: [unique body + glued first
      // footer sentence] and the shared "All rights reserved..." —
      // only the latter dedups (199 later copies die)
      assert(sents.agg(sum($"n_dropped")).head().getLong(0) == 199L)
      // listener events are asynchronous — wait until the counter
      // stops moving before reading it
      var prev = -1L
      var spins = 0
      while (shuffled.get() != prev && spins < 50) {
        prev = shuffled.get(); Thread.sleep(100); spins += 1
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    // three rungs ran; the OLD regroup alone re-shuffled the full
    // text per rung (>= 3x textBytes even compressed). Narrow flags
    // + drop-index arrays + broadcast join-back keep the total far
    // under the corpus text size.
    assert(shuffled.get() < textBytes / 5,
      s"shuffled=${shuffled.get()} textBytes=$textBytes")
  }
}
