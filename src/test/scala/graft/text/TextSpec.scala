package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"), // near dup of 1
    (4L, "el rapido zorro marron salta sobre el perro y la casa"),
    (5L, "der schnelle braune fuchs springt über den faulen hund und die"),
    (6L, "completely different words about spark query engines and joins"),
    (7L, "  THE  Quick   Brown FOX jumps over the lazy dog "))
    .toDF("doc_id", "text")

  test("tokenCount and subwordCount") {
    val r = docs.select($"doc_id", TextAnalysis.tokenCount($"text"))
      .orderBy($"doc_id").collect()
    assert(r(0).getInt(1) == 9)
    assert(r(6).getInt(1) == 9) // multi-space normalized by trim/split
    val sw = Seq((1L, "don't stop-me now")).toDF("doc_id", "text")
      .select(TextAnalysis.subwordCount($"text")).head().getInt(0)
    // don / ' / t / stop / - / me / now
    assert(sw == 7, s"subwords=$sw")
  }

  test("rollingFingerprint survives appends, changes on edits") {
    val base = "the quick brown fox jumps over the lazy dog"
    val df = Seq((1L, base), (2L, base + " tail words appended here"),
      (3L, base.replace("quick", "slow")))
      .toDF("doc_id", "text")
    val fp = df.select($"doc_id",
        TextAnalysis.rollingFingerprint($"text").as("fp"))
      .orderBy($"doc_id").collect().map(_.getLong(1))
    // min-shingle-hash: stable under pure append when the original min
    // survives; an interior edit usually moves it
    assert(fp(0) == fp(1) || fp(1) != fp(2))
    assert(fp(0) != fp(2))
  }

  test("languageId picks the evident language") {
    val r = docs.select($"doc_id", TextAnalysis.languageId($"text"))
      .orderBy($"doc_id").collect().map(_.getString(1))
    assert(r(0) == "en" && r(3) == "es" && r(4) == "de")
    val zh = Seq((8L, "这是一个中文句子")).toDF("doc_id", "text")
      .select(TextAnalysis.languageId($"text")).head().getString(0)
    assert(zh == "zh")
  }

  test("fingerprint is whitespace/case-insensitive") {
    val r = docs.select($"doc_id", TextAnalysis.fingerprint($"text"))
      .orderBy($"doc_id").collect()
    assert(r(0).getLong(1) == r(6).getLong(1)) // doc 7 normalizes to doc 1
    assert(r(0).getLong(1) != r(2).getLong(1))
  }

  test("exact dedup keeps min id per content") {
    val kept = Dedup.exact(docs, "text", "doc_id")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(2L)) // dup of 1
    assert(!kept.contains(7L)) // normalized dup of 1
    assert(kept.contains(1L) && kept.contains(3L) && kept.contains(6L))
  }

  test("minhash LSH finds the near-dup pair and skips unrelated") {
    val pairs = Dedup.minhashCandidates(docs, "text", "doc_id",
      numHashes = 16, bands = 8, minJaccard = 0.3)
      .select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)) || pairs.contains((1L, 2L)),
      s"expected near-dups, got $pairs")
    assert(!pairs.contains((1L, 6L)))
    assert(!pairs.contains((4L, 5L)))
  }

  test("nearDupAgainstCorpus flags delta docs cloned from the corpus") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven"),
      (3L, "red orange yellow green blue indigo violet white black"))
      .toDF("doc_id", "text")
    val delta = Seq(
      // near-clone of corpus doc 2 (one word changed)
      (101L, "one two three four five six seven eight nine ten twelve"),
      // exact clone of corpus doc 3
      (102L, "red orange yellow green blue indigo violet white black"),
      // novel
      (103L, "completely different content with no corpus overlap here"))
      .toDF("doc_id", "text")
    val hits = Dedup.nearDupAgainstCorpus(delta, corpus, "text",
        "doc_id", numHashes = 32, bands = 16, minJaccard = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byDelta = hits.groupBy(_._1)
    assert(byDelta.contains(101L) && byDelta(101L).head._2 == 2L)
    assert(byDelta.contains(102L) && byDelta(102L).head._2 == 3L)
    assert(byDelta(102L).head._3 == 1.0) // exact clone
    assert(!byDelta.contains(103L))
  }

  test("minhash LSH handles a pathological skewed bucket linearly") {
    // 1000 identical docs -> every band bucket holds all 1000 ids; the
    // bucket-size cap routes them through linear star pairs instead of
    // ~500k all-pairs, so this completes fast and still links every doc
    // to the cluster representative (min id 0)
    val many = spark.range(1000)
      .select($"id".as("doc_id"),
        lit("the quick brown fox jumps over the lazy dog").as("text"))
    val t0 = System.nanoTime()
    val pairs = Dedup.minhashCandidates(many, "text", "doc_id",
        numHashes = 128, bands = 16, minJaccard = 0.5,
        maxBucketSize = 200)
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(pairs.length == 999, s"got ${pairs.length} pairs")
    assert(pairs.forall(r => r.getLong(0) == 0L && r.getDouble(2) == 1.0))
    assert(secs < 60.0, s"pathological bucket took ${secs}s")
  }

  test("embeddingNearDups finds planted dups, caps skewed buckets") {
    val rng = new scala.util.Random(11)
    def vec() = Array.fill(16)(rng.nextFloat() * 2 - 1)
    val v0 = vec()
    val near = v0.map(x => x + 0.001f) // cosine ~ 1
    val distinctRows = Seq((0L, v0), (1L, near)) ++
      (2L until 50L).map(i => (i, vec()))
    val pairs = Dedup.embeddingNearDups(
        distinctRows.toDF("vec_id", "embedding"), "embedding", "vec_id",
        minCosine = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)), s"got ${pairs.toSeq}")
    // 2000 identical vectors land in ONE bucket: the cap routes them
    // through linear star pairs (all to representative 0), not ~2M
    // all-pairs
    val clones = spark.range(2000)
      .select($"id".as("vec_id"),
        array((0 until 16).map(i => lit(0.1f * (i + 1))): _*)
          .as("embedding"))
    val t0 = System.nanoTime()
    val star = Dedup.embeddingNearDups(clones, "embedding", "vec_id",
        minCosine = 0.99, maxBucketSize = 100)
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(star.length == 1999, s"got ${star.length}")
    assert(star.forall(r => r.getLong(0) == 0L &&
      math.abs(r.getDouble(2) - 1.0) < 1e-6))
    assert(secs < 60.0, s"skewed embedding bucket took ${secs}s")
  }

  test("FromHashes variants equal the from-text paths exactly") {
    val hashed = Dedup.shingleHashes(docs, "text", "doc_id")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(
      Dedup.nearDupPairsFromHashes(hashed, "doc_id", minJaccard = 0.3)
        .collect().map(key).toSet ==
      Dedup.nearDupPairs(docs, "text", "doc_id", minJaccard = 0.3)
        .collect().map(key).toSet)
    val delta = docs.where($"doc_id" < 3)
    val corpus = docs.where($"doc_id" >= 3)
    assert(
      Dedup.nearDupAgainstCorpusFromHashes(
          hashed.where($"doc_id" < 3), hashed.where($"doc_id" >= 3),
          "doc_id", minJaccard = 0.3)
        .collect().map(key).toSet ==
      Dedup.nearDupAgainstCorpus(delta, corpus, "text", "doc_id",
          minJaccard = 0.3)
        .collect().map(key).toSet)
    // OVERLAPPING delta/corpus filters of one shared table (the
    // advertised stored-artifact shape): a doc on both sides must
    // never match ITSELF at jaccard 1.0 — an ingest gate keying on
    // "has a corpus match" would otherwise drop the whole overlap
    val overlap = Dedup.nearDupAgainstCorpusFromHashes(
        hashed.where($"doc_id" < 3), hashed, "doc_id",
        minJaccard = 0.3)
      .select($"delta_id", $"corpus_id")
      .as[(Long, Long)].collect()
    assert(overlap.nonEmpty &&
      overlap.forall { case (a, b) => a != b }, overlap.toSeq.toString)
  }

  test("SigTable variants equal FromHashes, incl. narrow prefix slices") {
    val hashed = Dedup.shingleHashes(docs, "text", "doc_id")
    val sigs = Dedup.signatureTable(hashed, "doc_id", numHashes = 128)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    // full-width band family off the stored table = fresh table
    assert(
      Dedup.nearDupPairsFromSigTable(sigs, "doc_id", minJaccard = 0.3)
        .collect().map(key).toSet ==
      Dedup.nearDupPairsFromHashes(hashed, "doc_id", minJaccard = 0.3)
        .collect().map(key).toSet)
    // a 32-hash family sliced from the 128 table = a fresh 32 table
    // (remix constants are indexed, not width-dependent)
    assert(
      Dedup.nearDupPairsFromSigTable(sigs, "doc_id", minJaccard = 0.5,
          numHashes = 32)
        .collect().map(key).toSet ==
      Dedup.nearDupPairsFromHashes(hashed, "doc_id", minJaccard = 0.5,
          numHashes = 32)
        .collect().map(key).toSet)
    // delta/corpus sides as filters of ONE shared table (bands pinned
    // to 16 on BOTH sides for the equality; every against-corpus
    // entry point now defaults to minJaccard-driven auto-banding)
    val fixedBands = Dedup.nearDupAgainstCorpusFromSigTables(
        sigs.where($"doc_id" < 3), sigs.where($"doc_id" >= 3),
        "doc_id", bands = 16, minJaccard = 0.3)
      .collect().map(key).toSet
    assert(fixedBands ==
      Dedup.nearDupAgainstCorpusFromHashes(
          hashed.where($"doc_id" < 3), hashed.where($"doc_id" >= 3),
          "doc_id", bands = 16, minJaccard = 0.3)
        .collect().map(key).toSet)
    // the auto-banded default (64 bands of 2 at minJaccard 0.3) can
    // only ADD candidate recall over fixed 16-of-8; verification is
    // exact either way, so its verified pairs are a superset
    val autoBands = Dedup.nearDupAgainstCorpusFromSigTables(
        sigs.where($"doc_id" < 3), sigs.where($"doc_id" >= 3),
        "doc_id", minJaccard = 0.3)
      .collect().map(key).toSet
    assert(fixedBands.subsetOf(autoBands))
    // the table IS a storable artifact: parquet round-trip feeds the
    // same band/verify machinery with identical results (the
    // signatures-at-ingest contract — compute once, store, query)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sigtable").toString + "/sigs"
    sigs.write.parquet(dir)
    val back = spark.read.parquet(dir)
    assert(
      Dedup.nearDupPairsFromSigTable(back, "doc_id", minJaccard = 0.3)
        .collect().map(key).toSet ==
      Dedup.nearDupPairsFromSigTable(sigs, "doc_id", minJaccard = 0.3)
        .collect().map(key).toSet)
  }

  test("nearDupPairs (LSH + exact re-rank) matches all-pairs at j>=0.3") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        minJaccard = 0.3, allPairsUnblocked = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Dedup.nearDupPairs(docs, "text", "doc_id",
        minJaccard = 0.3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(lsh.keySet == exact.keySet,
      s"lsh=${lsh.keySet} exact=${exact.keySet}")
    lsh.foreach { case (k, j) =>
      assert(math.abs(j - exact(k)) < 1e-9, s"pair $k: $j vs ${exact(k)}")
    }
  }

  test("simhash: identical texts equal, near-dups close, unrelated far") {
    val sh = docs.select($"doc_id", Dedup.simhash($"text", 32).as("s"))
      .orderBy($"doc_id").collect().map(_.getLong(1))
    assert(sh(0) == sh(1))
    val near = java.lang.Long.bitCount(sh(0) ^ sh(2))
    val far = java.lang.Long.bitCount(sh(0) ^ sh(5))
    assert(near < far, s"near=$near far=$far")
  }

  test("ngram jaccard pairs rank the true near-dup highest") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      minJaccard = 0.0, allPairsUnblocked = true)
      .orderBy($"jaccard".desc).collect()
    val top = pairs.filter(r => r.getDouble(2) < 1.0).head
    assert(Set(top.getLong(0), top.getLong(1)) == Set(1L, 3L) ||
      Set(top.getLong(0), top.getLong(1)) == Set(3L, 7L))
  }

  test("ngramJaccardPairs refuses a silent unblocked cross join") {
    // empty blockingCols without the opt-in must fail at plan-build
    // time, before any job runs — the ScaleGuard stance
    val e = intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(docs, "text", "doc_id")
    }
    assert(e.getMessage.contains("cross join"))
    // and the opt-in is itself bounded: the row-count cap fires even
    // when the caller asked for all pairs explicitly
    val big = spark.range(Dedup.allPairsMaxRows + 1)
      .select($"id".as("doc_id"), lit("text words here").as("text"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(big, "text", "doc_id",
        allPairsUnblocked = true)
    }
    assert(e2.getMessage.contains("cap"))
  }

  test("simhashNearDups: pigeonhole blocks find all close pairs") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep green forest before sunset " +
      "carrying seven shiny silver spoons through the cold night"
    val df = Seq(
      (1L, base), (2L, base),                       // hamming 0
      (3L, base.replace("seven", "nine")),          // tiny edit
      (4L, "entirely different content about query planners join " +
        "strategies shuffle exchanges and columnar parquet readers"),
      (5L, "unrelated musings regarding alpine meteorology stations " +
        "and hourly disaggregation cascades on gauge records"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(df, "text", "doc_id",
      maxHamming = 3)
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)))
    // exhaustive check: candidates must equal the true <=3 set
    val sigs = df.select($"doc_id",
      Dedup.simhash($"text", 64).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 3
    } yield (a, b)).toSet
    assert(got == truth, s"got $got truth $truth")
    // over-cap buckets degrade to star pairs, stay linear
    val many = Seq.tabulate(300)(i => (i.toLong, base))
      .toDF("doc_id", "text")
    val star = Dedup.simhashNearDups(many, "text", "doc_id",
      maxHamming = 3, maxBucketSize = 50)
    assert(star.count() == 299) // every member linked to the rep
  }

  test("duplicateSpans: interval union, self-repeats, short docs") {
    val df = Seq(
      (1L, "a b c d e f"),            // shares [a b c],[b c d] with doc 2
      (2L, "x y a b c d q"),          // hit positions 3,4
      (3L, "z z z z z z"),            // self-repeating: all grams dup
      (4L, "unique tokens only here now"),
      (5L, "p q"))                    // shorter than n -> no grams
      .toDF("doc_id", "text")
    val r = Dedup.duplicateSpans(df, "text", "doc_id", n = 3)
      .orderBy($"doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // (id, n_dup_grams, covered_tokens, n_tokens)
    assert(r(0) == ((1L, 2L, 4L, 6L)))  // windows [1..3]+[2..4] -> 4
    assert(r(1) == ((2L, 2L, 4L, 7L)))
    assert(r(2) == ((3L, 4L, 6L, 6L)))  // whole doc covered
    assert(r(3) == ((4L, 0L, 0L, 5L)))
    assert(r(4) == ((5L, 0L, 0L, 2L)))
    // dup_frac_micro of the fully-covered doc is exactly 1e6
    val frac = Dedup.duplicateSpans(df, "text", "doc_id", n = 3)
      .where($"doc_id" === 3L).head().getLong(4)
    assert(frac == 1000000L)
    // hash choice changes keys, not span stats: md5 gate twin == default
    val viaMd5 = Dedup.duplicateSpans(df, "text", "doc_id", n = 3,
      gramHash = md5(_)).orderBy($"doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(viaMd5.toSeq == r.toSeq)
    // reserved working columns are guarded
    val clash = df.withColumn("toks__", lit(1))
    intercept[IllegalArgumentException] {
      Dedup.duplicateSpans(clash, "text", "doc_id", n = 3)
    }
  }

  test("normalizeText: punctuation fold, whitespace collapse, " +
      "dedup-robustness of the normalized bytes") {
    val df = Seq(
      (1L, "“Hello” — the caf…  World\t\n"),
      (2L, "\"hello\" -  the caf. world"),
      (3L, "it’s ‘fine’"),
      (4L, "it's 'fine'"))
      .toDF("id", "text")
    val got = df.select($"id",
        TextAnalysis.normalizeText($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "\"hello\" - the caf. world")
    assert(got(1L) == got(2L).replaceAll("\\s+", " "),
      "typographic and ASCII renderings must normalize alike")
    assert(got(3L) == "it's 'fine'" && got(3L) == got(4L))
    // digit folding: dedup-key mode hashes date/counter variants alike
    val dated = Seq((1L, "posted 2024-01-05, 1,234 views"),
      (2L, "posted 1999-12-31, 5,678 views")).toDF("id", "text")
    val folded = dated.select(
        TextAnalysis.normalizeText($"text", foldDigits = true))
      .as[String].collect()
    assert(folded(0) == folded(1) &&
      folded(0) == "posted 0000-00-00, 0,000 views")
  }

  test("sentences: boundaries, abbreviation guards, decimals, " +
      "multi-punct, lowercase continuation, sentinel hardening") {
    def sent(s: String) = Seq(s).toDF("t")
      .select(TextAnalysis.sentences($"t")).as[Seq[String]].head()
    assert(sent("First one. Second one! Third?") ==
      Seq("First one.", "Second one!", "Third?"))
    // abbreviation dots never split; their dot survives in output
    assert(sent("Dr. Smith arrived. Mrs. Lee left.") ==
      Seq("Dr. Smith arrived.", "Mrs. Lee left."))
    assert(sent("Use e.g. apples. Or i.e. fruit.") ==
      Seq("Use e.g. apples.", "Or i.e. fruit."))
    // decimals and no-whitespace dots do not split
    assert(sent("It cost 5.50 total. Cheap.") ==
      Seq("It cost 5.50 total.", "Cheap."))
    assert(sent("version2.Next stays joined") ==
      Seq("version2.Next stays joined"))
    // multi-punct boundary; digit can start a sentence
    assert(sent("Really?! 42 is the answer.") ==
      Seq("Really?!", "42 is the answer."))
    // lowercase after the dot = same sentence (quote/ellipsis style)
    assert(sent("he said. then left") == Seq("he said. then left"))
    // "no."/"st." protect ONLY before a digit: as plain words they
    // end sentences ("She said no.") far more often than they
    // abbreviate ("item no. 3")
    assert(sent("She said no. They left.") ==
      Seq("She said no.", "They left."))
    assert(sent("Next item no. 3 follows. Done.") ==
      Seq("Next item no. 3 follows.", "Done."))
    assert(sent("Meet at St. 5 today. Bye.") ==
      Seq("Meet at St. 5 today.", "Bye."))
    // null/empty → empty; sentinel bytes in input can't forge splits
    assert(sent("") == Seq.empty)
    assert(Seq((1, null.asInstanceOf[String])).toDF("i", "t")
      .select(TextAnalysis.sentences($"t")).as[Seq[String]]
      .head() == Seq.empty)
    assert(sent("fake\u0001split. Real one") ==
      Seq("fakesplit.", "Real one"))
    // count helper
    assert(Seq(("One. Two. Three."))
      .toDF("t").select(TextAnalysis.sentenceCount($"t"))
      .as[Int].head() == 3)
  }

  test("normalizeText nfkc: full-width, ligature, compatibility and " +
      "decomposed renderings fold to one canonical byte sequence") {
    // SentencePiece-parity dedup keys: all five renderings of the
    // same logical text must normalize to IDENTICAL bytes
    val df = Seq(
      (1L, "office ＡＢＣ café No1"), // full-width ABC
      (2L, "o\uFB03ce ABC cafe\u0301 No1"), // ffi ligature, e+U+0301
      (3L, "office ABC café №①"), // №, circled 1
      (4L, "office abc café no1"),
      (5L, "oﬃce ａｂｃ café №①"))
      .toDF("id", "text")
    val got = df.select($"id",
        TextAnalysis.normalizeText($"text", nfkc = true).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.values.toSet == Set("office abc café no1"),
      got.toString)
    // nfkc off: the renderings do NOT collapse (the gap this closes)
    val off = df.select(TextAnalysis.normalizeText($"text"))
      .as[String].collect().toSet
    assert(off.size > 1)
    // null safety + SQL surface parity (graft_nfkc registered)
    assert(df.select(TextAnalysis.normalizeText(lit(null)
      .cast("string"), nfkc = true)).first().isNullAt(0))
    graft.functions.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_nfkc('o\uFB03ce \uFF21') AS n")
      .as[String].head()
    assert(viaSql == "office A")
    // codegen path: the expression must not fall out of wholestage
    // (a LocalTableScan never codegens — use a range source)
    val ranged = spark.range(10).select(
      graft.functions.NfkcNormalize.nfkc(
        concat(lit("ﬁle "), $"id".cast("string"))).as("n"))
    // the "*(n)" prefix is the whole-stage-codegen marker: the
    // projection containing graft_nfkc compiled into the stage
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") &&
      plan.contains("graft_nfkc"), plan)
    assert(ranged.as[String].head() == "file 0")
  }

  test("winnowFingerprints: window-min selection, rightmost ties, " +
      "shared-substring guarantee, density") {
    // constant-hash tie case: every window's min key is its RIGHTMOST
    // position, so fingerprints are exactly positions w..m
    val words = (1 to 12).map(i => s"t$i").mkString(" ")
    val const = Seq((1L, words)).toDF("doc_id", "text")
    val fpTie = Dedup.winnowFingerprints(const, "text", "doc_id",
        k = 3, w = 4, gramHash = _ => lit(7L))
      .select($"pos").as[Long].collect().sorted.toSeq
    // m = 12-2 = 10 grams; windows 1..7 pick their last position
    assert(fpTie == (4L to 10L))
    // real hashes: identical docs -> identical fingerprint sets;
    // a long shared substring must share at least one hash
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq((1L, base), (2L, base),
      (3L, s"PREFIX words here $base SUFFIX tail"),
      (4L, "entirely different vocabulary with nothing in common " +
        "whatsoever about winnowing text selection")).toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(docs, "text", "doc_id",
      k = 5, w = 4).cache()
    def hashes(id: Long) = fp.where($"doc_id" === id)
      .select($"gram_hash").as[Long].collect().toSet
    assert(hashes(1L) == hashes(2L))
    assert((hashes(1L) & hashes(3L)).nonEmpty,
      "a shared >= w+k-1 token substring must share a fingerprint")
    assert((hashes(1L) & hashes(4L)).isEmpty)
    // density ~ 2/(w+1): for w=4 expect ~40%, loosely bounded
    val m = 20 - 4 // grams in base
    val n1 = fp.where($"doc_id" === 1L).count()
    assert(n1 >= m / 5 && n1 <= m * 4 / 5, s"density off: $n1 of $m")
    // partitioning invariance
    val again = Dedup.winnowFingerprints(docs.repartition(5), "text",
      "doc_id", k = 5, w = 4)
    assert(fp.select($"doc_id", $"pos", $"gram_hash").except(again)
      .isEmpty && again.except(fp).isEmpty)
    fp.unpersist()
  }

  test("quality score is higher for clean prose than word soup") {
    val clean = Seq((1L, ("the cat sat on the mat and it was a good day " +
      "for all of the cats in this town") * 3)).toDF("doc_id", "text")
    val soup = Seq((2L, "zx qwv bnm pqr !!! ;;; ::: ??? jkl mno " * 5))
      .toDF("doc_id", "text")
    val qc = clean.select(TextAnalysis.qualityScore($"text"))
      .head().getDouble(0)
    val qs = soup.select(TextAnalysis.qualityScore($"text"))
      .head().getDouble(0)
    assert(qc > qs, s"clean=$qc soup=$qs")
  }
}
