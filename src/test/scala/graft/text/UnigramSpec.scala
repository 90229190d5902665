package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val toy = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
    ("widest", 3L)).toDF("word", "freq")

  def vocabMap(pieces: Seq[Unigram.Piece])
      : java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    pieces.foreach(p =>
      m.put(p.piece, java.lang.Long.valueOf(p.logpMicros)))
    m
  }

  test("seedVocab keeps every single char plus top-k substrings " +
      "with (freq desc, piece asc) ties") {
    val v = Unigram.seedVocab(toy, "word", "freq", seedSize = 3,
        maxPieceLen = 3)
      .orderBy(length($"piece"), $"piece")
      .as[(String, Long)].collect().toSeq
    val (chars, multi) = v.partition(_._1.length == 1)
    // chars: d e i l n o r s t w — always all of them
    assert(chars.map(_._1) ==
      Seq("d", "e", "i", "l", "n", "o", "r", "s", "t", "w"))
    // "low" appears in low(5) and lower(2) -> 7; "es"/"est"/"st" in
    // newest(6)+widest(3) -> 9 each; top-3 multi by (freq desc, piece
    // asc) = es(9), est(9), st(9) — "lo"/"ow" at 7 lose
    assert(multi.toSet == Set(("es", 9L), ("est", 9L), ("st", 9L)))
  }

  test("seedVocab char frequencies weight by word freq") {
    val v = Unigram.seedVocab(toy, "word", "freq", 100, 2)
      .as[(String, Long)].collect().toMap
    // 'e': lower(2) + newest(6)*2 + widest(3) = 17
    assert(v("e") == 17L)
    // 'w': low(5) + lower(2) + newest(6) + widest(3) = 16
    assert(v("w") == 16L)
  }

  test("viterbiWord maximizes total micro score with the " +
      "longer-last-piece tie-break, brute-force checked") {
    // exhaustive check: every segmentation of every word up to len 8
    // over a random-ish micro vocab
    val pieces = Seq("a", "b", "ab", "ba", "aba", "bab", "abab")
      .zipWithIndex.map { case (p, i) =>
        Unigram.Piece(p, -1000000L - 137L * i * i)
      }
    val vm = vocabMap(pieces)
    def brute(word: String): (Long, Int) = {
      // best (score, lastPieceLen-seq encoded) over all segmentations
      def segs(w: String): Seq[Seq[String]] =
        if (w.isEmpty) Seq(Nil)
        else (1 to math.min(4, w.length)).flatMap { k =>
          val h = w.substring(0, k)
          if (vm.containsKey(h))
            segs(w.substring(k)).map(h +: _)
          else Nil
        }
      val all = segs(word)
      assert(all.nonEmpty)
      val best = all.map(s =>
        (s.map(vm.get(_).longValue()).sum, s)).maxBy(_._1)
      (best._1, best._2.length)
    }
    for (word <- Seq("ab", "abab", "ababab", "aba", "abba", "baba",
        "aababb", "abababab".take(8))) {
      val got = Unigram.viterbiWord(word, vm, 4, -100000000L)
      assert(got.mkString("") == word, s"$word round-trip")
      val gotScore = Unigram.viterbiScore(got, vm, -100000000L)
      val (bestScore, _) = brute(word)
      assert(gotScore == bestScore,
        s"$word: viterbi $gotScore vs brute $bestScore")
    }
  }

  test("viterbi tie-break prefers the longer last piece") {
    // "ab" with p(ab) == p(a)+p(b): tie — must pick the single piece
    val pieces = Seq(Unigram.Piece("a", -1000000L),
      Unigram.Piece("b", -1000000L), Unigram.Piece("ab", -2000000L))
    val got = Unigram.viterbiWord("ab", vocabMap(pieces), 4, -9L)
    assert(got.toSeq == Seq("ab"))
  }

  test("unknown characters fall back to single-char unk pieces") {
    val pieces = Seq(Unigram.Piece("a", -1000000L))
    val got = Unigram.viterbiWord("axa", vocabMap(pieces), 4,
      -100000000L)
    assert(got.toSeq == Seq("a", "x", "a"))
  }

  test("encode segments corpus tokens and is partitioning-invariant") {
    val model = Unigram.mleScores(
      Unigram.seedVocab(toy, "word", "freq", 50, 4))
    val docs = Seq((1L, "newest low"), (2L, "lowest"), (3L, null))
      .toDF("doc_id", "text")
    val a = Unigram.encode(docs, "text", "doc_id", model)
      .orderBy($"doc_id")
      .select($"doc_id", $"pieces", $"score_micros")
      .as[(Long, Seq[String], Long)].collect().toSeq
    val b = Unigram.encode(docs.repartition(7), "text", "doc_id",
        model)
      .orderBy($"doc_id")
      .select($"doc_id", $"pieces", $"score_micros")
      .as[(Long, Seq[String], Long)].collect().toSeq
    assert(a == b)
    // round-trip: concatenating pieces re-spells the tokens
    assert(a.head._2.mkString("") == "newestlow")
    assert(a(1)._2.mkString("") == "lowest")
    assert(a(2)._2.isEmpty) // null text tolerated
  }

  test("EM: corpus log-likelihood is non-decreasing across rounds " +
      "on a fixed vocabulary") {
    val corpus = Seq((1L, "low lower newest"), (2L, "newest widest"),
      (3L, "low newest low")).toDF("doc_id", "text")
    val words = corpus
      .select(explode(TextAnalysis.tokens(lower($"text"))).as("word"))
      .where($"word" =!= "")
      .groupBy($"word").agg(count(lit(1)).as("freq"))
    var model = Unigram.mleScores(
      Unigram.seedVocab(words, "word", "freq", 64, 4))
    var lastLl = Long.MinValue
    for (_ <- 1 to 4) {
      val lp = model.map(p =>
        (p.piece, p.logpMicros / 1e6 * StrictMath.log(2.0)))
      val (counts, ll) = Unigram.expectedCounts(words, "word", "freq",
        lp, 4)
      // slack: probs and counts are micro-rounded, so near
      // convergence the LL can wobble by ~(corpus tokens) micros
      assert(lastLl == Long.MinValue || ll >= lastLl - 100L,
        s"EM likelihood decreased: $lastLl -> $ll")
      lastLl = ll
      val cdf = counts.toSeq.toDF("piece", "freq")
      model = Unigram.mleScores(cdf.where($"freq" > 0))
    }
  }

  test("expectedCounts posteriors are exact on a two-path lattice") {
    // word "ab", vocab {a, b, ab} all prob 1/4 (logp = ln 0.25):
    // paths: [ab] with p=1/4 and [a b] with p=1/16 -> Z = 5/16;
    // E[ab] = (1/4)/(5/16) = 0.8, E[a] = E[b] = 0.2
    val words = Seq(("ab", 1L)).toDF("word", "freq")
    val lp = Seq("a", "b", "ab").map(p => (p, StrictMath.log(0.25)))
    val (counts, ll) = Unigram.expectedCounts(words, "word", "freq",
      lp, 4)
    assert(counts("ab") == 800000L)
    assert(counts("a") == 200000L)
    assert(counts("b") == 200000L)
    assert(ll == StrictMath.round(StrictMath.log(5.0 / 16) * 1e6))
  }

  test("expectedCounts is invariant under word-table partitioning") {
    val corpus = Seq((1L, "low lower newest widest low")).toDF(
      "doc_id", "text")
    val words = corpus
      .select(explode(TextAnalysis.tokens(lower($"text"))).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    val model = Unigram.mleScores(
      Unigram.seedVocab(words, "word", "freq", 32, 4))
    val lp = model.map(p =>
      (p.piece, p.logpMicros / 1e6 * StrictMath.log(2.0)))
    val a = Unigram.expectedCounts(words, "word", "freq", lp, 4)
    val b = Unigram.expectedCounts(words.repartition(13), "word",
      "freq", lp, 4)
    assert(a == b)
  }

  test("train prunes to the target size, keeps all single chars, " +
      "and learns the planted piece") {
    // "xy" dominates: it should survive pruning to a tiny vocab
    val corpus = Seq((1L, "xy xy xy xy xy xy qz"),
      (2L, "xy xy xy xy qz")).toDF("doc_id", "text")
    val model = Unigram.train(corpus, "text", vocabSize = 6,
      seedSize = 16, maxPieceLen = 2)
    val chars = model.filter(_.piece.length == 1).map(_.piece).sorted
    assert(chars == Seq("q", "x", "y", "z"))
    assert(model.count(_.piece.length >= 2) <= 2)
    assert(model.exists(_.piece == "xy"), model.toString)
    // and the dominant piece wins the segmentation
    val enc = Unigram.encode(corpus, "text", "doc_id", model,
        maxPieceLen = 2)
      .orderBy($"doc_id").select($"pieces")
      .as[Seq[String]].collect()
    assert(enc(0).count(_ == "xy") == 6)
  }

  test("vocabIds rank by (logp desc, piece asc) and encodeToIds " +
      "round-trips pieces through the literal map") {
    val model = Unigram.mleScores(
      Unigram.seedVocab(toy, "word", "freq", 50, 4))
    val ids = Unigram.vocabIds(model)
    // most probable piece = id 0; ids are dense 0..n-1
    assert(ids.values.toSeq.sorted == (0 until model.size))
    val byRank = model.sortBy(p => (-p.logpMicros, p.piece))
    assert(ids(byRank.head.piece) == 0)
    assert(ids(byRank.last.piece) == model.size - 1)
    val docs = Seq((1L, "newest low")).toDF("doc_id", "text")
    val got = Unigram.encodeToIds(docs, "text", "doc_id", model)
      .select($"pieces", $"ids")
      .as[(Seq[String], Seq[Int])].collect().head
    assert(got._2 == got._1.map(ids))
    // unknown fallback piece -> -1
    val unkModel = Seq(Unigram.Piece("a", -1000000L))
    val got2 = Unigram.encodeToIds(
        Seq((1L, "axa")).toDF("doc_id", "text"), "text", "doc_id",
        unkModel)
      .select($"ids").as[Seq[Int]].collect().head
    assert(got2 == Seq(0, -1, 0))
  }

  test("hardEmRound counts the viterbi segmentation exactly and " +
      "is partitioning-invariant") {
    val model = Unigram.mleScores(
      Unigram.seedVocab(toy, "word", "freq", 50, 4))
    val a = Unigram.hardEmRound(toy, "word", "freq", model)
    val b = Unigram.hardEmRound(toy.repartition(7), "word", "freq",
      model)
    assert(a == b)
    // hand check: each word's best segmentation under the seed MLE,
    // counted with word freq — replicate via encode on one-word docs
    val vm = vocabMap(model)
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val counts = scala.collection.mutable.Map[String, Long]()
    words.foreach { case (w, f) =>
      Unigram.viterbiWord(w, vm, 4, -100000000L)
        .foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
    }
    val tot = counts.values.sum.toDouble
    val wantPieces = counts.keySet
    assert(a.map(_.piece).toSet == wantPieces)
    a.foreach { p =>
      val want = math.round(math.log(counts(p.piece) / tot) /
        math.log(2.0) * 1e6)
      assert(math.abs(p.logpMicros - want) <= 1L,
        s"${p.piece}: ${p.logpMicros} vs $want")
    }
  }

  test("tokenizer.json interop: unigram model round-trips pieces, " +
      "micro scores, ids, and the encode") {
    val model = Unigram.mleScores(
      Unigram.seedVocab(toy, "word", "freq", 50, 4))
    val json = Unigram.toTokenizerJson(model)
    assert(json.contains("\"type\": \"Unigram\"") &&
      json.contains("\"vocab\":"))
    val back = Unigram.fromTokenizerJson(json)
    assert(back.sortBy(p => (-p.logpMicros, p.piece)) ==
      model.sortBy(p => (-p.logpMicros, p.piece)))
    // index order in the file IS the id order
    assert(Unigram.vocabIds(back) == Unigram.vocabIds(model))
    val docs = Seq((1L, "newest low lowest")).toDF("doc_id", "text")
    val a = Unigram.encodeToIds(docs, "text", "doc_id", model)
      .select($"ids").as[Seq[Int]].collect().head
    val b = Unigram.encodeToIds(docs, "text", "doc_id", back)
      .select($"ids").as[Seq[Int]].collect().head
    assert(a == b && a.nonEmpty)
  }

  test("hardEmTrain chain: rounds + closed-form prune compose " +
      "exactly; the final model exports via toTokenizerJson") {
    val corpus = Seq((1L, "low lower newest lowest"),
      (2L, "newest widest low low"), (3L, "wide wider new newest"),
      (4L, "low newest low lowest wide")).toDF("doc_id", "text")
    val words = corpus
      .select(explode(split(lower($"text"), "\\s+")).as("word"))
      .where($"word" =!= "")
      .groupBy($"word").agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    val chained = Unigram.hardEmTrain(words, "word", "freq",
      pruneTo = 4, rounds = 2, seedSize = 24, maxPieceLen = 3)
    // manual composition: seed -> round -> prune -> round
    val seed = Unigram.mleScores(
      Unigram.seedVocab(words, "word", "freq", 24, 3))
    val r1 = Unigram.hardEmRound(words, "word", "freq", seed, 3)
    val pruned = r1.filter(_.piece.length == 1) ++
      r1.filter(_.piece.length >= 2)
        .sortBy(p => (-p.logpMicros, p.piece)).take(4)
    val r2 = Unigram.hardEmRound(words, "word", "freq", pruned, 3)
    assert(chained == r2)
    // the prune bit: at most 4 multi-char pieces survive
    assert(chained.count(_.piece.length >= 2) <= 4)
    assert(r1.count(_.piece.length >= 2) > 4, "fixture must prune")
    // trained-model export: json round-trip preserves the chain's
    // model and its encode
    val back = Unigram.fromTokenizerJson(
      Unigram.toTokenizerJson(chained))
    assert(back.sortBy(p => (-p.logpMicros, p.piece)) ==
      chained.sortBy(p => (-p.logpMicros, p.piece)))
    val enc = Unigram.encode(corpus, "text", "doc_id", chained, 3)
      .select($"doc_id", $"pieces").as[(Long, Seq[String])]
      .collect().toMap
    val encBack = Unigram.encode(corpus, "text", "doc_id", back, 3)
      .select($"doc_id", $"pieces").as[(Long, Seq[String])]
      .collect().toMap
    assert(enc == encBack)
    // invariance under input partitioning
    val chained2 = Unigram.hardEmTrain(words.repartition(7), "word",
      "freq", pruneTo = 4, rounds = 2, seedSize = 24, maxPieceLen = 3)
    assert(chained2 == chained)
  }

  test("fromTokenizerJson fails cleanly on truncated/malformed " +
      "input — descriptive require, never an index error") {
    val model = Unigram.mleScores(
      Unigram.seedVocab(toy, "word", "freq", 20, 4))
    val json = Unigram.toTokenizerJson(model)
    val cuts = Seq(json.indexOf("\"vocab\":") + 9,
      json.indexOf("[[") + 3, json.length / 2,
      json.lastIndexOf(']') - 1)
    cuts.foreach { n =>
      val e = intercept[IllegalArgumentException] {
        Unigram.fromTokenizerJson(json.take(n))
      }
      assert(e.getMessage.contains("truncated") ||
        e.getMessage.contains("malformed") ||
        e.getMessage.contains("vocab"), s"cut $n: ${e.getMessage}")
    }
    val e = intercept[IllegalArgumentException] {
      Unigram.fromTokenizerJson(
        """{"model": {"vocab": [["a", not-a-number]]}}""")
    }
    assert(e.getMessage.contains("malformed vocab score"))
  }

  test("train is invariant under corpus partitioning") {
    val corpus = Seq((1L, "low lower newest"), (2L, "newest widest"),
      (3L, "low newest low low")).toDF("doc_id", "text")
    val a = Unigram.train(corpus, "text", vocabSize = 12,
      seedSize = 24, maxPieceLen = 3)
    val b = Unigram.train(corpus.repartition(11), "text",
      vocabSize = 12, seedSize = 24, maxPieceLen = 3)
    assert(a == b)
  }
}
