package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WordPieceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("wordPieceSymbols: first char bare, ## on every later char") {
    val got = Seq("low", "a", "").toDF("w")
      .select(WordPiece.wordPieceSymbols($"w")).as[Seq[String]]
      .collect()
    assert(got(0) == Seq("l", "##o", "##w"))
    assert(got(1) == Seq("a"))
    assert(got(2) == Seq(""))
  }

  test("training argmax is the LIKELIHOOD ratio, not raw pair " +
      "frequency — the criterion that separates WordPiece from BPE") {
    // counts engineered so the most-FREQUENT pair loses:
    //   (a,##b) c=8  score 8/(8*8)  = 2^-3
    //   (##b,##c) c=2 score 2/(8*3)
    //   (b,##c) c=1  score 1/(1*3)  = 2^-1.585  <- winner at freq 1
    val words = Seq(("abc", 2L), ("ab", 6L), ("bc", 1L))
      .toDF("word", "freq")
    val m = WordPiece.trainFromWordCounts(words, "word", "freq",
      numMerges = 1, minFreq = 1L)
    assert(m.length == 1)
    assert((m.head.left, m.head.right, m.head.merged) ==
      ("b", "##c", "bc"))
    assert(m.head.freq == 1L)
    assert(m.head.scoreMicros ==
      math.round((math.log(1.0 / 3) / math.log(2)) * 1e6))
    // plain BPE on the same table picks the frequent pair instead
    val bpe = Bpe.trainFromWordCounts(words, "word", "freq", 1, 1L,
      symbolize = WordPiece.wordPieceSymbols)
    assert((bpe.head.left, bpe.head.right) == ("a", "##b"))
  }

  test("merged symbol strips the continuation prefix and absorbs " +
      "subsequent merges correctly") {
    // "lowest" x4, "low" x2: round 1 merges some pair; after enough
    // rounds the full word becomes one piece spelled WITHOUT ##
    val words = Seq(("lowest", 4L), ("low", 2L)).toDF("word", "freq")
    val m = WordPiece.trainFromWordCounts(words, "word", "freq",
      numMerges = 5, minFreq = 1L)
    assert(m.nonEmpty)
    m.foreach { mg =>
      assert(mg.right.startsWith("##"), mg.toString)
      assert(mg.merged ==
        mg.left + mg.right.stripPrefix("##"), mg.toString)
    }
    // every merged symbol contains at most one leading ## (never an
    // internal one)
    m.foreach(mg => assert(!mg.merged.drop(2).contains("##")))
  }

  test("greedy longest-match encode: the canonical BERT example, " +
      "unk fallback, overlong guard, null tolerance") {
    val vocab = Seq("[UNK]", "un", "##aff", "##able", "runn", "##ing",
      "the", "a", "##f", "##b")
    val docs = Seq(
      (1L, "unaffable"),
      (2L, "the runn ing"), // "ing" word-initial: no bare "ing" piece
      (3L, "unzzz"), // z missing everywhere -> whole word UNK
      (4L, "x" * 101), // over maxInputChars -> UNK
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = WordPiece.encode(docs, "text", "doc_id", vocab)
      .select($"doc_id", $"pieces").as[(Long, Seq[String])]
      .collect().toMap
    assert(got(1L) == Seq("un", "##aff", "##able"))
    assert(got(2L).take(2) == Seq("the", "runn"))
    assert(got(2L)(2) == "[UNK]", got(2L).toString) // bare "ing"
    assert(got(3L) == Seq("[UNK]"))
    assert(got(4L) == Seq("[UNK]"))
    assert(got(5L) == Seq.empty)
    // longest-first: with "##a" AND "##able" present, "##able" wins
    val v2 = vocab ++ Seq("##a", "##ble")
    val g2 = WordPiece.encode(Seq((1L, "unaffable"))
        .toDF("doc_id", "text"), "text", "doc_id", v2)
      .select($"pieces").as[Seq[String]].head()
    assert(g2 == Seq("un", "##aff", "##able"))
  }

  test("genuine HF-schema fixture: a BERT-style WordPiece file " +
      "(BertNormalizer/TemplateProcessing objects, added_tokens, " +
      "## continuation prefix) imports; encode matches the " +
      "canonical example") {
    val json = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/hf/wordpiece_tokenizer.json"),
      "UTF-8").mkString
    val (vocab, unk) = WordPiece.fromTokenizerJson(json)
    assert(unk == "[UNK]")
    assert(vocab == Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "un",
      "##aff", "##able", "run", "##ning", "the", "a", "##ff", "##a",
      "##ble"))
    // the canonical WordPiece walkthrough: longest-match-first picks
    // ##aff over ##a; OOV words collapse to [UNK]
    val enc = WordPiece.encodeToIds(
      Seq((1L, "unaffable running the zzz")).toDF("doc_id", "text"),
      "text", "doc_id", vocab, unk)
    val (pieces, ids) = enc.select($"pieces", $"ids")
      .as[(Seq[String], Seq[Int])].head()
    assert(pieces == Seq("un", "##aff", "##able", "run", "##ning",
      "the", "[UNK]"))
    assert(ids == Seq(4, 5, 6, 7, 8, 9, 1))
    // re-export round-trips the imported model
    val (back, backUnk) = WordPiece.fromTokenizerJson(
      WordPiece.toTokenizerJson(vocab, unk))
    assert(back == vocab && backUnk == unk)
  }

  test("vocab id order, encodeToIds, tokenizer.json round-trip") {
    val corpus = Seq((1L, "low lower lowest low low newest"),
      (2L, "newest wide wider lowest")).toDF("doc_id", "text")
    val wordCounts = corpus
      .select(explode(split(lower($"text"), "\\s+")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    val merges = WordPiece.trainFromWordCounts(wordCounts, "word",
      "freq", numMerges = 6, minFreq = 1L)
    val alpha = WordPiece.alphabet(wordCounts, "word")
    val vocab = WordPiece.vocabIdOrder(alpha, merges)
    assert(vocab.head == "[UNK]")
    assert(vocab.distinct == vocab)
    // ids: specials, then sorted alphabet, then merges in rank order
    assert(vocab.slice(1, 1 + alpha.length) == alpha)
    val withIds = WordPiece.encodeToIds(corpus, "text", "doc_id",
      vocab)
    val rows = withIds.select($"pieces", $"ids")
      .as[(Seq[String], Seq[Int])].collect()
    rows.foreach { case (ps, ids) =>
      assert(ps.map(vocab.indexOf) == ids)
    }
    // json round-trip preserves the vocab order, unk, and the encode
    val (back, unk) = WordPiece.fromTokenizerJson(
      WordPiece.toTokenizerJson(vocab))
    assert(back == vocab && unk == "[UNK]")
    val a = WordPiece.encode(corpus, "text", "doc_id", vocab)
      .select($"pieces").as[Seq[String]].collect().toSeq
    val b = WordPiece.encode(corpus, "text", "doc_id", back, unk)
      .select($"pieces").as[Seq[String]].collect().toSeq
    assert(a == b)
    // truncated json fails with a descriptive require
    val json = WordPiece.toTokenizerJson(vocab)
    Seq(json.length / 2, json.indexOf("\"vocab\":") + 9).foreach { n =>
      val e = intercept[IllegalArgumentException] {
        WordPiece.fromTokenizerJson(json.take(n))
      }
      assert(e.getMessage.contains("truncated") ||
        e.getMessage.contains("vocab") ||
        e.getMessage.contains("unk_token"), e.getMessage)
    }
  }

  test("training and encode are invariant under input partitioning") {
    val corpus = Seq((1L, "low lower lowest newest"),
      (2L, "newest wide wider low low")).toDF("doc_id", "text")
    val wc = corpus
      .select(explode(split(lower($"text"), "\\s+")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    val a = WordPiece.trainFromWordCounts(wc, "word", "freq", 4, 1L)
    val b = WordPiece.trainFromWordCounts(wc.repartition(7), "word",
      "freq", 4, 1L)
    assert(a == b)
    val vocab = WordPiece.vocabIdOrder(
      WordPiece.alphabet(wc, "word"), a)
    def run(d: org.apache.spark.sql.DataFrame) =
      WordPiece.encode(d, "text", "doc_id", vocab)
        .orderBy($"doc_id").select($"pieces")
        .as[Seq[String]].collect().toSeq
    assert(run(corpus) == run(corpus.repartition(5)))
  }
}
