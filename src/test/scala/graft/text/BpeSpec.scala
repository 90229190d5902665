package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // the Sennrich toy vocabulary (char symbols, no end-marker):
  // pair counts -> es/st tie at 9 broken lexicographically, then
  // est at 9, then lo/ow tie at 7
  lazy val toy = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
    ("widest", 3L)).toDF("word", "freq")

  test("training reproduces the classic merge sequence with " +
      "deterministic tie-breaks") {
    val m = Bpe.trainFromWordCounts(toy, "word", "freq", numMerges = 4)
    assert(m.map(x => (x.left, x.right)) ==
      Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    assert(m.map(_.freq) == Seq(9L, 9L, 7L, 7L))
    assert(m.map(_.merged) == Seq("es", "est", "lo", "low"))
  }

  test("training is invariant under input partitioning") {
    val a = Bpe.trainFromWordCounts(toy, "word", "freq", 4)
    val b = Bpe.trainFromWordCounts(toy.repartition(7), "word", "freq", 4)
    assert(a == b)
  }

  test("minFreq stops the merge loop early") {
    val m = Bpe.trainFromWordCounts(toy, "word", "freq",
      numMerges = 100, minFreq = 8L)
    // only the two frequency-9 merges clear the bar
    assert(m.map(_.merged) == Seq("es", "est"))
  }

  test("mergePairExpr is the greedy non-overlapping scan") {
    val df = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"),
      Seq("b", "a", "a"), Seq("a")).toDF("syms")
    val got = df.select(Bpe.mergePairExpr($"syms", "a", "a").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("aa", "a"), Seq("aa", "aa"),
      Seq("b", "aa"), Seq("a")))
  }

  test("encode replays training: training words reach their final " +
      "symbolization, novel words compose learned pieces") {
    val m = Bpe.trainFromWordCounts(toy, "word", "freq", 4)
    val docs = Seq((1L, "newest low"), (2L, "lowest"))
      .toDF("doc_id", "text")
    val got = Bpe.encode(docs, "text", "doc_id", m)
      .orderBy($"doc_id")
      .select($"pieces").as[Seq[String]].collect()
    // newest -> n e w est ; low -> low (exact training replays);
    // lowest (unseen) -> low + est
    assert(got(0) == Seq("n", "e", "w", "est", "low"))
    assert(got(1) == Seq("low", "est"))
  }

  test("end-to-end train on a text column counts every occurrence") {
    val docs = Seq((1L, "aa ab aa"), (2L, "ab aa")).toDF("id", "text")
    // pairs: a-a freq 3 (from aa ×3), a-b freq 2 -> first merge (a,a)
    val m = Bpe.train(docs, "text", numMerges = 1, minFreq = 1L)
    assert(m.head.left == "a" && m.head.right == "a" &&
      m.head.freq == 3L)
  }

  test("end-of-word marker: Sennrich's original symbolization learns " +
      "word-final merges and detokenizable pieces") {
    val m = Bpe.trainFromWordCounts(toy, "word", "freq", numMerges = 5,
      symbolize = Bpe.charSymbolsEow)
    // counts with </w>: e-s 9, s-t 9, t-</w> 9 tie -> lexicographic
    // "e s" < "s t" < "t </w>"; then es-t 9 < t-</w>? recompute each
    // round — just pin the canonical outcome of the classic corpus
    assert(m.head.left == "e" && m.head.right == "s")
    assert(m.map(_.merged).contains("est</w>") ||
      m.map(_.merged).contains("est"),
      s"expected an est-family merge, got ${m.map(_.merged)}")
    // every learned symbol either carries no marker or ENDS with it —
    // </w> can never appear word-internal
    assert(m.forall(x =>
      !x.merged.contains(Bpe.EndOfWord) ||
        x.merged.endsWith(Bpe.EndOfWord)))
    // encode with the matching symbolization: last piece of each word
    // carries the marker; mismatched encode (appendEow=false) would
    // never fire word-final merges
    val docs = Seq((1L, "newest low")).toDF("doc_id", "text")
    val pieces = Bpe.encode(docs, "text", "doc_id", m, appendEow = true)
      .select($"pieces").as[Seq[String]].head()
    assert(pieces.nonEmpty && pieces.last.endsWith(Bpe.EndOfWord))
    // exactly one marker per word across the piece stream
    assert(pieces.map(p =>
      Bpe.EndOfWord.r.findAllIn(p).length).sum == 2)
  }

  test("supplementary-plane text: train and encode symbolize by code " +
      "point, never by UTF-16 unit") {
    // U+1F600 (a surrogate pair in UTF-16) repeated: the dominant pair
    // is (😀, 😀); encode must replay it and emit whole-code-point
    // pieces, not lone surrogates
    val smile = new String(Character.toChars(0x1F600))
    val words = Seq((smile * 3, 5L), (s"a$smile", 2L))
      .toDF("word", "freq")
    val m = Bpe.trainFromWordCounts(words, "word", "freq", numMerges = 1,
      minFreq = 1L)
    assert(m.head.left == smile && m.head.right == smile &&
      m.head.freq == 10L)
    val docs = Seq((1L, smile * 3)).toDF("doc_id", "text")
    val pieces = Bpe.encode(docs, "text", "doc_id", m)
      .select($"pieces").as[Seq[String]].head()
    assert(pieces == Seq(smile + smile, smile))
    assert(pieces.forall(p => !p.exists(Character.isSurrogate) ||
      p.codePoints().toArray.forall(Character.isValidCodePoint)),
      "no lone surrogates in emitted pieces")
  }

  test("encode runs unchanged over a structured stream, " +
      "stream equals batch") {
    implicit val sqlCtx = spark.sqlContext
    val m = Bpe.trainFromWordCounts(toy, "word", "freq", 4)
    val rows = Seq((1L, "newest widest low"), (2L, "lower lowest"),
      (3L, "unrelated tokens entirely"))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = Bpe.encode(mem.toDF().toDF("doc_id", "text"), "text",
        "doc_id", m)
      .writeStream.outputMode("append").format("memory")
      .queryName("bpe_stream").start()
    try {
      mem.addData(rows.take(2))
      q.processAllAvailable()
      mem.addData(rows.drop(2))
      q.processAllAvailable()
      val got = spark.table("bpe_stream")
        .collect().map(r => r.getLong(0) ->
          (r.getSeq[String](1), r.getLong(2))).toMap
      val want = Bpe.encode(rows.toDF("doc_id", "text"), "text",
          "doc_id", m)
        .collect().map(r => r.getLong(0) ->
          (r.getSeq[String](1), r.getLong(2))).toMap
      assert(got == want)
    } finally q.stop()
  }

  test("encode memo and partitioning do not change output") {
    val m = Bpe.trainFromWordCounts(toy, "word", "freq", 4)
    val docs = (0L until 50L).map(i =>
      (i, s"newest widest lower low token$i")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Bpe.encode(df, "text", "doc_id", m)
        .orderBy($"doc_id")
        .select($"n_pieces").as[Long].collect().toSeq
    assert(run(docs) == run(docs.repartition(11)))
  }
}
