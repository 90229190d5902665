package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LanguageIdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // the library's embedded demo seed, grouped per language
  private val bank: Map[String, Seq[String]] =
    LanguageId.builtinSeed.groupBy(_._1).map { case (l, ps) =>
      l -> ps.map(_._2)
    }

  private def corpus(nPerLang: Int) = {
    val rows = for {
      (lang, ps) <- bank.toSeq.sortBy(_._1)
      i <- 0 until nPerLang
    } yield (lang, s"${ps(i % ps.length)} ${ps((i + 1) % ps.length)}",
      i.toLong)
    rows.toDF("lang", "text", "i")
  }

  test("charNgrams: exact gram multiset, short-text clamp, empty") {
    def grams(s: String, nMin: Int, nMax: Int) =
      Seq(s).toDF("t").select(
        LanguageId.charNgrams($"t", nMin, nMax).as("g"))
        .as[Seq[String]].head()
    assert(grams("abc", 1, 2) == Seq("a", "b", "c", "ab", "bc"))
    assert(grams("ab", 3, 3) == Seq("ab")) // substr clamps
    assert(grams("", 1, 2) == Seq.empty)
    assert(grams("a b", 2, 2) == Seq("a ", " b")) // spaces included
  }

  test("planted-language recovery: train on one cohort, classify a " +
      "HELD-OUT cohort with different phrase mixes at 100%") {
    val train = corpus(6)
    val model = LanguageId.train(train, "text", "lang",
      nMin = 2, nMax = 3, topK = 512)
    assert(model.langs == Vector("de", "en", "es", "fr", "it", "nl",
      "pl", "pt", "sv", "tr"))
    // held-out: phrase PAIRS the training never saw (reversed order)
    val held = bank.toSeq.sortBy(_._1).flatMap { case (lang, ps) =>
      ps.indices.map(i =>
        (lang, s"${ps((i + 2) % ps.length)} ${ps(i % ps.length)}"))
    }.toDF("lang", "text")
    val got = LanguageId.applyModel(held, "text", model)
      .select($"lang", $"language").as[(String, String)]
      .collect()
    assert(got.forall { case (want, pred) => want == pred },
      got.filter(r => r._1 != r._2).mkString(", "))
    // short informal text — the case the stopword heuristic misses
    // (3-4 words, no sentence structure, novel word combinations)
    val shorts = Seq("pres de la maison", "die sonne im garten",
      "el jardin cada dia", "the way home")
      .toDF("text")
    val sGot = LanguageId.applyModel(shorts, "text", model)
      .select($"language").as[String].collect().toSeq
    assert(sGot == Seq("fr", "de", "es", "en"), sGot.toString)
  }

  test("train is invariant under input partitioning; apply is " +
      "invariant too") {
    val c = corpus(5)
    val a = LanguageId.train(c, "text", "lang", 2, 3, 128)
    val b = LanguageId.train(c.repartition(13), "text", "lang",
      2, 3, 128)
    assert(a == b)
    val docs = corpus(3).withColumn("doc_id",
      monotonically_increasing_id())
    def run(d: org.apache.spark.sql.DataFrame) =
      LanguageId.applyModel(d, "text", a)
        .select($"i", $"lang", $"language", $"score_micro")
        .orderBy($"i", $"lang")
        .as[(Long, String, String, Long)].collect().toSeq
    assert(run(docs) == run(docs.repartition(7)))
  }

  test("empty/null text scores 'und'; applyWithFallback hands those " +
      "to the stopword heuristic") {
    val model = LanguageId.train(corpus(4), "text", "lang", 2, 3, 128)
    val rows = Seq((1L, null.asInstanceOf[String]), (2L, ""),
      (3L, "   ")).toDF("doc_id", "text")
    val got = LanguageId.applyModel(rows, "text", model)
      .select($"doc_id", $"language").as[(Long, String)]
      .collect().toSeq
    assert(got.forall(_._2 == "und"), got.toString)
    // fallback: a text of pure stopwords the MODEL will also get
    // right, plus an empty one that stays 'und' via the heuristic
    val fb = LanguageId.applyWithFallback(
        Seq((1L, ""), (2L, "the of and to in")).toDF("doc_id", "text"),
        "text", model)
      .select($"doc_id", $"language").as[(Long, String)]
      .collect().toMap
    assert(fb(1L) == "und" && fb(2L) == "en", fb.toString)
  }

  test("model scores are the closed-form smoothed log2 micros") {
    // two one-doc languages with tiny alphabets: verify by hand math
    val c = Seq(("aa", "ab"), ("bb", "ba"))
      .toDF("lang", "text")
    val model = LanguageId.train(c, "text", "lang",
      nMin = 1, nMax = 1, topK = 10)
    // grams: aa -> {a:1, b:1}; bb -> {b:1, a:1}; V = 2 (a, b)
    // score = log2((1+1)/(2+2+1)) = log2(0.4)
    val want = math.round(math.log(0.4) / math.log(2.0) * 1e6)
    assert(model.grams("a") == IndexedSeq(want, want))
    val unkWant = math.round(math.log(0.2) / math.log(2.0) * 1e6)
    assert(model.unk == IndexedSeq(unkWant, unkWant))
    val priorWant = math.round(math.log(0.5) / math.log(2.0) * 1e6)
    assert(model.prior == IndexedSeq(priorWant, priorWant))
  }

  test("margin_micro is exactly top1 - top2 of scores_micro; a " +
      "minMarginMicros threshold routes near-boundary docs to 'und'") {
    val model = LanguageId.train(corpus(4), "text", "lang", 2, 3, 512)
    // confident docs: margin matches the score vector arithmetic and
    // clears any sane threshold
    val docs = corpus(3).withColumn("doc_id",
      monotonically_increasing_id())
    val got = LanguageId.applyModel(docs, "text", model)
      .select($"lang", $"language", $"scores_micro", $"score_micro",
        $"margin_micro")
      .as[(String, String, Seq[Long], Long, Long)].collect()
    got.foreach { case (want, pred, scores, top, margin) =>
      assert(pred == want)
      val sorted = scores.sorted(Ordering[Long].reverse)
      assert(top == sorted.head)
      assert(margin == sorted.head - sorted(1), (want, margin))
      assert(margin > 0)
    }
    // near-boundary: a doc mixing two languages evenly scores with a
    // small margin; thresholding routes it to 'und' while confident
    // docs keep their label. es/pt UDHR text shares romance grams, so
    // a 50/50 splice sits near the decision boundary.
    val bankEs = bank("es").head.split(" ")
    val bankPt = bank("pt").head.split(" ")
    val splice = (bankEs.take(8) ++ bankPt.take(8)).mkString(" ")
    val mixed = Seq((1L, splice), (2L, bank("de").head))
      .toDF("doc_id", "text")
    val plain = LanguageId.applyModel(mixed, "text", model)
      .select($"doc_id", $"language", $"margin_micro")
      .as[(Long, String, Long)].collect()
      .map { case (id, l, m) => id -> (l, m) }.toMap
    // the splice's margin is far below the confident doc's
    assert(plain(1L)._2 < plain(2L)._2, plain.toString)
    val routed = LanguageId.applyModel(mixed, "text", model,
        minMarginMicros = plain(1L)._2 + 1)
      .select($"doc_id", $"language").as[(Long, String)]
      .collect().toMap
    assert(routed(1L) == "und", routed.toString)
    assert(routed(2L) == "de", routed.toString)
    // gramless rows: margin 0, language 'und' regardless of threshold
    val empty = LanguageId.applyModel(
        Seq((1L, "")).toDF("doc_id", "text"), "text", model)
      .select($"language", $"margin_micro").as[(String, Long)].head()
    assert(empty == ("und", 0L))
    // a SINGLE-language model has no second candidate: margin is 0
    // by definition and a positive threshold must NOT route its rows
    // to 'und' (the degenerate-model guard)
    val solo = LanguageId.train(
      Seq(("en", bank("en").head)).toDF("lang", "text"),
      "text", "lang", 2, 3, 64)
    val soloOut = LanguageId.applyModel(
        Seq((1L, bank("en").head)).toDF("doc_id", "text"), "text",
        solo, minMarginMicros = 999999L)
      .select($"language", $"margin_micro").as[(String, Long)].head()
    assert(soloOut == ("en", 0L), soloOut.toString)
  }

  test("apply is shuffle-free: no Exchange, no Join, no Window in " +
      "the physical plan") {
    val model = LanguageId.train(corpus(3), "text", "lang", 2, 3, 64)
    val docs = corpus(2)
    val plan = LanguageId.applyModel(docs, "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
