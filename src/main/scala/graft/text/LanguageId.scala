package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained character-n-gram Naive-Bayes language identification — the
  * production langid path (CCNet/fastText-lid slot; reference for the
  * pipeline position: the FIRST filter every multilingual corpus run
  * applies). `TextAnalysis.languageId`'s stopword heuristic remains
  * as the zero-model fallback; this classifier is what a real corpus
  * run ships, because a stopword argmax mislabels short/informal text
  * and covers only the embedded lists.
  *
  * Everything is closed-form and SQL-replayable (the q138 gate
  * replays TRAIN and APPLY end to end in the oracle):
  *
  *  - Features: character n-grams (nMin..nMax) of the
  *    [[TextAnalysis.normalizeText]]'d text, spaces included — grams
  *    spanning spaces capture word boundaries, the fastText trick.
  *  - Train: per-(lang, gram) occurrence counts → add-one-smoothed
  *    log2 probabilities over the SHARED training vocabulary (+1 OOV
  *    slot), quantized to integer micros (the q103 convention):
  *    `score(g|l) = round(log2((c_gl + 1) / (total_l + V + 1))·1e6)`,
  *    with the per-language unseen-gram floor at c=0 and a doc-count
  *    log2 prior. Each language keeps only its `topK` grams by
  *    (count DESC, gram ASC) — the pruned-model shape every shipped
  *    langid model has; pruned grams score the floor like unseen ones.
  *  - Apply: per-document `sum(score) + prior` per language, argmax
  *    (ties → lexicographically smallest language). Integer-micro
  *    sums are exactly reproducible across engines and partitionings.
  *
  * Scale shape: TRAINING runs on a labeled sample (langid models
  * train once on Tatoeba/Wikipedia-scale data, not on the corpus),
  * so its explode + two groupBys are sample-scale; the per-language
  * top-K is a WindowGroupLimit over distinct (lang, gram) rows. The
  * trained model is ≤ langs·topK entries — APPLY broadcasts it as a
  * HashMap to a `mapPartitions` scoring pass over Column-extracted
  * grams (the `Bpe.encode` contract): no join, no window, no shuffle,
  * O(1) per-gram lookup, linear over any partitioning of a 100 TB
  * scan. (A literal-map `element_at` is array-backed — O(model) per
  * lookup — and measured 30× slower at the 1M-doc smoke.)
  */
object LanguageId {

  /** Embedded DEMO-scale labeled seed — 10 languages: 4 with several
    * repo-written sentences (en/es/de/fr) plus the PUBLIC-DOMAIN UDHR
    * Article 1 text for each of the 10 (the standard public parallel
    * seed corpus for language-ID demos — UN translations carry no
    * copyright). Enough signal for the demos/specs to train a working
    * classifier end to end; a production run trains on a real labeled
    * sample (Tatoeba/Wikipedia-scale, hundreds of languages) through
    * the same [[train]] path — this constant is the pipeline's
    * default, not its ceiling. */
  val builtinSeed: Seq[(String, String)] = Seq(
    "en" -> ("all human beings are born free and equal in dignity " +
      "and rights they are endowed with reason and conscience and " +
      "should act towards one another in a spirit of brotherhood"),
    "es" -> ("todos los seres humanos nacen libres e iguales en " +
      "dignidad y derechos y dotados como estan de razon y " +
      "conciencia deben comportarse fraternalmente los unos con los " +
      "otros"),
    "de" -> ("alle menschen sind frei und gleich an wurde und " +
      "rechten geboren sie sind mit vernunft und gewissen begabt " +
      "und sollen einander im geist der bruderlichkeit begegnen"),
    "fr" -> ("tous les etres humains naissent libres et egaux en " +
      "dignite et en droits ils sont doues de raison et de " +
      "conscience et doivent agir les uns envers les autres dans un " +
      "esprit de fraternite"),
    "it" -> ("tutti gli esseri umani nascono liberi ed eguali in " +
      "dignita e diritti essi sono dotati di ragione e di coscienza " +
      "e devono agire gli uni verso gli altri in spirito di " +
      "fratellanza"),
    "pt" -> ("todos os seres humanos nascem livres e iguais em " +
      "dignidade e em direitos dotados de razao e de consciencia " +
      "devem agir uns para com os outros em espirito de " +
      "fraternidade"),
    "nl" -> ("alle mensen worden vrij en gelijk in waardigheid en " +
      "rechten geboren zij zijn begiftigd met verstand en geweten " +
      "en behoren zich jegens elkander in een geest van " +
      "broederschap te gedragen"),
    "sv" -> ("alla manniskor aro fodda fria och lika i varde och " +
      "rattigheter de aro utrustade med fornuft och samvete och " +
      "bora handla gentemot varandra i en anda av broderskap"),
    "pl" -> ("wszyscy ludzie rodza sie wolni i rowni pod wzgledem " +
      "swej godnosci i swych praw sa oni obdarzeni rozumem i " +
      "sumieniem i powinni postepowac wobec innych w duchu " +
      "braterstwa"),
    "tr" -> ("butun insanlar hur haysiyet ve haklar bakimindan esit " +
      "dogarlar akil ve vicdana sahiptirler ve birbirlerine karsi " +
      "kardeslik zihniyeti ile hareket etmelidirler"),
    "en" -> "the quick brown fox jumps over the lazy dog near the river",
    "en" -> "she said that the weather would be fine for the walk home",
    "en" -> "many people think that reading books is the best way to learn",
    "en" -> "the children played in the garden until the sun went down",
    "es" -> "el perro marron salta sobre la cerca del jardin cada manana",
    "es" -> "ella dijo que el tiempo seria bueno para el paseo a casa",
    "es" -> "mucha gente piensa que leer libros es la mejor manera de aprender",
    "es" -> "los ninos jugaron en el jardin hasta que se puso el sol",
    "de" -> "der schnelle braune fuchs springt uber den faulen hund am fluss",
    "de" -> "sie sagte dass das wetter gut fur den langen heimweg sein wurde",
    "de" -> "viele leute denken dass lesen der beste weg zum lernen ist",
    "de" -> "die kinder spielten im garten bis die sonne unterging",
    "fr" -> "le renard brun saute par dessus le chien paresseux pres de la riviere",
    "fr" -> "elle a dit que le temps serait beau pour la marche vers la maison",
    "fr" -> "beaucoup de gens pensent que lire des livres est la meilleure facon",
    "fr" -> "les enfants ont joue dans le jardin jusqu au coucher du soleil")

  /** A trained, pruned model. `langs` is sorted ascending — the score
    * vector order, the tie-break order, and the id order all follow
    * it. Scores are integer micro-log2 (see object doc). */
  final case class Model(langs: IndexedSeq[String], nMin: Int,
      nMax: Int, grams: Map[String, IndexedSeq[Long]],
      unk: IndexedSeq[Long], prior: IndexedSeq[Long]) {
    // fail at the DRIVER, not as an AIOOBE inside a scoring task: an
    // empty labeled sample (or all-empty texts) trains zero languages
    require(langs.nonEmpty,
      "model has zero languages — the labeled sample was empty or " +
        "yielded no grams")
    require(langs == langs.sorted, "langs must be sorted")
    require(grams.values.forall(_.length == langs.length) &&
      unk.length == langs.length && prior.length == langs.length,
      "score vectors must be lang-aligned")
  }

  /** Character n-grams (nMin..nMax) of a BOUND string column as one
    * array. 1-based positions; texts shorter than n yield one
    * truncated gram (the `shinglesFromTokens` convention — substr
    * clamps); empty text yields empty grams, which every consumer
    * filters. Pass an attribute reference (a `withColumn` alias), NOT
    * an inline expression — the position lambda re-evaluates its
    * capture per element, the documented O(len²) inlining trap. */
  def charNgrams(text: Column, nMin: Int, nMax: Int): Column = {
    require(nMin >= 1 && nMax >= nMin, s"bad n range: $nMin..$nMax")
    val parts = (nMin to nMax).map { n =>
      transform(
        sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
        i => text.substr(i, lit(n)))
    }
    filter(concat(parts: _*), g => g =!= "")
  }

  /** Labeled-sample n-gram counts: (lang, gram, cnt) at distinct-gram
    * scale after one explode per n + one map-side-combined groupBy.
    *
    * Grams come from exploding POSITIONS and slicing with the
    * codegen'd `substr` row expression — not from exploding a
    * [[charNgrams]] array: higher-order `transform` lambdas are
    * interpreter-evaluated per element, and at the q138 gate scale
    * that array build alone measured ~2 s where the position-explode
    * form runs in ~0.2 s. Same gram multiset by construction (both
    * are SQL SUBSTR over the same normalized column; the truncated
    * short-text gram and the empty-gram filter carry over). */
  def ngramCounts(df: DataFrame, textCol: String, langCol: String,
      nMin: Int = 1, nMax: Int = 3): DataFrame = {
    require(nMin >= 1 && nMax >= nMin, s"bad n range: $nMin..$nMax")
    // pin the normalized frame: the per-n union branches below are
    // narrow SHARED subtrees with no exchange boundary, which Spark
    // does not dedup — unpinned, the source scan and normalizeText
    // both execute nMax-nMin+1 times in the one job (3× at the
    // defaults). The frame is tiny (lang + normalized text) and the
    // gram stream it feeds is unchanged.
    val base = df.select(col(langCol).cast("string").as("lang"),
      TextAnalysis.normalizeText(coalesce(col(textCol), lit("")))
        .as("t_"))
      .localCheckpoint(false)
    (nMin to nMax).map { n =>
      base.select(col("lang"), col("t_"),
          explode(sequence(lit(1),
            greatest(length(col("t_")) - (n - 1), lit(1)))).as("i_"))
        .select(col("lang"),
          col("t_").substr(col("i_"), lit(n)).as("gram"))
    }.reduce(_.unionByName(_))
      .where(col("gram") =!= "")
      .groupBy(col("lang"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The scored, pruned model as a DataFrame — (lang, gram,
    * logp_micros), plus per-language floors and priors via
    * [[langStats]]. Kept separate from [[train]] so the q138 oracle
    * can gate the TRAINED TABLE itself. */
  def scoredGrams(counts: DataFrame, topK: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    // shared vocabulary: distinct grams across ALL languages (+1 OOV
    // slot in the smoothing mass) — cross-language scores then share
    // one denominator structure and stay comparable
    val vocab = counts.select(countDistinct(col("gram")).as("v_"))
    val totals = counts.groupBy(col("lang"))
      .agg(sum(col("cnt")).as("total_"))
    val ranked = counts
      .withColumn("rk_", row_number().over(Window.partitionBy("lang")
        .orderBy(col("cnt").desc, col("gram").asc)))
      .where(col("rk_") <= topK)
    ranked.join(totals, "lang").crossJoin(broadcast(vocab))
      .select(col("lang"), col("gram"),
        round(log2((col("cnt") + 1).cast("double") /
          (col("total_") + col("v_") + 1)) * 1e6).cast("long")
          .as("logp_micros"))
  }

  /** Per-language (lang, unk_micros, prior_micros) from the count
    * table and the labeled frame: the unseen-gram floor
    * `log2(1/(total_l + V + 1))` and the doc-count log2 prior. */
  def langStats(counts: DataFrame, df: DataFrame,
      langCol: String): DataFrame = {
    val vocab = counts.select(countDistinct(col("gram")).as("v_"))
    val totals = counts.groupBy(col("lang"))
      .agg(sum(col("cnt")).as("total_"))
    val docs = df.groupBy(col(langCol).cast("string").as("lang"))
      .agg(count(lit(1)).as("docs_"))
    val allDocs = df.select(count(lit(1)).as("alldocs_"))
    totals.join(docs, "lang").crossJoin(broadcast(vocab))
      .crossJoin(broadcast(allDocs))
      .select(col("lang"),
        round(log2(lit(1.0) / (col("total_") + col("v_") + 1)) * 1e6)
          .cast("long").as("unk_micros"),
        round(log2(col("docs_").cast("double") / col("alldocs_"))
          * 1e6).cast("long").as("prior_micros"))
  }

  /** Train on a labeled sample: distributed counts → driver-side
    * assembly of the (bounded, ≤ langs·topK-entry) [[Model]]. The
    * only collects are the pruned score table and the per-language
    * stats — both model-scale, never corpus-scale. */
  def train(df: DataFrame, textCol: String, langCol: String,
      nMin: Int = 1, nMax: Int = 3, topK: Int = 2048): Model = {
    val counts = ngramCounts(df, textCol, langCol, nMin, nMax)
      // consumed twice (scores + stats): sample-scale barrier
      .localCheckpoint(false)
    val stats = langStats(counts, df, langCol).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val langs = stats.keys.toVector.sorted
    val idx = langs.zipWithIndex.toMap
    val unk = langs.map(l => stats(l)._1)
    val byGram = scoredGrams(counts, topK).collect()
      .groupBy(_.getString(1))
      .map { case (g, rows) =>
        val v = unk.toArray.clone()
        rows.foreach(r => v(idx(r.getString(0))) = r.getLong(2))
        g -> v.toIndexedSeq
      }
    Model(langs, nMin, nMax, byGram, unk,
      langs.map(l => stats(l)._2))
  }

  /** Apply a trained model: adds `language` (argmax, ties → smallest
    * lang, 'und' when the text yields no grams), `score_micro` (the
    * winning `prior + Σ gram scores`), `margin_micro` (top1 − top2 —
    * the confidence production filters threshold on; 0 for
    * single-language models and gramless rows), and `scores_micro`
    * (the full lang-ordered vector). A row whose margin falls BELOW
    * `minMarginMicros` routes to 'und' (near-boundary text — a
    * 2-gram Catalan doc scoring es/fr within noise should not get a
    * confident wrong label); the default 0 routes nothing, since
    * margin ≥ 0 by construction. A SINGLE-language model has no
    * second candidate, so margin is 0 by definition and the threshold
    * is NOT applied (otherwise any positive threshold would silently
    * route every row of a degenerate model to 'und').
    * Normalization stays a Column expression (exact parity with
    * [[ngramCounts]]); the scoring pass is `mapPartitions` with the
    * model broadcast as a HashMap — the [[Bpe.encode]] contract —
    * and extracts grams with the SAME `UTF8String.substringSQL`
    * primitive the `substr` expression evaluates, over the same
    * normalized column, so the gram stream is bit-identical to
    * [[ngramCounts]]' (building a gram ARRAY column first went
    * through the interpreter-evaluated `transform` lambda — ~1.7 s of
    * the q138 gate's 2 s apply half; the in-pass loop removes it).
    * A literal-map `element_at` would be an
    * O(model) LINEAR scan per gram (Spark map literals are
    * array-backed): at 1M docs × ~600 grams × 4k entries that was
    * measured at 104 s where the hash path takes ~3 s. Still
    * shuffle-free — no join, no window, no exchange. */
  def applyModel(df: DataFrame, textCol: String, model: Model,
      minMarginMicros: Long = 0L): DataFrame = {
    require(minMarginMicros >= 0L, "minMarginMicros must be >= 0")
    require(!df.columns.exists(Seq("t__", "g__", "language",
      "score_micro", "scores_micro", "margin_micro").contains),
      "input already has a reserved langid column")
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(
      (model.langs.toArray, model.grams.map { case (g, v) =>
        g -> v.toArray }, model.unk.toArray, model.prior.toArray))
    val prepared = df
      .withColumn("t__",
        TextAnalysis.normalizeText(coalesce(col(textCol), lit(""))))
    val inSchema = prepared.schema
    val outSchema = inSchema
      .add("scores_micro",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, false))
      .add("language", org.apache.spark.sql.types.StringType)
      .add("score_micro", org.apache.spark.sql.types.LongType)
      .add("margin_micro", org.apache.spark.sql.types.LongType)
    val tIdx = inSchema.fieldIndex("t__")
    val (nMin, nMax) = (model.nMin, model.nMax)
    val scored = prepared.mapPartitions { rows =>
      val (langs, gramsM, unk, prior) = bc.value
      // key by UTF8String, not String: substringSQL yields UTF8String
      // views, and UTF8String equals/hashCode are content-based — a
      // String-keyed table forces a per-gram toString (UTF-8 decode +
      // alloc) on EVERY lookup, ~2 allocations per gram over the whole
      // corpus for zero semantic difference
      val table = new java.util.HashMap[
        org.apache.spark.unsafe.types.UTF8String, Array[Long]]()
      gramsM.foreach { case (g, v) => table.put(
        org.apache.spark.unsafe.types.UTF8String.fromString(g), v) }
      rows.map { row =>
        // gram stream = ngramCounts' position-explode, inlined: the
        // same substringSQL the substr expression evaluates, same
        // short-text clamp, same empty-gram filter
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(
          if (row.isNullAt(tIdx)) "" else row.getString(tIdx))
        val nChars = u.numChars()
        val scores = prior.clone()
        var sawGram = false
        var n = nMin
        while (n <= nMax) {
          val hi = math.max(nChars - (n - 1), 1)
          var p = 1
          while (p <= hi) {
            val g = u.substringSQL(p, n)
            if (g.numBytes() > 0) {
              sawGram = true
              val v = table.get(g)
              val add = if (v == null) unk else v
              var i = 0
              while (i < scores.length) { scores(i) += add(i); i += 1 }
            }
            p += 1
          }
          n += 1
        }
        var best = 0
        var second = -1
        var i = 1
        while (i < scores.length) {
          if (scores(i) > scores(best)) { second = best; best = i }
          else if (second < 0 || scores(i) > scores(second)) second = i
          i += 1
        }
        val margin =
          if (!sawGram || second < 0) 0L
          else scores(best) - scores(second)
        // the threshold only applies where a margin EXISTS (>= 2
        // languages): a single-language model's margin is 0 by
        // definition, not low confidence
        val lang =
          if (!sawGram) "und"
          else if (second >= 0 && margin < minMarginMicros) "und"
          else langs(best)
        org.apache.spark.sql.Row.fromSeq(
          row.toSeq ++ Seq(scores.toSeq, lang, scores(best), margin))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    scored.drop("t__")
  }

  /** [[applyModel]] falling back to the stopword heuristic for rows
    * the model can't score (no grams) OR — when `minMarginMicros` is
    * set — won't score confidently (margin-routed to 'und'): the
    * trained path first, `TextAnalysis.languageId` where unscored.
    * The heuristic may itself return 'und'; those rows stay 'und'. */
  def applyWithFallback(df: DataFrame, textCol: String,
      model: Model, minMarginMicros: Long = 0L): DataFrame =
    applyModel(df, textCol, model, minMarginMicros)
      .withColumn("language", when(col("language") === "und",
        TextAnalysis.languageId(col(textCol)))
        .otherwise(col("language")))
}
