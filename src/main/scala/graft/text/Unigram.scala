package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed UNIGRAM language-model tokenizer (Kudo 2018, the
  * SentencePiece "unigram" algorithm) — the other major subword
  * family next to [[Bpe]]: instead of greedily merging pairs, hold a
  * vocabulary of candidate pieces with probabilities and segment each
  * word by maximum likelihood (Viterbi over the segmentation
  * lattice); train the probabilities by EM over ALL segmentations and
  * prune the vocabulary down to the target size.
  *
  * Scale shape — same contract as [[Bpe]]: everything after one
  * token-scale histogram pass is CORPUS-SIZE INDEPENDENT.
  *  - the seed vocabulary is one substring explode + map-side-combined
  *    sum over DISTINCT words, then a distributed top-k (TakeOrdered,
  *    no global sort);
  *  - each EM round is one mapPartitions pass over the distinct-word
  *    histogram (forward–backward per word against a BROADCAST piece
  *    table) followed by one vocab-scale groupBy sum; the model
  *    (piece → probability) is calibration-scale and collects like
  *    every fit in `stats/Fitting`;
  *  - [[encode]] is mapPartitions + broadcast + per-partition memo —
  *    tokenizers are imperative library code, the multimodal-codec
  *    contract.
  *
  * Determinism — the reason scores are INTEGER MICROS end to end:
  *  - piece scores are `round(log2(freq / total) * 1e6)` longs (the
  *    q88/q103 micro-log convention, proven to match DuckDB);
  *  - per-word expected counts in the E-step round to micro longs
  *    BEFORE the cross-word sum, so the aggregate is an exact integer
  *    sum — identical under any partitioning;
  *  - the Viterbi tie-break is (score DESC, last piece LONGER first),
  *    applied at every lattice boundary — unique segmentation under
  *    any partitioning, and replayable in SQL.
  */
object Unigram {

  /** One vocabulary entry: the piece and its log2-probability in
    * integer micros (round(log2(p) * 1e6)). */
  final case class Piece(piece: String, logpMicros: Long)

  /** Substring seed vocabulary over a word-frequency table: every
    * substring of length ≤ `maxPieceLen` of every distinct word,
    * weighted by word frequency; the vocabulary is ALL single
    * characters (segmentation must never fail on corpus text) plus
    * the top `seedSize` multi-character substrings by
    * (freq DESC, piece ASC). Shuffle carries (piece, freq) — never
    * documents; the top-k is a TakeOrdered, no global sort. Returns
    * (piece, freq). */
  def seedVocab(words: DataFrame, wordCol: String, freqCol: String,
      seedSize: Int, maxPieceLen: Int = 4): DataFrame = {
    require(seedSize > 0 && maxPieceLen >= 2)
    val w = col(wordCol)
    val counted = words
      .where(length(w) >= 1)
      .select(explode(flatten(transform(
        sequence(lit(1), length(w)),
        s => transform(
          sequence(lit(1), least(lit(maxPieceLen), length(w) - s + 1)),
          l => w.substr(s, l))))).as("piece"),
        col(freqCol).cast("long").as("f_"))
      .groupBy(col("piece")).agg(sum(col("f_")).as("freq"))
    val chars = counted.where(length(col("piece")) === 1)
    val multi = counted.where(length(col("piece")) >= 2)
      .orderBy(col("freq").desc, col("piece"))
      .limit(seedSize)
    chars.unionByName(multi)
  }

  /** MLE piece scores off a (piece, freq) vocabulary: log2(freq /
    * total) in integer micros, computed as a Spark SQL expression (the
    * proven q103 log path, NOT driver-side math). Returns (piece,
    * freq, logp_micros). */
  def mleScoresDf(vocab: DataFrame): DataFrame = {
    val tot = vocab.agg(sum(col("freq"))).head.getLong(0)
    vocab.select(col("piece"), col("freq"),
      round(log2(col("freq").cast("double") / lit(tot.toDouble)) *
        lit(1e6)).cast("long").as("logp_micros"))
  }

  /** [[mleScoresDf]] collected to the model form (vocab is
    * model-scale — thousands of pieces — the `linearScore`
    * model-as-data convention). */
  def mleScores(vocab: DataFrame): Seq[Piece] =
    mleScoresDf(vocab).select(col("piece"), col("logp_micros"))
      .collect().map(r => Piece(r.getString(0), r.getLong(1))).toSeq
      .sortBy(p => (-p.logpMicros, p.piece))

  // ---------------------------------------------------------------
  // Viterbi encode
  // ---------------------------------------------------------------

  /** Maximum-likelihood segmentation of one word: DP over lattice
    * boundaries, best[j] = max over pieces w[i..j) in vocab of
    * best[i] + logp. Tie-break: higher score, then LONGER last piece
    * (smaller i). Characters absent from the vocabulary fall back to
    * a single-char piece at `unkLogpMicros`, so segmentation is
    * total. Returns the piece sequence. */
  private[text] def viterbiWord(word: String,
      vocab: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int, unkLogpMicros: Long): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val best = new Array[Long](n + 1)
    val plen = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Long.MinValue)
    best(0) = 0L
    var j = 1
    while (j <= n) {
      var k = 1
      val kMax = math.min(maxPieceLen, j)
      while (k <= kMax) {
        if (best(j - k) != Long.MinValue) {
          val piece = word.substring(j - k, j)
          val boxed = vocab.get(piece)
          val lp =
            if (boxed != null) boxed.longValue()
            else if (k == 1) unkLogpMicros
            else Long.MinValue
          if (lp != Long.MinValue) {
            val s = best(j - k) + lp
            // strict > : ties keep the earlier (LONGER, since k
            // iterates ascending we must prefer larger k on equal
            // score → use >= when k grows, i.e. overwrite on equal
            if (s > best(j) || (s == best(j) && k > plen(j))) {
              best(j) = s; plen(j) = k
            }
          }
        }
        k += 1
      }
      j += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) {
      out += word.substring(p - plen(p), p)
      p -= plen(p)
    }
    out.reverseIterator.toArray
  }

  /** Total micro-score of [[viterbiWord]]'s segmentation (for specs
    * and the oracle's score check). */
  private[text] def viterbiScore(pieces: Array[String],
      vocab: java.util.HashMap[String, java.lang.Long],
      unkLogpMicros: Long): Long =
    pieces.map { p =>
      val boxed = vocab.get(p)
      if (boxed != null) boxed.longValue() else unkLogpMicros
    }.sum

  /** Viterbi-encode a corpus: lowercased whitespace tokens (the
    * [[Bpe.train]] histogram convention), each segmented by maximum
    * likelihood under `pieces`. Returns (idCol, pieces array<string>,
    * n_pieces, score_micros). mapPartitions with the vocabulary
    * broadcast and a per-partition word memo — one scan, nothing else
    * moves. */
  def encode(df: DataFrame, textCol: String, idCol: String,
      pieces: Seq[Piece], maxPieceLen: Int = 4,
      unkLogpMicros: Long = -100000000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      pieces.map(p => (p.piece, p.logpMicros)).toArray)
    val src = df
      .select(col(idCol).cast("long"),
        TextAnalysis.tokens(lower(coalesce(col(textCol), lit("")))))
      .as[(java.lang.Long, Seq[String])]
    src.mapPartitions { rows =>
      val vocab = new java.util.HashMap[String, java.lang.Long]()
      bc.value.foreach { case (p, lp) =>
        vocab.put(p, java.lang.Long.valueOf(lp))
      }
      val memo = new java.util.HashMap[String, Array[String]]()
      def enc(wd: String): Array[String] = {
        var r = memo.get(wd)
        if (r == null) {
          r = viterbiWord(wd, vocab, maxPieceLen, unkLogpMicros)
          memo.put(wd, r)
        }
        r
      }
      rows.map { case (id, toks) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        toks.filter(_.nonEmpty).foreach(w => out ++= enc(w))
        val arr = out.toArray
        (id, arr, arr.length.toLong,
          viterbiScore(arr, vocab, unkLogpMicros))
      }
    }.toDF(idCol, "pieces", "n_pieces", "score_micros")
  }

  // ---------------------------------------------------------------
  // EM training
  // ---------------------------------------------------------------

  /** One E-step over the distinct-word histogram: per word,
    * forward–backward over the segmentation lattice under the current
    * piece log-probabilities (broadcast), emitting each piece's
    * expected count × word frequency, ROUNDED TO MICRO LONGS per word
    * before the cross-word sum — the aggregate is exact integer
    * arithmetic, identical under any partitioning. Also returns the
    * corpus log-likelihood (micro long, same rounding) for the
    * monotonicity contract. Lattice math is StrictMath in plain
    * doubles WITHIN one word (single task, deterministic order). */
  private[text] def expectedCounts(words: DataFrame, wordCol: String,
      freqCol: String, pieces: Seq[(String, Double)],
      maxPieceLen: Int): (Map[String, Long], Long) = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(pieces.toArray)
    val perWord = words
      .select(col(wordCol).cast("string"), col(freqCol).cast("long"))
      .as[(String, Long)]
      .mapPartitions { rows =>
        val lp = new java.util.HashMap[String, java.lang.Double]()
        bc.value.foreach { case (p, v) => lp.put(p, v) }
        rows.flatMap { case (word, freq) =>
          val n = word.length
          if (n == 0) Iterator.empty
          else {
            // forward: alpha(j) = logsumexp over i of alpha(i)+lp
            val NEG = Double.NegativeInfinity
            def lse(a: Double, b: Double): Double =
              if (a == NEG) b else if (b == NEG) a
              else if (a > b) a + StrictMath.log1p(StrictMath.exp(b - a))
              else b + StrictMath.log1p(StrictMath.exp(a - b))
            val alpha = Array.fill(n + 1)(NEG); alpha(0) = 0.0
            val beta = Array.fill(n + 1)(NEG); beta(n) = 0.0
            var j = 1
            while (j <= n) {
              var k = 1; val kM = math.min(maxPieceLen, j)
              while (k <= kM) {
                val v = lp.get(word.substring(j - k, j))
                if (v != null && alpha(j - k) != NEG)
                  alpha(j) = lse(alpha(j), alpha(j - k) + v)
                k += 1
              }
              j += 1
            }
            var i = n - 1
            while (i >= 0) {
              var k = 1; val kM = math.min(maxPieceLen, n - i)
              while (k <= kM) {
                val v = lp.get(word.substring(i, i + k))
                if (v != null && beta(i + k) != NEG)
                  beta(i) = lse(beta(i), v + beta(i + k))
                k += 1
              }
              i -= 1
            }
            val z = alpha(n)
            if (z == NEG) Iterator.empty // unsegmentable: contributes 0
            else {
              // expected count of a piece in THIS word = sum of its
              // occurrence posteriors — accumulated in doubles within
              // the word (one task, fixed s,k order), rounded to
              // micros ONCE per (word, piece)
              val acc = new java.util.LinkedHashMap[String,
                java.lang.Double]()
              var s = 0
              while (s < n) {
                var k = 1; val kM = math.min(maxPieceLen, n - s)
                while (k <= kM) {
                  val piece = word.substring(s, s + k)
                  val v = lp.get(piece)
                  if (v != null && alpha(s) != NEG &&
                      beta(s + k) != NEG) {
                    val e = StrictMath.exp(alpha(s) + v + beta(s + k) - z)
                    val prev = acc.get(piece)
                    acc.put(piece, if (prev == null) e
                      else prev.doubleValue() + e)
                  }
                  k += 1
                }
                s += 1
              }
              val out = scala.collection.mutable.ArrayBuffer
                .empty[(String, Long)]
              acc.forEach { (piece, e) =>
                val micros = StrictMath.round(e.doubleValue() * freq * 1e6)
                if (micros > 0L) out += ((piece, micros))
              }
              out += ((" LL", StrictMath.round(z * freq * 1e6)))
              out.iterator
            }
          }
        }
      }
      .toDF("piece", "micros")
      .groupBy(col("piece")).agg(sum(col("micros")).as("m"))
      .collect()
    val ll = perWord.collectFirst {
      case r if r.getString(0) == " LL" => r.getLong(1)
    }.getOrElse(0L)
    val counts = perWord.iterator
      .filter(_.getString(0) != " LL")
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (counts, ll)
  }

  /** EM + prune training over a word-frequency table (Kudo 2018
    * §3.2, the standard practical loop): seed from
    * [[seedVocab]]/[[mleScoresDf]], then alternate `emIters` EM
    * updates with pruning the lowest-expected-count multi-character
    * pieces (the PRUNE step never removes single characters; a char
    * can still drop out of the model if its expected count rounds to
    * zero micros across the whole corpus — [[encode]]'s
    * `unkLogpMicros` fallback keeps segmentation total regardless)
    * by `pruneFrac` until the vocabulary is ≤ `vocabSize`,
    * then run one final EM round. The M-step renormalizes the exact
    * integer expected counts into micro-log2 scores via one
    * vocab-scale Spark expression (the same log path as
    * [[mleScoresDf]]). Pruning approximates the loss-increase
    * criterion by expected count — the common practical shortcut,
    * deterministic by (count ASC, piece DESC). */
  def trainFromWordCounts(words: DataFrame, wordCol: String,
      freqCol: String, vocabSize: Int, seedSize: Int = 4096,
      maxPieceLen: Int = 4, emIters: Int = 2,
      pruneFrac: Double = 0.2): Seq[Piece] = {
    require(vocabSize > 0 && emIters >= 1)
    require(pruneFrac > 0 && pruneFrac < 1)
    val spark = words.sparkSession
    val w = words
      .select(col(wordCol), col(freqCol).cast("long").as("freq"))
      .where(length(col(wordCol)) >= 1)
      .localCheckpoint()
    // seed scores: MLE over substring counts
    var model: Seq[Piece] =
      mleScores(seedVocab(w, wordCol, "freq", seedSize, maxPieceLen))
    var lastLl = Long.MinValue
    def emRound(): Unit = {
      val lp = model.map(p => (p.piece, p.logpMicros / 1e6 *
        StrictMath.log(2.0))) // micro-log2 → natural log for lattice
      val (counts, ll) = expectedCounts(w, wordCol, "freq", lp,
        maxPieceLen)
      lastLl = ll
      // M-step: renormalize through the proven Spark log2 path
      import spark.implicits._
      val cdf = counts.toSeq.toDF("piece", "freq")
      model = mleScores(cdf.where(col("freq") > 0))
    }
    var iter = 0
    while (iter < emIters) { emRound(); iter += 1 }
    while (model.count(_.piece.length >= 2) >
        math.max(0, vocabSize - model.count(_.piece.length == 1))) {
      val multi = model.filter(_.piece.length >= 2)
      val chars = model.filter(_.piece.length == 1)
      val target = math.max(vocabSize - chars.length,
        math.min(multi.length - 1,
          (multi.length * (1 - pruneFrac)).toInt))
      val kept = multi
        .sortBy(p => (-p.logpMicros, p.piece)) // count order = prob order
        .take(math.max(target, 0))
      model = chars ++ kept
      emRound()
    }
    model.sortBy(p => (-p.logpMicros, p.piece))
  }

  /** [[trainFromWordCounts]] straight from a corpus text column — one
    * token-scale lowercased histogram (the [[Bpe.train]] shape), then
    * distinct-word-scale EM rounds. */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
      seedSize: Int = 4096, maxPieceLen: Int = 4, emIters: Int = 2,
      pruneFrac: Double = 0.2): Seq[Piece] = {
    val counts = df
      .select(explode(TextAnalysis.tokens(lower(col(textCol))))
        .as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    trainFromWordCounts(counts, "word", "freq", vocabSize, seedSize,
      maxPieceLen, emIters, pruneFrac)
  }

  /** Deterministic MULTI-ROUND hard-EM training chain — the
    * TRAINED-model path the q139 oracle replays end to end (q134
    * proves one round; this proves the loop): seed MLE →
    * [`rounds` ×] Viterbi-EM round, with a closed-form PRUNE between
    * consecutive rounds — keep every single-character piece plus the
    * top `pruneTo` multi-character pieces by (logp DESC, piece ASC),
    * [[trainFromWordCounts]]' expected-count shortcut made
    * oracle-replayable (hard-EM counts ARE the expected counts of the
    * Viterbi posterior, and score order = count order under MLE).
    * Characters the pruned model loses stay segmentable through
    * [[viterbiWord]]'s `unkLogpMicros` fallback and re-enter the
    * model if any best segmentation uses them. Returns the final
    * re-scored model; [[hardEmTrainDf]] is the gate/audit frame. */
  def hardEmTrain(words: DataFrame, wordCol: String, freqCol: String,
      pruneTo: Int, rounds: Int = 2, seedSize: Int = 4096,
      maxPieceLen: Int = 4, unkLogpMicros: Long = -100000000L)
      : Seq[Piece] =
    hardEmTrainDf(words, wordCol, freqCol, pruneTo, rounds, seedSize,
      maxPieceLen, unkLogpMicros)
      .select(col("piece"), col("logp_micros"))
      .collect().map(r => Piece(r.getString(0), r.getLong(1))).toSeq
      .sortBy(p => (-p.logpMicros, p.piece))

  /** [[hardEmTrain]] as the final round's scored (piece, freq,
    * logp_micros) frame. */
  def hardEmTrainDf(words: DataFrame, wordCol: String,
      freqCol: String, pruneTo: Int, rounds: Int = 2,
      seedSize: Int = 4096, maxPieceLen: Int = 4,
      unkLogpMicros: Long = -100000000L): DataFrame =
    hardEmTrainFromModelDf(words, wordCol, freqCol,
      mleScores(seedVocab(words, wordCol, freqCol, seedSize,
        maxPieceLen)),
      pruneTo, rounds, maxPieceLen, unkLogpMicros)

  /** The chain from an EXISTING seed/checkpoint model (the gate form:
    * the q139 oracle replays the rounds from the q128-proven seed). */
  def hardEmTrainFromModelDf(words: DataFrame, wordCol: String,
      freqCol: String, model0: Seq[Piece], pruneTo: Int,
      rounds: Int = 2, maxPieceLen: Int = 4,
      unkLogpMicros: Long = -100000000L): DataFrame = {
    require(rounds >= 1, "need at least one round")
    require(pruneTo > 0, "pruneTo must be positive")
    var model = model0
    var r = 1
    while (r < rounds) {
      model = hardEmRound(words, wordCol, freqCol, model, maxPieceLen,
        unkLogpMicros)
      val chars = model.filter(_.piece.length == 1)
      val multi = model.filter(_.piece.length >= 2)
        .sortBy(p => (-p.logpMicros, p.piece)).take(pruneTo)
      model = chars ++ multi
      r += 1
    }
    hardEmRoundDf(words, wordCol, freqCol, model, maxPieceLen,
      unkLogpMicros)
  }

  /** Corpus log-likelihood (micro long) under a model — the EM
    * monotonicity probe for specs. */
  def corpusLogLikelihoodMicros(df: DataFrame, textCol: String,
      pieces: Seq[Piece], maxPieceLen: Int = 4): Long = {
    val counts = df
      .select(explode(TextAnalysis.tokens(lower(col(textCol))))
        .as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val lp = pieces.map(p => (p.piece,
      p.logpMicros / 1e6 * StrictMath.log(2.0)))
    expectedCounts(counts, "word", "freq", lp, maxPieceLen)._2
  }

  /** The model as a DataFrame (piece, logp_micros) — the
    * stored-artifact form a tokenizer ships. */
  def piecesToDf(spark: SparkSession, pieces: Seq[Piece]): DataFrame = {
    import spark.implicits._
    pieces.toDF("piece", "logp_micros")
  }

  /** One HARD-EM (Viterbi-EM) training round: counts come from each
    * word's single BEST segmentation (the [[viterbiWord]] DP, same
    * tie-breaks) instead of the full posterior — the fast practical
    * variant of unigram training, and the one a SQL oracle can replay
    * exactly (the best path is integer-deterministic; the soft
    * posterior isn't SQL-expressible). One mapPartitions pass over
    * the distinct-word histogram, counts are exact longs (piece
    * occurrences × word freq), M-step renormalizes through the
    * [[mleScoresDf]] log path. Pieces never chosen by any word drop
    * out. Returns the re-scored model. */
  def hardEmRound(words: DataFrame, wordCol: String, freqCol: String,
      model: Seq[Piece], maxPieceLen: Int = 4,
      unkLogpMicros: Long = -100000000L): Seq[Piece] =
    hardEmRoundDf(words, wordCol, freqCol, model, maxPieceLen,
      unkLogpMicros)
      .select(col("piece"), col("logp_micros"))
      .collect().map(r => Piece(r.getString(0), r.getLong(1))).toSeq
      .sortBy(p => (-p.logpMicros, p.piece))

  /** [[hardEmRound]] as the scored (piece, freq, logp_micros) frame —
    * the gate/audit form. */
  def hardEmRoundDf(words: DataFrame, wordCol: String,
      freqCol: String, model: Seq[Piece], maxPieceLen: Int = 4,
      unkLogpMicros: Long = -100000000L): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      model.map(p => (p.piece, p.logpMicros)).toArray)
    val counts = words
      .select(col(wordCol).cast("string"), col(freqCol).cast("long"))
      .as[(String, Long)]
      .mapPartitions { rows =>
        val vocab = new java.util.HashMap[String, java.lang.Long]()
        bc.value.foreach { case (p, lp) =>
          vocab.put(p, java.lang.Long.valueOf(lp))
        }
        rows.flatMap { case (word, freq) =>
          viterbiWord(word, vocab, maxPieceLen, unkLogpMicros)
            .iterator.map(piece => (piece, freq))
        }
      }
      .toDF("piece", "freq")
      .groupBy(col("piece")).agg(sum(col("freq")).as("freq"))
      // vocab-scale barrier: mleScoresDf consumes counts twice (the
      // total agg + the projection) — don't re-run the corpus scan
      .localCheckpoint()
    mleScoresDf(counts)
  }

  /** Serialize a model as a minimal HuggingFace-schema
    * tokenizer.json (`model.type` "Unigram": vocab is an ORDERED
    * [piece, log-prob] list — entry index IS the id, matching
    * [[vocabIds]]' rank order; log probs are natural-log doubles in
    * the HF convention, emitted from the micro-log2 scores as
    * `micros / 1e6 * ln 2` with full precision). */
  def toTokenizerJson(pieces: Seq[Piece]): String = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val entries = pieces.sortBy(p => (-p.logpMicros, p.piece))
      .map { p =>
        val ln = p.logpMicros / 1e6 * StrictMath.log(2.0)
        s"""["${esc(p.piece)}", $ln]"""
      }.mkString("[", ", ", "]")
    s"""{"version": "1.0", "model": {"type": "Unigram", """ +
      s""""vocab": $entries}}"""
  }

  /** Parse a [[toTokenizerJson]] unigram model back: scores return to
    * micro-log2 by the inverse rounding (exact for values that came
    * from micros — `round(ln / ln 2 * 1e6)`). Truncated/malformed
    * input fails with a descriptive require, never an index error. */
  def fromTokenizerJson(json: String): Seq[Piece] = {
    val vKey = "\"vocab\":"
    val at = json.indexOf(vKey)
    require(at >= 0, "no vocab field")
    val open = json.indexOf('[', at)
    require(open >= 0, "truncated JSON: no vocab array")
    var i = open + 1
    val out = scala.collection.mutable.ArrayBuffer.empty[Piece]
    while ({
      while (i < json.length && json.charAt(i) != '[' &&
        json.charAt(i) != ']') i += 1
      require(i < json.length, "truncated JSON: unterminated vocab")
      json.charAt(i) == '['
    }) {
      val qStart = json.indexOf('"', i)
      require(qStart >= 0, "truncated JSON: vocab entry without piece")
      var j = qStart + 1
      val sb = new StringBuilder
      while (j < json.length && json.charAt(j) != '"') {
        if (json.charAt(j) == '\\') {
          require(j + 1 < json.length,
            "truncated JSON: escape at end of input")
          json.charAt(j + 1) match {
            case '"' => sb.append('"'); j += 2
            case '\\' => sb.append('\\'); j += 2
            case 'n' => sb.append('\n'); j += 2
            case 'r' => sb.append('\r'); j += 2
            case 't' => sb.append('\t'); j += 2
            case 'u' =>
              require(j + 6 <= json.length,
                "truncated JSON: incomplete \\u escape")
              sb.append(Integer.parseInt(
                json.substring(j + 2, j + 6), 16).toChar)
              j += 6
            case other => sb.append(other); j += 2
          }
        } else { sb.append(json.charAt(j)); j += 1 }
      }
      require(j < json.length, "truncated JSON: unterminated string")
      val comma = json.indexOf(',', j)
      require(comma >= 0, "truncated JSON: vocab entry without score")
      val close = json.indexOf(']', comma)
      require(close >= 0, "truncated JSON: unterminated vocab entry")
      val ln = json.substring(comma + 1, close).trim.toDoubleOption
        .getOrElse(
          throw new IllegalArgumentException(
            "malformed vocab score: " +
              json.substring(comma + 1, close).trim))
      out += Piece(sb.toString,
        StrictMath.round(ln / StrictMath.log(2.0) * 1e6))
      i = close + 1
    }
    out.toSeq
  }

  /** Closed-form vocabulary ids: pieces ranked by (logp_micros DESC,
    * piece ASC) get ids 0..n-1 — most probable piece = id 0, the
    * SentencePiece convention modulo reserved specials. Closed form
    * means a SQL oracle re-derives every id from the scored vocab
    * alone (the q127 property). */
  def vocabIds(pieces: Seq[Piece]): Map[String, Int] =
    pieces.sortBy(p => (-p.logpMicros, p.piece)).map(_.piece)
      .zipWithIndex.toMap

  /** [[encode]] + id lookup: the training-ready token-id stream
    * (idCol, pieces, n_pieces, score_micros, ids). The vocab rides
    * the plan as a literal map — one codegen'd `element_at` per
    * piece, no join, no shuffle, no UDF (the `Bpe.idsFromPieces`
    * convention); unknown single-char fallback pieces get id -1
    * (callers reserve a real unk id by adding the piece). */
  def encodeToIds(df: DataFrame, textCol: String, idCol: String,
      pieces: Seq[Piece], maxPieceLen: Int = 4,
      unkLogpMicros: Long = -100000000L): DataFrame = {
    val m = typedLit(vocabIds(pieces))
    encode(df, textCol, idCol, pieces, maxPieceLen, unkLogpMicros)
      .withColumn("ids", transform(col("pieces"),
        p => coalesce(element_at(m, p), lit(-1))))
  }
}
