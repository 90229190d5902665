package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed WORDPIECE tokenizer (Schuster & Nakajima 2012; BERT's
  * tokenizer) — the third major subword family beside [[Bpe]] and
  * [[Unigram]], completing the set a tokenizer-prep pipeline needs.
  *
  * TRAINING is BPE-shaped but LIKELIHOOD-driven: each round merges
  * the adjacent symbol pair maximizing
  * `score = count(ab) / (count(a) · count(b))` — the pair whose merge
  * most increases corpus likelihood under a unigram LM over symbols
  * (the published criterion; HuggingFace `tokenizers` implements the
  * same ratio). Scores quantize to integer micro-log2
  * (`round((log2(c_ab) − log2(c_a) − log2(c_b))·1e6)`, the q103
  * convention) so the argmax is exactly replayable cross-engine; ties
  * break by (pair count DESC, "left right" ASC). Symbolization is
  * BERT's: first character bare, every later character prefixed
  * `##`; a merge's symbol is `left + right.stripPrefix("##")`.
  *
  * ENCODING is greedy longest-match-first (the famous WordPiece
  * algorithm): at each position take the LONGEST vocabulary piece
  * matching (with the `##` prefix when not word-initial); any
  * position with no match maps the WHOLE word to `unkToken`, as does
  * a word longer than `maxInputChars` (BERT's 100-char guard).
  *
  * Scale shape — identical to [[Bpe]]: one token-scale histogram,
  * then every merge round works on DISTINCT WORDS only (pair + symbol
  * counts are map-side-combined sums; the 1-row argmax is
  * calibration-scale; the merge applies as the shared
  * [[Bpe.mergePairExpr]] fold). Encode is `mapPartitions` with the
  * broadcast vocabulary and a per-partition memo over the Zipfian
  * word repetition. */
object WordPiece {

  val ContinuationPrefix = "##"

  /** BERT symbolization as a pure Column expression: "low" →
    * ["l", "##o", "##w"] (split per code point, `##` on every
    * non-initial symbol). Replayable in SQL with the same two
    * regexps. */
  def wordPieceSymbols(word: Column): Column =
    split(regexp_replace(
      trim(regexp_replace(word, "(.)", "$1 ")), " ", " ##"), " ")

  /** Learned merge: rank (1-based), the pair, the merged symbol
    * (`left + right.stripPrefix("##")`), the pair count and the
    * micro-log2 likelihood score at merge time. */
  final case class Merge(rank: Int, left: String, right: String,
      merged: String, freq: Long, scoreMicros: Long)

  /** Train `numMerges` WordPiece merges over a word-frequency table.
    * Stops early when no pair reaches `minFreq`. */
  def trainFromWordCounts(words: DataFrame, wordCol: String,
      freqCol: String, numMerges: Int, minFreq: Long = 2L): Seq[Merge] = {
    require(numMerges > 0 && minFreq >= 1)
    var w = words
      .select(col(freqCol).cast("long").as("freq"),
        Bpe.requireSpaceFreeSyms(wordPieceSymbols(col(wordCol)))
          .as("syms"))
      .where(size(col("syms")) >= 2)
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (!done && merges.length < numMerges) {
      val n = size(col("syms"))
      // symbol counts of the CURRENT symbolization — the score's
      // denominator moves as merges absorb occurrences
      val symCounts = w
        .select(col("freq"), explode(col("syms")).as("s_"))
        .groupBy(col("s_")).agg(sum(col("freq")).as("cs_"))
      val pairCounts = w
        .select(col("freq"),
          slice(col("syms"), lit(1), greatest(n - 1, lit(0))).as("pv_"),
          slice(col("syms"), lit(2), greatest(n - 1, lit(0))).as("wv_"))
        .select(col("freq"),
          explode(arrays_zip(col("pv_"), col("wv_"))).as("p_"))
        .select(col("p_.pv_").as("l_"), col("p_.wv_").as("r_"),
          col("freq"))
        .groupBy(col("l_"), col("r_")).agg(sum(col("freq")).as("c_"))
      val best = pairCounts
        .join(symCounts.withColumnRenamed("s_", "l_")
          .withColumnRenamed("cs_", "cl_"), "l_")
        .join(symCounts.withColumnRenamed("s_", "r_")
          .withColumnRenamed("cs_", "cr_"), "r_")
        .withColumn("sm_", round(
          (log2(col("c_").cast("double")) -
            log2(col("cl_").cast("double")) -
            log2(col("cr_").cast("double"))) * 1e6).cast("long"))
        .orderBy(col("sm_").desc, col("c_").desc,
          concat_ws(" ", col("l_"), col("r_")))
        .limit(1)
        .select(col("l_"), col("r_"), col("c_"), col("sm_"))
        .collect()
      if (best.isEmpty || best.head.getLong(2) < minFreq) done = true
      else {
        val (l, r, c, sm) = (best.head.getString(0),
          best.head.getString(1), best.head.getLong(2),
          best.head.getLong(3))
        val merged = l + r.stripPrefix(ContinuationPrefix)
        merges += Merge(merges.length + 1, l, r, merged, c, sm)
        w = Bpe.mergeRound(w, l, r, merged)
      }
    }
    merges.toSeq
  }

  /** [[trainFromWordCounts]] from a corpus text column (lowercased
    * whitespace histogram, the [[Bpe.train]] shape). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 2L): Seq[Merge] = {
    val counts = df
      .select(explode(TextAnalysis.tokens(lower(col(textCol))))
        .as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    trainFromWordCounts(counts, "word", "freq", numMerges, minFreq)
  }

  /** The training corpus' base alphabet: every distinct symbol of the
    * initial symbolization, sorted — the vocab's fixed part. */
  def alphabet(words: DataFrame, wordCol: String): Seq[String] =
    words.select(explode(wordPieceSymbols(col(wordCol))).as("s_"))
      .where(col("s_") =!= "").distinct()
      .orderBy(col("s_"))
      .collect().map(_.getString(0)).toSeq

  /** Vocabulary in ID ORDER (the HF WordPiece-trainer convention):
    * special tokens in the given order, then the sorted alphabet,
    * then merged symbols in merge order. Closed form off
    * (specials, alphabet, merges) so an oracle re-derives every id. */
  def vocabIdOrder(alphabetSyms: Seq[String], merges: Seq[Merge],
      specialTokens: Seq[String] = Seq("[UNK]")): Seq[String] =
    // distinct keeps FIRST occurrence: two merges spelling the same
    // string (("a","##bc") and ("ab","##c") both make "abc") get one
    // id, at the earlier rank — deterministic and replayable
    (specialTokens ++ alphabetSyms ++
      merges.sortBy(_.rank).map(_.merged)).distinct

  /** Greedy longest-match-first segmentation of one word — the
    * published BERT algorithm. Returns `unk` alone when the word is
    * over `maxChars` or some position has no matching piece. */
  private[text] def encodeWord(word: String,
      vocab: java.util.HashSet[String], unk: String,
      maxChars: Int): Array[String] = {
    if (word.isEmpty) return Array.empty
    if (word.length > maxChars) return Array(unk)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var cur: String = null
      while (cur == null && end > start) {
        val sub =
          (if (start > 0) ContinuationPrefix else "") +
            word.substring(start, end)
        if (vocab.contains(sub)) cur = sub else end -= 1
      }
      if (cur == null) return Array(unk)
      out += cur
      start = end
    }
    out.toArray
  }

  // per-document piece computation shared by encode / encodeToIds:
  // whitespace pre-tokenization + the per-partition word memo around
  // encodeWord — ONE copy of the tokenization contract
  private def piecesOf(text: String,
      vocab: java.util.HashSet[String],
      memo: java.util.HashMap[String, Array[String]],
      unkToken: String, maxInputChars: Int): Array[String] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    toks.flatMap { w =>
      var p = memo.get(w)
      if (p == null) {
        p = encodeWord(w, vocab, unkToken, maxInputChars)
        memo.put(w, p)
      }
      p
    }
  }

  /** Tokenize every document: (idCol, pieces, n_pieces) —
    * `mapPartitions` with the broadcast vocabulary + per-partition
    * memo (the [[Bpe.encode]] contract). Null text → zero pieces. */
  def encode(df: DataFrame, textCol: String, idCol: String,
      vocab: Seq[String], unkToken: String = "[UNK]",
      maxInputChars: Int = 100): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab.toArray)
    val src = df
      .select(col(idCol).cast("long"),
        coalesce(lower(col(textCol)), lit("")))
      .as[(java.lang.Long, String)]
    src.mapPartitions { rows =>
      val v = new java.util.HashSet[String]()
      bc.value.foreach(v.add)
      val memo = new java.util.HashMap[String, Array[String]]()
      rows.map { case (id, text) =>
        val pieces = piecesOf(text, v, memo, unkToken, maxInputChars)
        (id, pieces, pieces.length.toLong)
      }
    }.toDF(idCol, "pieces", "n_pieces")
  }

  /** [[encode]] + closed-form ids off [[vocabIdOrder]]: the id lookup
    * rides [[encode]]'s own `mapPartitions` pass via a broadcast
    * `HashMap[piece, id]` — O(1) per piece. (A literal-map
    * `element_at` projection is array-backed: O(vocab) PER PIECE — at
    * a production 30k-piece vocabulary × hundreds of pieces per
    * document that is the measured 30× literal-collection trap the
    * `LanguageId` scaladoc documents; literal maps are only safe for
    * bounded per-TOKEN alphabets.) Unknown pieces cannot occur (every
    * emitted piece is in the vocab, [UNK] included). */
  def encodeToIds(df: DataFrame, textCol: String, idCol: String,
      vocabInIdOrder: Seq[String], unkToken: String = "[UNK]",
      maxInputChars: Int = 100): DataFrame = {
    require(vocabInIdOrder.contains(unkToken),
      "vocab must contain the unk token")
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocabInIdOrder.toArray)
    val src = df
      .select(col(idCol).cast("long"),
        coalesce(lower(col(textCol)), lit("")))
      .as[(java.lang.Long, String)]
    src.mapPartitions { rows =>
      val vocabArr = bc.value
      val v = new java.util.HashSet[String]()
      val idOf = new java.util.HashMap[String, Int]()
      var i = 0
      while (i < vocabArr.length) {
        v.add(vocabArr(i))
        idOf.put(vocabArr(i), i)
        i += 1
      }
      val memo = new java.util.HashMap[String, Array[String]]()
      rows.map { case (id, text) =>
        val pieces = piecesOf(text, v, memo, unkToken, maxInputChars)
        (id, pieces, pieces.length.toLong,
          pieces.map(p => idOf.get(p).intValue()))
      }
    }.toDF(idCol, "pieces", "n_pieces", "ids")
  }

  /** Serialize as a minimal HuggingFace-schema tokenizer.json
    * (`model.type` "WordPiece": vocab {piece: id}, unk_token,
    * continuing_subword_prefix, max_input_chars_per_word). */
  def toTokenizerJson(vocabInIdOrder: Seq[String],
      unkToken: String = "[UNK]", maxInputChars: Int = 100): String = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val vocabJson = vocabInIdOrder.zipWithIndex
      .map { case (p, id) => s""""${esc(p)}": $id""" }
      .mkString("{", ", ", "}")
    s"""{"version": "1.0", "model": {"type": "WordPiece", """ +
      s""""unk_token": "${esc(unkToken)}", """ +
      s""""continuing_subword_prefix": "$ContinuationPrefix", """ +
      s""""max_input_chars_per_word": $maxInputChars, """ +
      s""""vocab": $vocabJson}}"""
  }

  /** Parse a [[toTokenizerJson]] (or HF-emitted) WordPiece model:
    * (vocab in id order, unk token). Truncated/malformed input fails
    * with a descriptive require. */
  def fromTokenizerJson(json: String): (Seq[String], String) = {
    val uKey = "\"unk_token\":"
    val uAt = json.indexOf(uKey)
    require(uAt >= 0, "no unk_token field")
    val uStart = json.indexOf('"', uAt + uKey.length)
    val (unk, _) = Bpe.parseJsonString(json, uStart)
    val vKey = "\"vocab\":"
    val vAt = json.indexOf(vKey)
    require(vAt >= 0, "no vocab field")
    val open = json.indexOf('{', vAt)
    require(open >= 0, "truncated JSON: no vocab object")
    var i = open + 1
    val entries = scala.collection.mutable.ArrayBuffer
      .empty[(String, Int)]
    var done = false
    while (!done) {
      while (i < json.length && json.charAt(i) != '"' &&
        json.charAt(i) != '}') i += 1
      require(i < json.length, "truncated JSON: unterminated vocab")
      if (json.charAt(i) == '}') done = true
      else {
        val (piece, afterP) = Bpe.parseJsonString(json, i)
        val colonAt = json.indexOf(':', afterP)
        require(colonAt >= 0, "truncated JSON: vocab entry without id")
        var j = colonAt + 1
        while (j < json.length && json.charAt(j) == ' ') j += 1
        val idEnd0 = json.indexWhere(
          c => !c.isDigit, j)
        val idEnd = if (idEnd0 < 0) json.length else idEnd0
        require(idEnd > j,
          s"malformed vocab id near offset $j")
        entries += ((piece, json.substring(j, idEnd).toInt))
        i = idEnd
      }
    }
    (entries.sortBy(_._2).map(_._1).toSeq, unk)
  }
}
