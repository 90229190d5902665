package graft.text

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer TRAINING (Sennrich et al.
  * 2016) and application — the tokenizer-prep step of a training-data
  * pipeline, beyond the word-level [[Curation.vocabTopK]].
  *
  * Scale shape — the key property is that everything after the first
  * pass is CORPUS-SIZE INDEPENDENT:
  *  - one token-scale count builds the word histogram (map-side
  *    combined, the q100 shape);
  *  - each merge round then works on DISTINCT WORDS only: one explode
  *    + sum(freq) groupBy over adjacent symbol pairs (shuffle carries
  *    distinct-pair rows), a 1-row argmax to the driver (calibration
  *    scale, like every fit), and a pure row-expression greedy merge
  *    (an `aggregate` fold — no UDF). `localCheckpoint` per round
  *    bounds plan growth exactly like the cascade level chain.
  *  - applying the learned merges ([[encode]]) is `mapPartitions`
  *    with the rank table broadcast and a per-partition memo over
  *    repeated words — tokenizers are imperative library code, the
  *    same contract as the multimodal codecs.
  *
  * Determinism: the argmax tiebreak is (freq DESC, "left right" ASC) —
  * binary string order, identical in Spark and DuckDB — so the merge
  * sequence is unique under any partitioning.
  */
object Bpe {

  /** One space between every character — the default symbolizer
    * (exactly replayable in SQL via the same regexp). Callers with
    * non-ASCII corpora can pass their own `symbolize`. */
  def charSymbols(word: Column): Column =
    split(trim(regexp_replace(word, "(.)", "$1 ")), " ")

  /** End-of-word marker reserved by [[charSymbolsEow]] — symbols from
    * [[charSymbols]] are single code points, so the multi-char marker
    * can never collide with corpus text. */
  val EndOfWord = "</w>"

  /** [[charSymbols]] plus the `</w>` end-of-word marker — Sennrich's
    * ORIGINAL symbolization: word-final merges (e.g. `est</w>`) learn
    * separately from word-internal ones (`est` inside "established"),
    * and a piece sequence detokenizes unambiguously. Pair with
    * `encode(..., appendEow = true)`. */
  def charSymbolsEow(word: Column): Column =
    concat(charSymbols(word), array(lit(EndOfWord)))

  // ---------------------------------------------------------------
  // Byte-level BPE (the GPT-2 BBPE variant): train and encode over
  // the UTF-8 BYTES of the text, each byte bijectively mapped to a
  // printable BMP character so merges stay plain string symbols. No
  // input is unrepresentable — emoji, CJK, control bytes, mixed
  // encodings all reduce to the same 256-symbol base alphabet.
  // ---------------------------------------------------------------

  /** GPT-2's byte↔unicode bijection: printable latin-1 bytes
    * (`!`..`~`, `¡`..`¬`, `®`..`ÿ`) map to themselves; the other 68
    * (controls, space, DEL, C1, NBSP, SHY) shift to U+0100+i in
    * ascending byte order — so byte 0x20 becomes `Ġ` (U+0120), the
    * marker GPT-2 vocabularies are famous for. Closed form:
    * b<=32 → 256+b; 127<=b<=160 → 162+b; 173 → 323; else b. */
  val byteToChar: IndexedSeq[Char] = (0 until 256).map { b =>
    if (b <= 32) (256 + b).toChar
    else if (b >= 127 && b <= 160) (162 + b).toChar
    else if (b == 173) 323.toChar
    else b.toChar
  }

  /** Inverse of [[byteToChar]] (a bijection, so total on its image). */
  val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  // translate() source/target strings for the 68 remapped bytes —
  // the printable bytes pass through translate untouched
  private val remapFrom: String =
    (0 until 256).filter(b => byteToChar(b) != b.toChar)
      .map(_.toChar).mkString
  private val remapTo: String =
    (0 until 256).filter(b => byteToChar(b) != b.toChar)
      .map(byteToChar(_)).mkString

  /** Byte-level symbolizer as a pure Column expression: UTF-8 bytes
    * of the word, each mapped through [[byteToChar]], one symbol per
    * byte. `decode(…,'ISO-8859-1')` turns each byte into the
    * U+00–U+FF char of the same value, then one `translate` applies
    * the bijection — all codegen'd builtins, no UDF. Drop-in
    * `symbolize` for [[trainFromWordCounts]]. */
  def byteSymbols(word: Column): Column =
    charSymbols(translate(
      decode(org.apache.spark.sql.functions.encode(word, "UTF-8"),
        "ISO-8859-1"),
      remapFrom, remapTo))

  /** Imperative twin of [[byteSymbols]] for the encode path. */
  private[text] def symbolizeBytes(word: String): Array[String] = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = String.valueOf(byteToChar(bytes(i) & 0xff))
      i += 1
    }
    out
  }

  /** Inverse of the byte-level encode: map every piece's chars back
    * through [[charToByte]], concatenate the bytes, decode UTF-8.
    * Pieces in `specialTokens` pass through verbatim (they were never
    * byte-mapped). Exact round-trip of [[encodeBytes]]' output. */
  def decodePieces(pieces: Seq[String],
      specialTokens: Set[String] = Set.empty): String = {
    val bos = new java.io.ByteArrayOutputStream()
    val sb = new StringBuilder
    def flush(): Unit = if (bos.size() > 0) {
      sb.append(new String(bos.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8))
      bos.reset()
    }
    pieces.foreach { p =>
      if (specialTokens.contains(p)) { flush(); sb.append(p) }
      else p.foreach(c => bos.write(charToByte(c)))
    }
    flush()
    sb.toString
  }

  /** Greedy left-to-right single-pair merge as a pure fold expression:
    * [a, a, a] with pair (a, a) becomes [aa, a] — the non-overlapping
    * scan BPE training uses. State = (merged prefix, held symbol);
    * "" is a safe hold-sentinel because symbols are never empty. */
  def mergePairExpr(syms: Column, a: String, b: String): Column =
    mergePairExpr(syms, a, b, a + b)

  /** [[mergePairExpr]] with an explicit merged symbol — WordPiece
    * merges emit `a + b.stripPrefix("##")`, not the concatenation. */
  def mergePairExpr(syms: Column, a: String, b: String,
      merged: String): Column = {
    val folded = aggregate(syms,
      struct(array().cast("array<string>").as("out"), lit("").as("held")),
      (acc, s) => {
        val out = acc.getField("out")
        val held = acc.getField("held")
        when(held === lit(a) && s === lit(b),
          struct(concat(out, array(lit(merged))).as("out"),
            lit("").as("held")))
          .otherwise(struct(
            when(held === lit(""), out)
              .otherwise(concat(out, array(held))).as("out"),
            s.as("held")))
      },
      acc => when(acc.getField("held") === lit(""), acc.getField("out"))
        .otherwise(concat(acc.getField("out"),
          array(acc.getField("held")))))
    folded
  }

  /** [[mergePairExpr]]'s greedy non-overlapping left-to-right merge
    * as ONE codegen'd `regexp_replace` over the space-joined symbol
    * string — bit-identical to the fold (property-pinned against it
    * in BpeSpec) at a fraction of the cost: the fold is an
    * interpreted higher-order aggregate whose per-round expression
    * tree also dominates the trainers' plan/codegen time. Java's
    * `replaceAll` scans left-to-right and resumes AFTER each match,
    * which is exactly the fold's non-overlapping greedy scan; the
    * `(?<=^| )`/`(?= |$)` lookarounds anchor both symbols on
    * separator boundaries without consuming them, so adjacent
    * occurrences (`a a a a` under pair (a,a)) still both merge.
    *
    * PRECONDITION (validated once by the trainers at histogram
    * build): no symbol contains the `' '` separator — true of every
    * symbolizer here, since they all SPLIT on spaces. Defined only
    * for non-empty symbol arrays (the trainers never shrink a word
    * below one symbol). */
  def mergePairFast(syms: Column, a: String, b: String,
      merged: String): Column = {
    val pat = "(?<=^| )" +
      java.util.regex.Pattern.quote(a + " " + b) + "(?= |$)"
    val rep = java.util.regex.Matcher.quoteReplacement(merged)
    split(regexp_replace(concat_ws(" ", syms), pat, rep), " ")
  }

  /** Loud once-per-train guard for [[mergePairFast]]'s separator
    * precondition, applied to the symbolized histogram: a custom
    * `symbolize` emitting a space-bearing symbol would silently
    * corrupt the string-form merge, so it fails at build instead. */
  private[text] def requireSpaceFreeSyms(syms: Column): Column =
    when(exists(syms, s => instr(s, " ") > 0),
      raise_error(concat(
        lit("bpe train: symbolize produced a symbol containing the " +
          "' ' separator in "),
        concat_ws(" ", syms),
        lit(" — space-free symbols are required"))).cast("array<string>"))
      .otherwise(syms)

  /** Learned merge table: rank (1-based, merge order), the pair, the
    * merged symbol, and the pair's frequency at merge time. */
  final case class Merge(rank: Int, left: String, right: String,
      merged: String, freq: Long)

  /** Train `numMerges` BPE merges over a word-frequency table
    * (`wordCol`, `freqCol`). Stops early when no pair reaches
    * `minFreq`. See object doc for the per-round plan shape. */
  def trainFromWordCounts(words: DataFrame, wordCol: String,
      freqCol: String, numMerges: Int, minFreq: Long = 2L,
      symbolize: Column => Column = charSymbols): Seq[Merge] = {
    require(numMerges > 0 && minFreq >= 1)
    // the guard runs once here, over the histogram — every later
    // round works on merge outputs of already-validated symbols
    var w = words
      .select(col(freqCol).cast("long").as("freq"),
        requireSpaceFreeSyms(symbolize(col(wordCol))).as("syms"))
      .where(size(col("syms")) >= 2)
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (!done && merges.length < numMerges) {
      val n = size(col("syms"))
      val best = w
        .select(col("freq"),
          slice(col("syms"), lit(1), greatest(n - 1, lit(0))).as("pv_"),
          slice(col("syms"), lit(2), greatest(n - 1, lit(0))).as("wv_"))
        .select(col("freq"),
          explode(arrays_zip(col("pv_"), col("wv_"))).as("p_"))
        .select(col("p_.pv_").as("l_"), col("p_.wv_").as("r_"),
          col("freq"))
        .groupBy(col("l_"), col("r_")).agg(sum(col("freq")).as("c_"))
        .orderBy(col("c_").desc, concat_ws(" ", col("l_"), col("r_")))
        .limit(1)
        .collect()
      if (best.isEmpty || best.head.getLong(2) < minFreq) done = true
      else {
        val (l, r, c) = (best.head.getString(0), best.head.getString(1),
          best.head.getLong(2))
        merges += Merge(merges.length + 1, l, r, l + r, c)
        w = mergeRound(w, l, r, l + r)
      }
    }
    merges.toSeq
  }

  /** One trainer round's merge application: the codegen'd string-form
    * merge ([[mergePairFast]]), gated per word by a plain substring
    * pre-check (`instr` is a SUPERSET test — a word without the
    * joined pair substring anywhere cannot contain the adjacent pair,
    * so it skips the regex untouched; a boundary-crossing false
    * positive just runs a regex that matches nothing). The checkpoint
    * is LAZY: the logical lineage is cut either way (the plan becomes
    * an RDD scan immediately), and materialization rides the next
    * round's pair-count job instead of paying a dedicated job per
    * round — the trainers are stage-latency-bound at fixture scale. */
  private[text] def mergeRound(w: DataFrame, l: String, r: String,
      merged: String): DataFrame = {
    val pat = "(?<=^| )" +
      java.util.regex.Pattern.quote(l + " " + r) + "(?= |$)"
    val rep = java.util.regex.Matcher.quoteReplacement(merged)
    w.select(col("freq"), col("syms"),
        concat_ws(" ", col("syms")).as("j_"))
      .select(col("freq"),
        when(instr(col("j_"), l + " " + r) === 0, col("syms"))
          .otherwise(split(regexp_replace(col("j_"), pat, rep), " "))
          .as("syms"))
      .localCheckpoint(false)
  }

  /** [[trainFromWordCounts]] straight from a corpus text column: one
    * token-scale histogram count, then distinct-word-scale rounds. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 2L,
      symbolize: Column => Column = charSymbols): Seq[Merge] = {
    val counts = df
      .select(explode(TextAnalysis.tokens(lower(col(textCol))))
        .as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    trainFromWordCounts(counts, "word", "freq", numMerges, minFreq,
      symbolize)
  }

  /** Byte-level training (GPT-2 BBPE) from a corpus text column:
    * CASE-PRESERVING whitespace word histogram (byte-level's point is
    * that no input needs normalizing away), then the same
    * distinct-word-scale merge rounds over [[byteSymbols]]. Words
    * equal to a reserved `specialTokens` entry are excluded from the
    * histogram — specials are vocabulary entries, never merge fodder.
    * Plan shape identical to [[train]]. */
  def trainBytes(df: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 2L,
      specialTokens: Seq[String] = Nil): Seq[Merge] = {
    val counts = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .where(col("word") =!= "" &&
        !col("word").isin(specialTokens: _*))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    trainFromWordCounts(counts, "word", "freq", numMerges, minFreq,
      byteSymbols)
  }

  /** GPT-2's pre-tokenizer shape, simplified to the part that matters
    * for lossless round-trips: ` ?\S+` (a run of non-space, keeping
    * ONE preceding space — the `Ġ`-prefix convention), else a
    * whitespace run that donates its last space to a following
    * non-space run (`\s+(?!\S)|\s+`). Concatenating the tokens
    * reproduces the input byte-for-byte. */
  private val Gpt2PreTok =
    java.util.regex.Pattern.compile(""" ?\S+|\s+(?!\S)|\s+""")

  private[text] def preTokenizeGpt2(text: String): Iterator[String] = {
    val m = Gpt2PreTok.matcher(text)
    new Iterator[String] {
      private var has = m.find()
      def hasNext: Boolean = has
      def next(): String = { val g = m.group(); has = m.find(); g }
    }
  }

  /** Byte-level tokenize (GPT-2 BBPE): returns (idCol, pieces
    * array<string>, n_pieces). Case-preserving and LOSSLESS —
    * [[decodePieces]] of the output reproduces the input text
    * exactly, whatever bytes it holds. `specialTokens` are matched
    * verbatim (leftmost, longest-first) before any splitting and
    * emitted as single unsplit pieces — the `<|endoftext|>`
    * reservation. `preTokenizer`: "gpt2" (default — space-prefix
    * convention, lossless on any whitespace) or "whitespace" (the
    * library's standard split; lossless only up to single-space
    * joining, but exactly replayable in SQL — the q123/q124 oracle
    * path). Same mapPartitions + broadcast + memo shape as
    * [[encode]]. */
  def encodeBytes(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge], specialTokens: Seq[String] = Nil,
      preTokenizer: String = "gpt2"): DataFrame = {
    require(preTokenizer == "gpt2" || preTokenizer == "whitespace",
      s"unknown preTokenizer: $preTokenizer")
    val spark = df.sparkSession
    import spark.implicits._
    val table: IndexedSeq[(String, String)] =
      merges.sortBy(_.rank).map(m => (m.left, m.right)).toIndexedSeq
    val bc = spark.sparkContext.broadcast(table)
    // longest-first so an overlapping shorter special can't shadow a
    // longer one at the same position
    val specials = specialTokens.sortBy(-_.length).toArray
    val ws = preTokenizer == "whitespace"
    val src: Dataset[(java.lang.Long, String)] = df
      .select(col(idCol).cast("long"),
        coalesce(col(textCol), lit("")))
      .as[(java.lang.Long, String)]
    src.mapPartitions { rows =>
      val t = bc.value
      val memo = new java.util.HashMap[String, Array[String]]()
      def enc(word: String): Array[String] = {
        var p = memo.get(word)
        if (p == null) {
          p = applyMerges(symbolizeBytes(word), t)
          memo.put(word, p)
        }
        p
      }
      def segPieces(seg: String): Iterator[Array[String]] =
        if (ws) seg.trim.split("\\s+").iterator
          .filter(_.nonEmpty).map(enc)
        else preTokenizeGpt2(seg).map(enc)
      rows.map { case (id, text) =>
        val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
        var pos = 0
        while (pos < text.length) {
          // next special occurrence at or after pos, if any
          var bestAt = -1; var bestTok: String = null
          var si = 0
          while (si < specials.length) {
            val at = text.indexOf(specials(si), pos)
            if (at >= 0 && (bestAt < 0 || at < bestAt)) {
              bestAt = at; bestTok = specials(si)
            }
            si += 1
          }
          if (bestAt < 0) {
            segPieces(text.substring(pos)).foreach(pieces ++= _)
            pos = text.length
          } else {
            if (bestAt > pos)
              segPieces(text.substring(pos, bestAt))
                .foreach(pieces ++= _)
            pieces += bestTok
            pos = bestAt + bestTok.length
          }
        }
        (id, pieces.toArray, pieces.length.toLong)
      }
    }.toDF(idCol, "pieces", "n_pieces")
  }

  /** The merge table as a DataFrame (rank, left, right, merged, freq)
    * — the stored-artifact form consumers gate and ship. */
  def mergesToDf(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
      .select(col("rank").cast("long").as("rank"), col("left"),
        col("right"), col("merged"), col("freq"))
  }

  /** GPT-2-convention vocabulary off a byte-level merge list: ids
    * 0..255 are the 256 base byte symbols in byte order, then one id
    * per merge RESULT in rank order, then the reserved specials LAST
    * (`<|endoftext|>` = 50256 in the published GPT-2 vocab — after
    * every merge). Deterministic and closed-form: the id of any piece
    * is derivable from (byte value | merge rank | special index)
    * alone, which is what lets a SQL oracle replay ids without
    * shipping the map. */
  def vocabBytes(merges: Seq[Merge],
      specialTokens: Seq[String] = Nil): Map[String, Int] = {
    val base = (0 until 256).map(b => String.valueOf(byteToChar(b)))
    val merged = merges.sortBy(_.rank).map(_.merged)
    require(merged.distinct.length == merged.length,
      "merge results must be unique")
    val specials = specialTokens.distinct
    ((base ++ merged ++ specials).zipWithIndex).toMap
  }

  /** [[vocabBytes]] as a (id, piece) DataFrame — the stored-artifact
    * form a tokenizer ships with its model. */
  def vocabBytesDf(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge],
      specialTokens: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    vocabBytes(merges, specialTokens).toSeq.sortBy(_._2)
      .map { case (p, id) => (id, p) }.toDF("id", "piece")
  }

  /** Map an encoded `pieces` array to vocabulary ids as a pure Column
    * expression: the vocab rides the plan as a literal map (vocab
    * size is model-scale, thousands of entries — the `linearScore`
    * model-as-literal convention), so the lookup is one codegen'd
    * `element_at` per piece — no join, no shuffle, no UDF. A piece
    * outside the vocab (impossible for byte-level output encoded with
    * the SAME merges/specials) fails loudly. */
  def idsFromPieces(pieces: Column, vocab: Map[String, Int]): Column = {
    val m = typedLit(vocab)
    transform(pieces, p =>
      when(element_at(m, p).isNull,
        raise_error(concat(lit("piece not in vocab: "), p)))
        .otherwise(element_at(m, p)))
  }

  /** [[encodeBytes]] + [[idsFromPieces]]: the training-ready token-id
    * stream (idCol, pieces, n_pieces, ids). One mapPartitions scan
    * plus a codegen'd projection — nothing extra moves. */
  def encodeBytesToIds(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge], specialTokens: Seq[String] = Nil,
      preTokenizer: String = "gpt2"): DataFrame =
    encodeBytes(df, textCol, idCol, merges, specialTokens, preTokenizer)
      .withColumn("ids",
        idsFromPieces(col("pieces"),
          vocabBytes(merges, specialTokens)))

  // ---------------------------------------------------------------
  // BPE-dropout (Provilkov et al. 2020): subword regularization for
  // the BPE family — during encode, each merge is SKIPPED with
  // probability p per (document, token position, rank), so the same
  // word tokenizes into different valid piece sequences across
  // occurrences and the downstream model sees segmentation variety.
  // The draw is the library's PORTABLE md5 uniform (Draws.md5Uniform
  // shape: first 8 md5 hex chars of "seed|doc|pos|rank", (h+1)/(2^32
  // +2)) — dropout runs at augmentation time where the md5 cost is
  // immaterial, and using the portable draw means the ORACLE replays
  // the production path itself: no xxhash twin needed, every dropped
  // merge and every piece hash-checks cross-engine (q137).
  // ---------------------------------------------------------------

  private[text] def md5UniformJvm(seed: Long, parts: Seq[Any])
      : Double = {
    val s = (seed.toString +: parts.map(_.toString)).mkString("|")
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 4) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v.toDouble + 1.0) / 4294967298.0
  }

  private[text] def applyMergesMask(syms0: Array[String],
      merges: IndexedSeq[(String, String)],
      dropped: Int => Boolean): Array[String] = {
    var syms = syms0
    var k = 0
    while (k < merges.length && syms.length >= 2) {
      if (!dropped(k)) {
        val (a, b) = merges(k)
        val out = new scala.collection.mutable.ArrayBuffer[String](
          syms.length)
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a &&
              syms(i + 1) == b) {
            out += a + b
            i += 2
          } else {
            out += syms(i)
            i += 1
          }
        }
        syms = out.toArray
      }
      k += 1
    }
    syms
  }

  /** Byte-level encode with BPE-dropout: merge rank k is skipped for
    * the token at 1-based position `pos` of document `id` when
    * `md5Uniform(seed, id, pos, k+1) < p`. Whitespace pre-tokenizer
    * (trimmed `\s+` split — positions match the SQL oracle's array
    * indices); p = 0 reproduces [[encodeBytes]]' whitespace path
    * exactly. No memo: the mask varies per occurrence by design.
    * Returns (idCol, pieces, n_pieces). */
  def encodeBytesDropout(df: DataFrame, textCol: String,
      idCol: String, merges: Seq[Merge], p: Double,
      seed: Long): DataFrame = {
    require(p >= 0 && p < 1, "dropout p in [0,1)")
    val spark = df.sparkSession
    import spark.implicits._
    val table: IndexedSeq[(String, String)] =
      merges.sortBy(_.rank).map(m => (m.left, m.right)).toIndexedSeq
    val bc = spark.sparkContext.broadcast(table)
    val src = df
      .select(col(idCol).cast("long"),
        coalesce(col(textCol), lit("")))
      .as[(java.lang.Long, String)]
    src.mapPartitions { rows =>
      val t = bc.value
      rows.map { case (id, text) =>
        val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
        val toks = text.trim.split("\\s+")
        var pos = 0
        while (pos < toks.length) {
          val tok = toks(pos)
          if (tok.nonEmpty) {
            val docPos = pos + 1 // 1-based, the oracle's array index
            pieces ++= applyMergesMask(symbolizeBytes(tok), t,
              k => md5UniformJvm(seed,
                Seq(id, docPos, k + 1)) < p)
          }
          pos += 1
        }
        (id, pieces.toArray, pieces.length.toLong)
      }
    }.toDF(idCol, "pieces", "n_pieces")
  }

  // ---------------------------------------------------------------
  // tokenizer.json interop — the HuggingFace `tokenizers` on-disk
  // format (a PUBLIC json schema: {model: {type: "BPE", vocab:
  // {piece: id}, merges: ["l r", …]}, added_tokens: […]}). A
  // tokenizer trained here at corpus scale exports to the file every
  // inference stack loads; `fromTokenizerJson` round-trips it back.
  // ---------------------------------------------------------------

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Serialize a byte-level model ([[trainBytes]] merges + specials)
    * as a minimal HuggingFace-schema tokenizer.json: the [[vocabBytes]]
    * id convention, merges in rank order, specials as added_tokens
    * with their ids. Deterministic output (vocab sorted by id). */
  def toTokenizerJson(merges: Seq[Merge],
      specialTokens: Seq[String] = Nil): String = {
    val vocab = vocabBytes(merges, specialTokens)
    val vocabJson = vocab.toSeq.sortBy(_._2)
      .map { case (p, id) => s""""${jsonEscape(p)}": $id""" }
      .mkString("{", ", ", "}")
    val mergesJson = merges.sortBy(_.rank)
      .map(m => s""""${jsonEscape(m.left)} ${jsonEscape(m.right)}"""")
      .mkString("[", ", ", "]")
    val added = specialTokens.distinct.map { t =>
      s"""{"id": ${vocab(t)}, "content": "${jsonEscape(t)}", """ +
        """"special": true}"""
    }.mkString("[", ", ", "]")
    s"""{"version": "1.0", "added_tokens": $added, """ +
      s""""model": {"type": "BPE", "vocab": $vocabJson, """ +
      s""""merges": $mergesJson}}"""
  }

  private def jsonUnescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16)
              .toChar)
            i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // a json STRING literal (handles escapes), returning (value, end).
  // Bounds-checked: truncated input fails with a descriptive require,
  // not a StringIndexOutOfBoundsException.
  private[text] def parseJsonString(s: String, start: Int)
      : (String, Int) = {
    require(start >= 0 && start < s.length &&
      s.charAt(start) == '"', s"expected JSON string at offset $start")
    var i = start + 1
    val sb = new StringBuilder
    while (i < s.length && s.charAt(i) != '"') {
      if (s.charAt(i) == '\\') {
        sb.append(s.charAt(i)); i += 1
        require(i < s.length, "truncated JSON: escape at end of input")
      }
      sb.append(s.charAt(i)); i += 1
    }
    require(i < s.length, "truncated JSON: unterminated string")
    (jsonUnescape(sb.toString), i + 1)
  }

  private def skipJsonFiller(s: String, start: Int): Int = {
    var i = start
    while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == ',' ||
      s.charAt(i) == '\n' || s.charAt(i) == '\r' ||
      s.charAt(i) == '\t')) i += 1
    i
  }

  /** Parse a tokenizer.json produced by [[toTokenizerJson]] or by
    * HuggingFace `tokenizers` — BOTH merge serializations are
    * accepted: the classic `"left right"` string form and the
    * two-element array form `["left", "right"]` that tokenizers
    * >= 0.14 emits. Returns (merges in rank order, special tokens).
    * The merge frequencies aren't stored by the format (they're
    * training metadata) and come back as 0. Malformed/truncated input
    * fails with a descriptive require message. */
  def fromTokenizerJson(json: String): (Seq[Merge], Seq[String]) = {
    // merges array: the "merges": [ … ] slice
    val mKey = "\"merges\":"
    val mAt = json.indexOf(mKey)
    require(mAt >= 0, "no merges field")
    val open = json.indexOf('[', mAt)
    require(open >= 0, "no merges array")
    var i = open + 1
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (!done) {
      i = skipJsonFiller(json, i)
      require(i < json.length, "truncated JSON: unterminated merges")
      json.charAt(i) match {
        case ']' => done = true
        case '"' => // "left right" string form
          val (pair, after) = parseJsonString(json, i)
          i = after
          val sp = pair.lastIndexOf(' ')
          require(sp > 0, s"malformed merge: $pair")
          val (l, r) = (pair.substring(0, sp), pair.substring(sp + 1))
          merges += Merge(merges.length + 1, l, r, l + r, 0L)
        case '[' => // ["left", "right"] array form (tokenizers >=0.14)
          i = skipJsonFiller(json, i + 1)
          val (l, afterL) = parseJsonString(json, i)
          i = skipJsonFiller(json, afterL)
          val (r, afterR) = parseJsonString(json, i)
          i = skipJsonFiller(json, afterR)
          require(i < json.length && json.charAt(i) == ']',
            s"malformed merge entry near offset $i: expected ]")
          i += 1
          merges += Merge(merges.length + 1, l, r, l + r, 0L)
        case other =>
          require(false,
            s"unexpected '$other' in merges array at offset $i")
      }
    }
    // added_tokens contents
    val specials = scala.collection.mutable.ArrayBuffer.empty[String]
    val aKey = "\"added_tokens\":"
    val aAt = json.indexOf(aKey)
    if (aAt >= 0) {
      var j = json.indexOf('[', aAt) + 1
      val end = json.indexOf(']', j)
      while (j < end) {
        val cAt = json.indexOf("\"content\":", j)
        if (cAt < 0 || cAt > end) j = end
        else {
          val vStart = json.indexOf('"', cAt + 10)
          val (tok, after) = parseJsonString(json, vStart)
          specials += tok
          j = after
        }
      }
    }
    (merges.toSeq, specials.toSeq)
  }

  /** Imperative single-word tokenizer: apply merges in RANK order,
    * each as a greedy left-to-right pass — the exact replay of
    * training, so encoding a training word reproduces its final
    * training symbolization. Splits by CODE POINT, matching
    * [[charSymbols]]' regex semantics (Java regex `.` matches a code
    * point) — a UTF-16 unit split would symbolize supplementary-plane
    * text differently than training and emit lone-surrogate pieces. */
  private[text] def encodeWord(word: String,
      merges: IndexedSeq[(String, String)],
      appendEow: Boolean = false): Array[String] = {
    var syms = {
      val out = new scala.collection.mutable.ArrayBuffer[String](
        word.length + 1)
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      if (appendEow) out += EndOfWord
      out.toArray
    }
    applyMerges(syms, merges)
  }

  /** Apply merges in RANK order, each as a greedy left-to-right
    * non-overlapping pass — the exact replay of training. Shared by
    * the char-level and byte-level encoders. */
  private[text] def applyMerges(syms0: Array[String],
      merges: IndexedSeq[(String, String)]): Array[String] = {
    var syms = syms0
    var k = 0
    while (k < merges.length && syms.length >= 2) {
      val (a, b) = merges(k)
      val out = new scala.collection.mutable.ArrayBuffer[String](
        syms.length)
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += a + b
          i += 2
        } else {
          out += syms(i)
          i += 1
        }
      }
      syms = out.toArray
      k += 1
    }
    syms
  }

  /** Tokenize every document with a trained merge list: returns
    * (idCol, pieces array<string>, n_pieces). `mapPartitions` with
    * the rank table broadcast; a per-partition memo collapses the
    * Zipfian word repetition (the standard tokenizer-cache shape).
    * Set `appendEow` when the merges were trained with
    * [[charSymbolsEow]] — the symbolizations must match or word-final
    * merges never fire. */
  def encode(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge], appendEow: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val table: IndexedSeq[(String, String)] =
      merges.sortBy(_.rank).map(m => (m.left, m.right)).toIndexedSeq
    val bc = spark.sparkContext.broadcast(table)
    // null-tolerant like the library's SQL operators: a NULL text
    // encodes to zero pieces, a NULL id passes through as null
    val src: Dataset[(java.lang.Long, String)] = df
      .select(col(idCol).cast("long"),
        coalesce(lower(col(textCol)), lit("")))
      .as[(java.lang.Long, String)]
    src.mapPartitions { rows =>
      val t = bc.value
      val memo = new java.util.HashMap[String, Array[String]]()
      rows.map { case (id, text) =>
        val toks = text.trim.split("\\s+").filter(_.nonEmpty)
        val pieces = toks.flatMap { w =>
          var p = memo.get(w)
          if (p == null) {
            p = encodeWord(w, t, appendEow); memo.put(w, p)
          }
          p
        }
        (id, pieces, pieces.length.toLong)
      }
    }.toDF(idCol, "pieces", "n_pieces")
  }
}
