package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting. All pure
  * Column expressions — whole-stage codegen'd, shuffle-free per-row work
  * that scales linearly over any partitioning of a 100 TB corpus. */
object TextAnalysis {

  /** whitespace tokens */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: runs of letters, digits, or single other
    * chars (common pre-tokenizer shape). */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?<=[^\\p{L}\\p{N}])|(?=[^\\p{L}\\p{N}])"),
      t => length(trim(t)) > 0))

  /** CCNet-style text normalization BEFORE hashing/dedup: lowercase,
    * fold typographic punctuation onto ASCII (curly quotes, en/em
    * dashes, ellipsis, NBSP), collapse whitespace runs to one space,
    * trim. Two near-duplicate pages that differ only in smart-quote
    * rendering or spacing normalize to the SAME bytes, which is what
    * makes exact/minhash dedup robust on web text. A pure codegen'd
    * row expression; the char fold is a 1:1 `translate`, replayable
    * verbatim in SQL. `foldDigits` additionally maps every ASCII
    * digit to '0' \u2014 CCNet's number normalization for DEDUP KEYS
    * (pages differing only in dates/counters hash together); keep it
    * off when the normalized text is the stored body. `nfkc` runs
    * Unicode NFKC FIRST (the SentencePiece order \u2014 full-width
    * forms, ligatures, compatibility chars, decomposed accents fold
    * to one canonical sequence) via the native codegen'd
    * [[graft.functions.NfkcNormalize]] expression; it is off by
    * default because the plain chain is byte-replayable in any SQL
    * engine while NFKC is oracle-checked from construction-keyed
    * fixtures. */
  def normalizeText(text: Column, foldDigits: Boolean = false,
      nfkc: Boolean = false): Column = {
    val in = if (nfkc) graft.functions.NfkcNormalize.nfkc(text) else text
    val base = trim(regexp_replace(
      translate(lower(in),
        "\u2019\u2018\u201C\u201D\u2013\u2014\u2026\u00A0",
        "''\"\"--. "),
      "\\s+", " "))
    if (foldDigits) regexp_replace(base, "[0-9]", "0") else base
  }

  private val punctClass = "[.,!?;:'\"()\\-]"

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, punctClass, ""))

  /** per-language stopword seed sets (tiny, embedded) */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "of", "and", "to", "in", "is", "it",
      "that", "for", "on", "with", "as", "this"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "en", "es", "que",
      "un", "una", "por", "con", "para", "del"),
    "de" -> Seq("der", "die", "das", "und", "in", "ist", "von", "mit",
      "den", "zu", "ein", "eine", "auf", "für", "im"),
    "fr" -> Seq("le", "la", "les", "de", "et", "en", "est", "que", "un",
      "une", "pour", "dans", "du", "des", "au"))

  def stopwordCount(text: Column, lang: String): Column =
    size(filter(tokens(lower(text)),
      t => t.isin(stopwords(lang).map(x => x: Any): _*)))

  def stopwordRatio(text: Column, lang: String = "en"): Column =
    stopwordCount(text, lang) / greatest(tokenCount(text), lit(1))

  /** CJK character count (for zh detection) */
  def cjkCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", ""))

  /** Heuristic language ID over stopword hits + CJK density. Returns the
    * language code with the most evidence ('und' when none). */
  def languageId(text: Column): Column = {
    val counts = stopwords.keys.toSeq.sorted.map(l =>
      l -> stopwordCount(text, l))
    val cjk = cjkCount(text)
    // zh wins when any CJK present; otherwise argmax of stopword hits
    val maxHits = greatest(counts.map(_._2): _*)
    val best = counts.foldRight(lit("und")) { case ((l, c), acc) =>
      when(c === maxHits && maxHits > 0, l).otherwise(acc)
    }
    when(cjk > 0, "zh").otherwise(best)
  }

  /** Rule-based SENTENCE segmentation — the granularity C4-style
    * sentence filters, sentence-level dedup, and boundary-respecting
    * chunkers work at. A boundary is a run of `.!?` followed by
    * whitespace and an uppercase letter or digit; dots of common
    * abbreviations (mr/mrs/dr/prof/etc/e.g/i.e/vs) do NOT split, and
    * `no.`/`st.` are protected ONLY when a digit follows ("item
    * no. 3", "St. 2") — as plain words they end sentences far more
    * often than they abbreviate ("She said no. They left." MUST
    * split). Known trade-off of the digit-only rule: Saint/Street
    * names before a capital ("St. Paul", "Main St. Suite 4" without
    * a digit) now split — rule-based segmentation cannot satisfy
    * both "said no. They" and "St. Paul" without a lexicon; the
    * digit rule optimizes for the far more frequent plain-word case
    * and is what the q146-q149 oracles replay. RE2-COMPATIBLE by
    * construction (no lookarounds — RE2 has
    * none, and the oracle replays in DuckDB's RE2): abbreviation dots
    * are first PROTECTED behind a sentinel, boundaries are marked by
    * re-emitting the matched context around a second sentinel, then
    * the text splits on the marker and sentinels restore. Sentinels
    * are C0 controls (U+0001/U+0002) — stripped from the input first
    * so adversarial bytes can't forge boundaries. Pure codegen'd
    * row expressions; empty/null text yields an empty array. */
  def sentences(text: Column): Column = {
    val clean = regexp_replace(coalesce(text, lit("")),
      "[\\x01\\x02]", "")
    val protectAbbrev0 = regexp_replace(clean,
      "(?i)\\b(mr|mrs|ms|dr|prof|etc|e\\.g|i\\.e|vs)\\.",
      "$1\u0002")
    val protectAbbrev = regexp_replace(protectAbbrev0,
      "(?i)\\b(no|st)\\.(\\s*[0-9])", "$1\u0002$2")
    val marked = regexp_replace(protectAbbrev,
      "([.!?]+)\\s+(\\p{Lu}|[0-9])", "$1\u0001$2")
    filter(
      transform(split(marked, "\u0001"),
        s => trim(regexp_replace(s, "\u0002", "."))),
      s => s =!= "")
  }

  def sentenceCount(text: Column): Column = size(sentences(text))

  /** Composite quality score in [0, 1]: length sweet-spot, moderate
    * punctuation, healthy stopword ratio, reasonable mean word length. */
  def qualityScore(text: Column, lang: String = "en"): Column = {
    val nChars = length(text)
    val nTokens = greatest(tokenCount(text), lit(1))
    val meanWordLen = nChars.cast("double") / nTokens
    val punctRatio = punctCount(text).cast("double") / nChars
    val swRatio = stopwordRatio(text, lang)
    val lenScore = least(nChars / lit(200.0), lit(1.0))
    val wordLenScore =
      when(meanWordLen.between(3.0, 12.0), 1.0).otherwise(0.3)
    val punctScore = when(punctRatio <= 0.2, 1.0).otherwise(0.4)
    val swScore = least(swRatio * 5.0, lit(1.0))
    (lenScore * 0.3 + wordLenScore * 0.2 + punctScore * 0.2 +
      swScore * 0.3)
  }

  /** Document fingerprint: 64-bit content hash of the
    * whitespace-normalized lowercased text (stable across partitioning,
    * suitable as an exact-dup key at any scale). */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Rolling-window fingerprint: min/max xxhash over word shingles —
    * robust to small edits (winnowing-style). */
  def rollingFingerprint(text: Column, k: Int = 3): Column = {
    val sh = wordShingles(text, k)
    array_min(transform(sh, s => xxhash64(s)))
  }

  /** [[rollingFingerprint]] over an already-materialized shingle array,
    * with a cross-engine-portable hash (md5 hex string): two documents
    * share the fingerprint iff they share their lexicographically
    * minimal shingle hash — a near-dup blocking key whose block sizes
    * track clone-cluster sizes, not corpus size. Probability two docs
    * at jaccard j share it is ~j (the minhash identity). */
  def rollingFingerprintFromShingles(sh: Column): Column =
    array_min(transform(sh, s => md5(to_binary(s, lit("utf-8")))))

  /** Occurrence count of the most frequent element of an
    * already-materialized array column (pass a bound column, not an
    * inline expression — lambda bodies re-evaluate captures per
    * element). Per-row O(distinct·n) compares; shuffle-free. */
  def topCount(arr: Column): Column =
    array_max(transform(array_distinct(arr),
      x => size(filter(arr, y => y === x))))

  /** Number of array elements whose value occurs more than once —
    * the numerator of Gopher-style duplicate n-gram fractions. */
  def dupCount(arr: Column): Column =
    size(filter(arr, x => size(filter(arr, y => y === x)) > 1))

  /** word k-grams from an already-materialized token array column.
    * IMPORTANT for plans: pass a bound column (e.g. via withColumn), not
    * an inline `split` expression — the lambda body re-evaluates its
    * captured expressions per element, so an inlined split would cost
    * O(tokens²) per row. With an attribute reference it's O(tokens). */
  def shinglesFromTokens(t: Column, k: Int = 3): Column =
    transform(sequence(lit(1), greatest(size(t) - (k - 1), lit(1))),
      j => concat_ws(" ",
        (0 until k).map(o => try_element_at(t, j + o)): _*))

  /** word k-grams of the lowercased text (1-based; short texts yield one
    * truncated shingle — try_element_at so out-of-range reads are null,
    * matching SQL list indexing under ANSI mode). Convenience form; for
    * hot paths materialize tokens first and use shinglesFromTokens. */
  def wordShingles(text: Column, k: Int = 3): Column =
    shinglesFromTokens(tokens(lower(text)), k)
}
