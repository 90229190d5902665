package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → main-content extraction — the step a web corpus runs
  * BEFORE any text curation: strip non-content subtrees, split the
  * page into text blocks at block-level tags, score each block by
  * LINK DENSITY (the jusText/trafilatura core signal: navigation,
  * footers and link farms are mostly anchor text; body prose isn't),
  * and keep the prose.
  *
  * Everything is a pure Column expression over RE2 regexes and string
  * builtins — codegen'd, shuffle-free, zero UDF — so extraction rides
  * the ingest scan; and because BOTH Spark and DuckDB compile RE2,
  * the whole chain is replayable by the SQL oracle (the q121
  * normalize-chain pattern). A streaming ingest can apply it per row
  * with no state.
  *
  * Pipeline:
  *  1. scrub: `<script>…</script>`, `<style>…</style>` and comments
  *     removed wholesale (their text is code, not content)
  *  2. block split at block-level tags (p, div, br, li, headings,
  *     table/list structure, section/article/header/footer/nav)
  *  3. per block: visible text = inline tags stripped + entities
  *     decoded; link density = anchor-text chars / visible chars
  *  4. keep blocks with ≥ `minChars` visible chars and link density
  *     ≤ `maxLinkDensity`; main content = kept blocks joined with
  *     `\n` in page order
  *
  * Known boundary of the regex approximation: an anchor whose BODY
  * contains block-level tags (`<a><div>…</div></a>` card links) is
  * split apart at the block tags, so its text fragments carry no
  * `<a>…</a>` pair and count zero link chars — block-wrapped nav
  * links can pass the density filter. A DOM-building extractor fixes
  * that at the cost of leaving Column/codegen land (the jusText
  * implementations accept the same class of miss); the fixtures and
  * oracle exercise the inline-anchor form this chain targets.
  */
object Html {

  private val BlockTagRe =
    "(?i)</?(?:p|div|br|li|h[1-6]|tr|td|th|ul|ol|table|section|" +
      "article|header|footer|nav|blockquote)\\b[^>]*>"

  /** Drop comments, then script/style subtrees (dot-all, lazy).
    * COMMENTS GO FIRST: a commented-out unclosed `<script>` tag
    * (`<!-- <script> -->article text<script>x()</script>`) would
    * otherwise anchor the lazy script regex and swallow the real
    * content up to the next genuine `</script>`; stripping the
    * comment first removes the stray tag before the script pass
    * runs. The converse trade-off of that ordering: a literal `<!--`
    * INSIDE a live script body with no `-->` before `</script>`
    * (legacy CDATA-hiding JS, string literals) anchors the comment
    * regex first — text up to the next `-->` is lost and the
    * orphaned script prefix leaks code fragments into the blocks
    * (where the link-density/min-chars filters usually, but not
    * always, drop them). Commented-out trackers outnumber unclosed
    * in-script `<!--` by orders of magnitude in real crawls, so the
    * ordering favors the former; a DOM extractor is the fix for
    * both, at the cost of leaving Column land (object doc). */
  def scrub(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComment,
      "(?is)<script\\b[^>]*>.*?</script>", " ")
    regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
  }

  /** Remaining tags → space, then the common entities decode. (Tags
    * become SPACES, not "", so `a</p><p>b` keeps a word boundary.) */
  def stripTags(fragment: Column): Column = {
    val noTags = regexp_replace(fragment, "<[^>]*>", " ")
    val ampLast = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (e, ch)) =>
        regexp_replace(c, java.util.regex.Pattern.quote(e), ch)
      }
    // &amp; LAST so "&amp;lt;" decodes to "&lt;" (one level), the
    // standard single-pass rule
    regexp_replace(ampLast, java.util.regex.Pattern.quote("&amp;"), "&")
  }

  /** Whitespace-collapsed trim (the visible text of a block). */
  def visibleText(fragment: Column): Column =
    trim(regexp_replace(stripTags(fragment), "\\s+", " "))

  /** One row per text block: (idCol, block_idx, block_text,
    * block_chars, link_chars, link_density_micro, keep). Everything
    * downstream of the posexplode is a row expression. */
  def blocks(df: DataFrame, htmlCol: String, idCol: String,
      minChars: Int = 20, maxLinkDensityMicro: Long = 500000L)
      : DataFrame = {
    // every produced name is reserved — a `keep` or `block_text` id
    // column would be silently overwritten by withColumn and collapse
    // mainContent's groupBy
    val reserved = Seq("frag_", "block_idx", "block_text",
      "block_chars", "link_chars", "link_density_micro", "keep")
    val clash = reserved.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has reserved working columns: " +
        clash.mkString(","))
    // null html folds to "" BEFORE the split — posexplode of a null
    // array emits ZERO rows and would silently drop the document
    // from mainContent (the dedupLines null trap)
    val exploded = df
      .select(col(idCol),
        posexplode(split(scrub(coalesce(col(htmlCol), lit(""))),
          BlockTagRe)))
      .withColumnRenamed("pos", "block_idx")
      .withColumnRenamed("col", "frag_")
    val vis = visibleText(col("frag_"))
    // anchor-text chars = visible length lost when <a>…</a> subtrees
    // are removed (lengths compared pre-collapse so internal spacing
    // can't skew the ratio)
    val noAnchor = regexp_replace(col("frag_"),
      "(?is)<a\\b[^>]*>.*?</a>", "")
    val visLen = length(trim(stripTags(col("frag_"))))
    val visNoAnchorLen = length(trim(stripTags(noAnchor)))
    exploded
      .withColumn("block_text", vis)
      .withColumn("block_chars", length(col("block_text")))
      .withColumn("link_chars",
        greatest(visLen - visNoAnchorLen, lit(0)))
      .withColumn("link_density_micro",
        when(visLen === 0, lit(0L))
          .otherwise(round(col("link_chars") * lit(1e6) /
            visLen).cast("long")))
      .withColumn("keep",
        col("block_chars") >= minChars &&
          col("link_density_micro") <= maxLinkDensityMicro)
      .drop("frag_")
  }

  /** Main content per document: kept blocks joined with `\n` in page
    * order, plus block bookkeeping. One posexplode + one per-doc
    * regroup — the q125 reassembly shape; block order rides a
    * sort_array of (idx, text) structs, no window. */
  def mainContent(df: DataFrame, htmlCol: String, idCol: String,
      minChars: Int = 20, maxLinkDensityMicro: Long = 500000L)
      : DataFrame =
    blocks(df, htmlCol, idCol, minChars, maxLinkDensityMicro)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("keep").cast("long")).as("n_kept"),
        concat_ws("\n", transform(
          sort_array(collect_list(when(col("keep"),
            struct(col("block_idx"), col("block_text"))))),
          s => s.getField("block_text"))).as("text"))
}
