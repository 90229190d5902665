package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL normalization and URL-level dedup — the ingest step web-corpus
  * pipelines (C4, RefinedWeb, Dolma) run BEFORE any content dedup:
  * the same page is crawled under scheme/case/port/fragment/tracking
  * variants, and collapsing those by CANONICAL URL is orders of
  * magnitude cheaper than discovering the duplicates by text.
  *
  * Everything here is a pure Column expression over string/array
  * builtins — codegen'd, shuffle-free per row, zero UDF — so
  * canonicalization rides the ingest scan for free; the only shuffle
  * in [[dedupByCanonicalUrl]] is one map-side-combined groupBy on the
  * canonical string.
  *
  * Canonical form (the common-denominator rules; each is a plain
  * string law so the whole chain is replayable in SQL):
  *  - scheme and host lowercase; `www.` prefix dropped
  *  - default ports stripped (`:80` for http, `:443` for https)
  *  - fragment (`#…`) dropped
  *  - tracking parameters dropped (utm_*, fbclid, gclid, msclkid,
  *    ref, ref_src) — the list is a parameter
  *  - remaining query parameters SORTED (byte order) so param
  *    permutations collapse; empty query drops its `?`
  *  - trailing `/` dropped from non-root paths; empty path → `/`
  */
object Urls {

  /** Default tracking-parameter names stripped by [[canonicalizeUrl]]
    * (matched on the part before `=`, case-sensitive lowercase). */
  val DefaultTrackingParams: Seq[String] =
    Seq("utm_source", "utm_medium", "utm_campaign", "utm_term",
      "utm_content", "fbclid", "gclid", "msclkid", "ref", "ref_src")

  /** Scheme, lowercased ("" when the URL has none). */
  def urlScheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Host (authority minus port), lowercased, `www.` kept. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1))

  /** Explicit port digits ("" when absent). */
  def urlPort(url: Column): Column =
    regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]*:(\\d+)", 1)

  /** Path as written ("" when absent — [[canonicalizeUrl]] folds that
    * to `/`). Stops at `?` or `#`. */
  def urlPath(url: Column): Column =
    regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)

  /** Query string without the `?` ("" when absent). Per RFC 3986 the
    * fragment starts at the FIRST `#`, so a `?` appearing after it
    * (SPA hash-routing: `https://h/p#/route?tab=1`) is fragment
    * content, NOT a query — the regex therefore requires the `?` to
    * occur before any `#`. The query itself starts at the FIRST `?`
    * (RFC 3986 allows literal `?` INSIDE the query, so the prefix
    * must not skip past one: `^[^#]*\?` would greedily capture after
    * the LAST pre-fragment `?`, truncating `?a=1&q=what?&b=2` to
    * `&b=2`). */
  def urlQuery(url: Column): Column =
    regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)

  /** Registrable-domain APPROXIMATION without a public-suffix list:
    * the last two host labels, or the last three when the middle one
    * is a well-known second-level suffix (co/com/net/org/gov/ac/edu
    * under a 2-letter TLD — `example.co.uk` → `example.co.uk`). A PSL
    * pass is a broadcast-join refinement; this closed form is what
    * the oracle can replay and what per-domain caps/stats need. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".",
      element_at(labels, -2), element_at(labels, -1))
    val lastThree = concat_ws(".", element_at(labels, -3),
      element_at(labels, -2), element_at(labels, -1))
    val secondLevel = element_at(labels, -2)
      .isin("co", "com", "net", "org", "gov", "ac", "edu")
    when(n <= 2, concat_ws(".", labels))
      .otherwise(when(secondLevel &&
        length(element_at(labels, -1)) === 2, lastThree)
        .otherwise(lastTwo))
  }

  /** Public-Suffix-List registrable domain — the exact refinement
    * [[registrableDomain]]'s closed form approximates. Implements the
    * published PSL algorithm (publicsuffix.org/list/): among all
    * rules matching a suffix of the host, the longest (most labels)
    * wins; a wildcard rule (`*.ck`) matches any single label in the
    * starred position; an exception rule (`!www.ck`) beats every
    * other match and names ONE LABEL MORE than its public suffix.
    * The registrable domain is the public suffix plus one label;
    * hosts that ARE a public suffix (or have no label above it)
    * yield null. Hosts matching no rule use the implicit `*` rule
    * (TLD itself is the suffix), per the spec.
    *
    * Scale shape: ONE explode of ≤ `maxLabels` candidate suffixes per
    * host (bounded fan-out), a BROADCAST join against the ~10k-rule
    * PSL table, and one max-struct groupBy back to one row per input
    * — the shape the [[registrableDomain]] scaladoc promised. Returns
    * the input plus `public_suffix` and `registrable_domain`. */
  def registrableDomainPsl(df: DataFrame, hostCol: String,
      psl: DataFrame, ruleCol: String = "rule", maxLabels: Int = 8)
      : DataFrame = {
    require(!df.columns.exists(Seq("labels_", "nl_", "k_", "suffix_",
      "public_suffix", "registrable_domain", "match_").contains),
      "input already has a reserved psl working column")
    // rules keyed by their PLAIN suffix part: a wildcard rule *.ck
    // matches at (labels-of-rule) length with tail ck; an exception
    // !www.ck registers at its full length and wins outright
    val rules = psl
      .select(col(ruleCol).as("r_"))
      .where(col("r_").isNotNull && col("r_") =!= "")
      .select(
        when(col("r_").startsWith("!"), expr("substring(r_, 2)"))
          .when(col("r_").startsWith("*."), expr("substring(r_, 3)"))
          .otherwise(col("r_")).as("tail_"),
        when(col("r_").startsWith("!"), lit("exception"))
          .when(col("r_").startsWith("*."), lit("wildcard"))
          .otherwise(lit("plain")).as("kind_"))
      .distinct()
    val withLabels = df
      .withColumn("labels_", split(col(hostCol), "\\."))
      .withColumn("nl_", size(col("labels_")))
    // candidate suffixes, longest first never needed — groupBy max:
    // k_ = label count of the candidate public suffix
    val cands = withLabels
      .select(col(hostCol).as("h_"), col("labels_"), col("nl_"),
        explode(sequence(lit(1),
          least(col("nl_"), lit(maxLabels)))).as("k_"))
      .withColumn("suffix_", concat_ws(".",
        slice(col("labels_"), col("nl_") - col("k_") + 1, col("k_"))))
      // the wildcard join key drops the candidate's FIRST label
      .withColumn("wtail_", concat_ws(".",
        slice(col("labels_"), col("nl_") - col("k_") + 2,
          col("k_") - 1)))
    // TWO broadcast EQUI-joins (plain/exception on the candidate
    // suffix, wildcard on the wildcard tail), unioned — a single
    // OR-of-equalities condition cannot hash-join and would plan as a
    // BroadcastNestedLoopJoin scanning every rule per candidate row
    // (O(cands × rules): the per-row linear-scan trap, ~8×10¹⁰
    // comparisons at 1M hosts × 10k rules). The kind_ filters are
    // disjoint, so each (candidate, rule) match appears exactly once,
    // identical to the OR form.
    val matched = cands
      .join(broadcast(rules.where(col("kind_") =!= "wildcard")),
        col("tail_") === col("suffix_"), "inner")
      .unionByName(cands.where(col("k_") >= 2)
        .join(broadcast(rules.where(col("kind_") === "wildcard")),
          col("tail_") === col("wtail_"), "inner"))
      // exception rules: the public suffix is the rule MINUS its
      // first label → suffix length k_ - 1; they outrank everything
      .select(col("h_"),
        struct(
          when(col("kind_") === "exception", lit(1)).otherwise(lit(0))
            .as("exc_"),
          when(col("kind_") === "exception", col("k_") - 1)
            .otherwise(col("k_")).as("len_")).as("match_"))
      .groupBy(col("h_"))
      // struct max: exception rules outrank (exc_ first), then the
      // longest match — the published precedence
      .agg(max(col("match_")).as("m_"))
      .select(col("h_"), col("m_.len_").as("pslen_"))
    withLabels.join(matched, col(hostCol) === col("h_"), "left")
      // no rule matched -> the implicit "*" rule: suffix = TLD (1)
      .withColumn("pslen_", coalesce(col("pslen_"), lit(1)))
      .withColumn("public_suffix", concat_ws(".",
        slice(col("labels_"), col("nl_") - col("pslen_") + 1,
          col("pslen_"))))
      .withColumn("registrable_domain",
        when(col("nl_") > col("pslen_"), concat_ws(".",
          slice(col("labels_"), col("nl_") - col("pslen_"),
            col("pslen_") + 1)))
          .otherwise(lit(null).cast("string")))
      .drop("labels_", "nl_", "h_", "pslen_")
  }

  /** Parse raw Public Suffix List file text into the rule strings
    * [[registrableDomainPsl]] consumes, per the published format
    * (publicsuffix.org/list/): a line is read up to the first
    * whitespace; `//` comment lines and blank lines are ignored.
    * Feed `spark.read.textFile(pslPath)` content (or a committed
    * excerpt) through this and `.toDF("rule")` the result. */
  def parsePslRules(lines: IterableOnce[String]): Seq[String] =
    lines.iterator
      .map(l => l.takeWhile(!_.isWhitespace))
      .filter(r => r.nonEmpty && !r.startsWith("//"))
      .toSeq

  /** Canonical URL as a pure expression — see object doc for the
    * rules. Null/scheme-less input canonicalizes to null (web corpora
    * treat those rows as undeduplicatable and keep them). */
  def canonicalizeUrl(url: Column,
      trackingParams: Seq[String] = DefaultTrackingParams): Column = {
    val scheme = urlScheme(url)
    val host0 = urlHost(url)
    val host = when(host0.startsWith("www."),
      expr_substr(host0, lit(5))).otherwise(host0)
    val path0 = urlPath(url)
    // non-root trailing slash dropped; absent/empty path → "/"
    val path = when(path0 === "" || path0 === "/", lit("/"))
      .otherwise(when(path0.endsWith("/"),
        expr_substr2(path0, lit(1), length(path0) - 1))
        .otherwise(path0))
    val query0 = urlQuery(url)
    val kept = array_sort(filter(
      split(query0, "&"),
      p => p =!= "" && !split(p, "=").getItem(0)
        .isin(trackingParams: _*)))
    val query = array_join(kept, "&")
    // default ports vanish; any other explicit port is a DIFFERENT
    // resource and survives canonicalization
    val port0 = urlPort(url)
    val port = when(port0 === "" ||
        (scheme === "http" && port0 === "80") ||
        (scheme === "https" && port0 === "443"), lit(""))
      .otherwise(concat(lit(":"), port0))
    val base = concat(scheme, lit("://"), host, port, path)
    when(scheme === "" || host0 === "", lit(null).cast("string"))
      .otherwise(when(query === "", base)
        .otherwise(concat(base, lit("?"), query)))
  }

  // substring(col, pos) / substring(col, pos, len) with Column args —
  // the functions.substring overloads take Int literals only
  private def expr_substr(c: Column, from: Column): Column =
    c.substr(from, length(c))
  private def expr_substr2(c: Column, from: Column, len: Column)
      : Column = c.substr(from, len)

  /** URL-level dedup: one keeper per canonical URL — the FIRST
    * occurrence by `idCol` (the q125 first-wins rule at URL
    * granularity). Rows whose URL doesn't canonicalize (null/no
    * scheme) are always kept. Returns the input plus `canonical_url`,
    * `url_domain`, and `is_url_dup` (true = a later copy). ONE
    * map-side-combined min groupBy on the canonical string + an
    * equi-join back, co-partitioned on the key; nothing else moves. */
  def dedupByCanonicalUrl(df: DataFrame, urlCol: String,
      idCol: String,
      trackingParams: Seq[String] = DefaultTrackingParams)
      : DataFrame = {
    require(!df.columns.contains("canonical_url") &&
      !df.columns.contains("url_domain") &&
      !df.columns.contains("is_url_dup") &&
      !df.columns.contains("keeper_id_"),
      "input already has a reserved url working column")
    val withCanon = df
      .withColumn("canonical_url",
        canonicalizeUrl(col(urlCol), trackingParams))
      .withColumn("url_domain",
        registrableDomain(when(urlHost(col(urlCol)).startsWith("www."),
          expr_substr(urlHost(col(urlCol)), lit(5)))
          .otherwise(urlHost(col(urlCol)))))
    val keeper = withCanon
      .where(col("canonical_url").isNotNull)
      .groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as("keeper_id_"))
    withCanon.join(keeper, Seq("canonical_url"), "left")
      .withColumn("is_url_dup", col("keeper_id_").isNotNull &&
        col(idCol) =!= col("keeper_id_"))
      .drop("keeper_id_")
  }
}
