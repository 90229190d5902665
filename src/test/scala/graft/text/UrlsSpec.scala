package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(Urls.canonicalizeUrl($"url").as("c"))
      .as[String].collect().toSeq

  test("canonicalization rules: case, www, ports, fragment, " +
      "tracking params, param order, trailing slash") {
    assert(canon(
      "HTTP://WWW.Example.COM/Path/",
      "http://example.com:80/Path",
      "https://example.com:443/",
      "https://example.com:8443/",
      "http://example.com/a#frag",
      "http://example.com/a?utm_source=x&id=2&b=1",
      "http://example.com/a?b=1&id=2",
      "http://example.com",
      "http://example.com/?ref=tw") == Seq(
      "http://example.com/Path", // scheme+host fold, path case kept
      "http://example.com/Path", // default port dropped
      "https://example.com/",
      "https://example.com:8443/", // non-default port SURVIVES
      "http://example.com/a",
      "http://example.com/a?b=1&id=2", // tracking dropped, sorted
      "http://example.com/a?b=1&id=2", // permutation collapses
      "http://example.com/",
      "http://example.com/"))
  }

  test("variants of the same page share one canonical form; " +
      "different resources don't") {
    val same = canon(
      "http://www.news.org/story?utm_campaign=a&page=2",
      "HTTP://NEWS.ORG/story/?page=2#top",
      "http://news.org:80/story?page=2&fbclid=zzz")
    assert(same.distinct.size == 1, same.toString)
    val diff = canon(
      "http://news.org/story?page=2",
      "http://news.org/story?page=3",
      "https://news.org/story?page=2",
      "http://news.org:8080/story?page=2")
    assert(diff.distinct.size == 4, diff.toString)
  }

  test("a '?' inside the fragment is NOT a query (RFC 3986: the " +
      "fragment starts at the first '#')") {
    // SPA hash-routing: #/route?tab=1 is all fragment — dropping it
    // must NOT leak ?tab=1 into the canonical (that would over-dedup
    // against the genuinely distinct page /p?tab=1)
    assert(canon(
      "https://h.com/p#/route?tab=1",
      "https://h.com/p?tab=1",
      "https://h.com/p#sec?x=1",
      "https://h.com/p?a=1#frag?b=2") == Seq(
      "https://h.com/p", // no query at all
      "https://h.com/p?tab=1", // a real query — distinct resource
      "https://h.com/p",
      "https://h.com/p?a=1")) // query before '#' kept, fragment gone
    assert(spark.range(1)
      .select(Urls.urlQuery(lit("https://h/p#sec?x=1")).as("q"))
      .as[String].head() == "")
  }

  test("a literal '?' INSIDE the query is query content (RFC 3986): " +
      "the query starts at the FIRST '?', not the last") {
    // '?' is a legal query character; anchoring the prefix at the
    // first '?' must keep the full string (a last-'?' anchor would
    // truncate to '&b=2' and produce a wrong dedup key)
    assert(spark.range(1)
      .select(Urls.urlQuery(lit("http://h/p?a=1&q=what?&b=2")).as("q"))
      .as[String].head() == "a=1&q=what?&b=2")
    // and the canonical form keeps all three params (sorted)
    assert(canon("http://h.com/p?b=2&q=what?&a=1") ==
      Seq("http://h.com/p?a=1&b=2&q=what?"))
    // fragment still wins: '?' after '#' stays fragment content
    assert(spark.range(1)
      .select(Urls.urlQuery(lit("http://h/p?a=1#f?x=2")).as("q"))
      .as[String].head() == "a=1")
  }

  test("null and scheme-less urls canonicalize to null") {
    val got = Seq[String](null, "not a url", "example.com/a",
        "ftp://files.example.com/x")
      .toDF("url").select(Urls.canonicalizeUrl($"url").as("c"))
      .as[String].collect().toSeq
    assert(got(0) == null && got(1) == null && got(2) == null)
    assert(got(3) == "ftp://files.example.com/x") // any scheme://host ok
  }

  test("registrableDomain: two labels, known second-level under " +
      "2-letter tld, deep subdomains") {
    val got = Seq("example.com", "a.b.example.com", "example.co.uk",
        "a.example.co.uk", "example.com.au", "sub.example.org",
        "localhost")
      .toDF("h").select(Urls.registrableDomain($"h").as("d"))
      .as[String].collect().toSeq
    assert(got == Seq("example.com", "example.com", "example.co.uk",
      "example.co.uk", "example.com.au", "example.org", "localhost"))
  }

  test("dedupByCanonicalUrl keeps the first id per canonical url, " +
      "unparseable urls always survive") {
    val df = Seq(
      (1L, "http://www.example.com/a?utm_source=x"),
      (2L, "http://example.com/a"),
      (3L, "http://example.com/b"),
      (4L, "no scheme here"),
      (5L, "also not a url")).toDF("doc_id", "url")
    val got = Urls.dedupByCanonicalUrl(df, "url", "doc_id")
      .orderBy($"doc_id")
      .select($"doc_id", $"is_url_dup", $"url_domain")
      .as[(Long, Boolean, String)].collect().toSeq
    assert(got.map(x => (x._1, x._2)) ==
      Seq((1L, false), (2L, true), (3L, false), (4L, false),
        (5L, false)))
    assert(got.head._3 == "example.com")
  }

  test("registrableDomainPsl: published PSL algorithm — longest " +
      "rule, wildcard, exception precedence, implicit * fallback") {
    val psl = Seq("com", "org", "co.uk", "uk", "*.ck", "!www.ck")
      .toDF("rule")
    val hosts = Seq(
      "a.example.com", // plain
      "b.example.co.uk", // LONGEST rule wins over "uk"
      "example.co.uk",
      "co.uk", // host IS a public suffix
      "foo.bar.ck", // wildcard *.ck -> suffix bar.ck
      "bar.ck", // wildcard match consumes the whole host
      "www.ck", // exception: www.ck is REGISTRABLE
      "sub.www.ck", // exception still yields suffix ck
      "x.unknowntld", // no rule -> implicit * (TLD is suffix)
      "unknowntld")
      .toDF("host")
    val got = Urls.registrableDomainPsl(hosts, "host", psl)
      .select($"host", $"public_suffix", $"registrable_domain")
      .as[(String, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("a.example.com") == ("com", "example.com"))
    assert(got("b.example.co.uk") == ("co.uk", "example.co.uk"))
    assert(got("example.co.uk") == ("co.uk", "example.co.uk"))
    assert(got("co.uk") == ("co.uk", null))
    assert(got("foo.bar.ck") == ("bar.ck", "foo.bar.ck"))
    assert(got("bar.ck") == ("bar.ck", null))
    assert(got("www.ck") == ("ck", "www.ck"))
    assert(got("sub.www.ck") == ("ck", "www.ck"))
    assert(got("x.unknowntld") == ("unknowntld", "x.unknowntld"))
    assert(got("unknowntld") == ("unknowntld", null))
    // the PSL side must broadcast AND the match must be a HASH join:
    // an OR-of-equalities condition planned as BroadcastNestedLoopJoin
    // scans every rule per candidate row — O(cands × rules), ~8×10¹⁰
    // comparisons at 1M hosts × 10k real PSL rules
    val plan = Urls.registrableDomainPsl(hosts, "host", psl)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // agreement with the closed-form approximation on its home turf
    val approx = hosts
      .select($"host", Urls.registrableDomain($"host").as("a"))
      .as[(String, String)].collect().toMap
    Seq("a.example.com", "b.example.co.uk").foreach { h =>
      assert(approx(h) == got(h)._2, h)
    }
  }

  test("dedup is invariant under partitioning") {
    val rows = (0L until 200L).map { i =>
      (i, s"http://www.site${i % 7}.com/p${i % 11}?utm_source=$i" +
        s"&q=${i % 3}")
    }
    val df = rows.toDF("doc_id", "url")
    def run(d: org.apache.spark.sql.DataFrame) =
      Urls.dedupByCanonicalUrl(d, "url", "doc_id")
        .orderBy($"doc_id")
        .select($"doc_id", $"canonical_url", $"is_url_dup")
        .as[(Long, String, Boolean)].collect().toSeq
    assert(run(df) == run(df.repartition(13)))
    // 7 sites x 11 paths x 3 q-values = 231 canonicals > 200 rows;
    // dup iff an earlier doc hit the same (site, path, q) triple
    val canonFirst = scala.collection.mutable.Map[String, Long]()
    val expectDups = rows.count { case (i, _) =>
      val key = s"${i % 7}|${i % 11}|${i % 3}"
      val dup = canonFirst.contains(key)
      if (!dup) canonFirst(key) = i
      dup
    }
    assert(run(df).count(_._3) == expectDups)
  }

  test("the keeper groupBy map-side combines (no corpus-wide window)") {
    val df = (0L until 50L).map(i =>
      (i, s"http://x.com/p${i % 5}")).toDF("doc_id", "url")
    val plan = Urls.dedupByCanonicalUrl(df, "url", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_min") || plan.contains("HashAggregate"),
      plan)
  }

  test("registrableDomainPsl against GENUINE published rule text: the " +
      "committed PSL excerpt parses and reproduces the official test " +
      "vectors for the *.ck/!www.ck and *.kawasaki.jp/!city families") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(
        "/psl/public_suffix_list_excerpt.dat"), "UTF-8")
    val rules = try Urls.parsePslRules(src.getLines()) finally src.close()
    // the parser must keep exactly the rule tokens: no comments, no
    // blanks, wildcard/exception markers intact
    assert(rules.contains("*.ck") && rules.contains("!www.ck") &&
      rules.contains("*.kawasaki.jp") &&
      rules.contains("!city.kawasaki.jp") && rules.contains("co.uk"))
    assert(!rules.exists(_.startsWith("//")) && !rules.contains(""))
    val psl = rules.toDF("rule")
    // expectations straight from the PSL project's checkPublicSuffix
    // test vectors (publicsuffix.org/list/ tests)
    val hosts = Seq(
      "example.com", "www.example.com",
      "example.co.uk", "www.example.co.uk", "co.uk",
      "www.ck",            // !www.ck: suffix ck, registrable www.ck
      "www.www.ck",        // exception beats *.ck
      "test.ck",           // *.ck: test.ck IS a public suffix -> null
      "b.test.ck",         // registrable under the wildcard suffix
      "a.b.test.ck",
      "city.kawasaki.jp",  // !city.kawasaki.jp
      "test.kawasaki.jp",  // *.kawasaki.jp -> IS a suffix -> null
      "www.test.kawasaki.jp")
      .toDF("host")
    val got = Urls.registrableDomainPsl(hosts, "host", psl)
      .select($"host", $"registrable_domain")
      .as[(String, String)].collect().toMap
    assert(got("example.com") == "example.com")
    assert(got("www.example.com") == "example.com")
    assert(got("example.co.uk") == "example.co.uk")
    assert(got("www.example.co.uk") == "example.co.uk")
    assert(got("co.uk") == null)
    assert(got("www.ck") == "www.ck")
    assert(got("www.www.ck") == "www.ck")
    assert(got("test.ck") == null)
    assert(got("b.test.ck") == "b.test.ck")
    assert(got("a.b.test.ck") == "b.test.ck")
    assert(got("city.kawasaki.jp") == "city.kawasaki.jp")
    assert(got("test.kawasaki.jp") == null)
    assert(got("www.test.kawasaki.jp") == "www.test.kawasaki.jp")
  }
}
