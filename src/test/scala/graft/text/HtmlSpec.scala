package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val page =
    """<html><head><title>T</title>
      |<script type="text/javascript">var x = "<p>not content</p>";
      |</script><style>.a { color: red }</style></head>
      |<body><!-- comment with <p>fake</p> -->
      |<div class="nav"><a href="/">Home</a> <a href="/a">About</a>
      |<a href="/b">Contact us now</a></div>
      |<h1>The Headline Of The Piece</h1>
      |<p>This is the first real paragraph of body prose, long
      |enough to clear the minimum and with <a href="x">one inline
      |link</a> that stays under the density bar.</p>
      |<p>tiny</p>
      |<p>Entities decode: AT&amp;T &lt;3 &quot;quotes&quot;
      |&nbsp;and &amp;lt; stays once-decoded.</p>
      |<div class="footer"><a href="/p">Privacy</a>
      |<a href="/t">Terms</a> <a href="/c">Cookies and tracking
      |settings</a></div></body></html>""".stripMargin

  lazy val out = Html.mainContent(
    Seq((1L, page)).toDF("doc_id", "html"), "html", "doc_id")
    .select($"n_blocks", $"n_kept", $"text")
    .as[(Long, Long, String)].collect().head

  test("script/style/comment content never leaks into blocks") {
    assert(!out._3.contains("not content"))
    assert(!out._3.contains("color: red"))
    assert(!out._3.contains("fake"))
  }

  test("link-dense nav and footer blocks drop; prose survives " +
      "including its inline link text") {
    assert(!out._3.contains("Home"))
    assert(!out._3.contains("Privacy"))
    assert(out._3.contains("first real paragraph of body prose"))
    assert(out._3.contains("one inline link")) // inline anchor KEPT
    assert(out._3.contains("The Headline Of The Piece"))
  }

  test("short blocks drop; entities decode single-pass") {
    assert(!out._3.split("\n").contains("tiny"))
    assert(out._3.contains("AT&T <3 \"quotes\""))
    assert(out._3.contains("and &lt; stays once-decoded"))
  }

  test("block accounting: kept < total") {
    assert(out._2 >= 3 && out._2 < out._1)
  }

  test("link density: an all-anchor block is ~1e6 micro, a no-anchor " +
      "block 0") {
    val b = Html.blocks(Seq(
        (1L, "<p><a href=x>all of this text is one big anchor here</a></p>"),
        (2L, "<p>plain prose with no anchors at all in this one</p>"))
        .toDF("doc_id", "html"), "html", "doc_id")
      .where($"block_chars" > 0)
      .select($"doc_id", $"link_density_micro", $"keep")
      .as[(Long, Long, Boolean)].collect().toSeq
    val byDoc = b.groupBy(_._1)
    assert(byDoc(1L).head._2 == 1000000L && !byDoc(1L).head._3)
    assert(byDoc(2L).head._2 == 0L && byDoc(2L).head._3)
  }

  test("extraction is shuffle-minimal: blocks() plan has no Window " +
      "and no join") {
    val plan = Html.blocks(Seq((1L, page)).toDF("doc_id", "html"),
      "html", "doc_id").queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Join"), plan)
  }

  test("null html survives as an empty document, not a dropped row") {
    val got = Html.mainContent(
        Seq((1L, "<p>real prose long enough to keep around here</p>"),
          (2L, null.asInstanceOf[String])).toDF("doc_id", "html"),
        "html", "doc_id")
      .orderBy($"doc_id")
      .select($"doc_id", $"n_kept", $"text")
      .as[(Long, Long, String)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L)) // doc 2 still present
    assert(got(1)._2 == 0L && got(1)._3 == "")
  }

  test("a commented-out unclosed <script> cannot swallow article " +
      "text: comments strip BEFORE the script pass") {
    // with script-first stripping, the lazy script regex would anchor
    // at the commented <script> and delete everything up to the real
    // </script> — including the article
    val html = "<p><!-- <script> -->Actual article text long " +
      "enough to keep around.</p><script>x();</script>" +
      "<p>Second real paragraph with plenty of prose too.</p>"
    val got = Html.mainContent(
        Seq((1L, html)).toDF("doc_id", "html"), "html", "doc_id")
      .select($"text").as[String].head()
    assert(got.contains("Actual article text"), got)
    assert(got.contains("Second real paragraph"), got)
    assert(!got.contains("x();"), got)
  }

  test("blocks() rejects inputs whose columns clash with any produced " +
      "name (an id column named 'keep' would be silently overwritten " +
      "and collapse mainContent's groupBy)") {
    val df = Seq((1L, "<p>x</p>")).toDF("keep", "html")
    val e = intercept[IllegalArgumentException] {
      Html.blocks(df, "html", "keep")
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
  }

  test("mainContent is invariant under partitioning") {
    val docs = (0L until 40L).map(i =>
      (i, s"<div><a>nav$i</a><a>more$i</a></div><p>body paragraph " +
        s"number $i with plenty of real prose text inside</p>"))
      .toDF("doc_id", "html")
    def run(d: org.apache.spark.sql.DataFrame) =
      Html.mainContent(d, "html", "doc_id").orderBy($"doc_id")
        .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    assert(run(docs) == run(docs.repartition(7)))
  }
}
