package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def rec(typ: String, uri: String, payload: Array[Byte],
      extra: Map[String, String] = Map.empty): Warc.Record =
    Warc.Record(Map(
      "warc-type" -> typ, "warc-target-uri" -> uri,
      "warc-date" -> "2026-01-02T03:04:05Z",
      "content-type" -> "application/http") ++ extra, payload)

  val httpBody = "<html><body><p>hello warc</p></body></html>"
  val httpPayload =
    ("HTTP/1.1 200 OK\r\ncontent-type: text/html; charset=utf-8\r\n" +
      "server: x\r\n\r\n" + httpBody).getBytes("ISO-8859-1")
  val fixtures = Seq(
    rec("warcinfo", "urn:info", "software: graft\r\n".getBytes),
    rec("response", "http://a.example/one", httpPayload),
    rec("conversion", "http://a.example/one",
      "hello warc extracted\ntext".getBytes("UTF-8")),
    rec("response", "http://b.example/two",
      ("HTTP/1.1 404 Not Found\r\n\r\nmissing").getBytes("ISO-8859-1")))

  def writeFixture(gz: Boolean): String = {
    val dir = java.nio.file.Files.createTempDirectory("warc").toString
    val name = if (gz) "part-0.warc.gz" else "part-0.warc"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, name),
      Warc.encodeWarc(fixtures, gzipPerRecord = gz))
    dir
  }

  test("plain warc: every record parses with headers and exact " +
      "payload bytes") {
    val df = Warc.readWarc(spark, writeFixture(gz = false))
      .orderBy($"record_idx")
    val got = df.select($"warc_type", $"target_uri", $"content_length")
      .as[(String, String, Long)].collect().toSeq
    assert(got.map(_._1) ==
      Seq("warcinfo", "response", "conversion", "response"))
    assert(got(1)._2 == "http://a.example/one")
    assert(got(1)._3 == httpPayload.length.toLong)
    val payload = df.where($"warc_type" === "conversion")
      .select($"payload").as[Array[Byte]].collect().head
    assert(new String(payload, "UTF-8") ==
      "hello warc extracted\ntext")
  }

  test("gzipped warc (one member per record, the production layout) " +
      "parses identically") {
    val a = Warc.readWarc(spark, writeFixture(gz = false))
      .select($"record_idx", $"warc_type", $"target_uri",
        md5($"payload").as("m"))
      .orderBy($"record_idx")
      .as[(Long, String, String, String)].collect().toSeq
    val b = Warc.readWarc(spark, writeFixture(gz = true))
      .select($"record_idx", $"warc_type", $"target_uri",
        md5($"payload").as("m"))
      .orderBy($"record_idx")
      .as[(Long, String, String, String)].collect().toSeq
    assert(a == b)
  }

  test("httpResponses peels status, content-type, and body") {
    val got = Warc.httpResponses(
        Warc.readWarc(spark, writeFixture(gz = false)))
      .orderBy($"record_idx")
      .select($"target_uri", $"http_status", $"http_content_type",
        decode($"body", "UTF-8").as("b"))
      .as[(String, Int, String, String)].collect().toSeq
    assert(got == Seq(
      ("http://a.example/one", 200, "text/html; charset=utf-8",
        httpBody),
      ("http://b.example/two", 404, null, "missing")))
  }

  test("readWet surfaces conversion records as (url, text)") {
    val got = Warc.readWet(spark, writeFixture(gz = false))
      .select($"url", $"text").as[(String, String)].collect().toSeq
    assert(got == Seq(("http://a.example/one",
      "hello warc extracted\ntext")))
  }

  test("truncated trailing record: earlier records survive, the " +
      "truncated one drops") {
    val full = Warc.encodeWarc(fixtures)
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 30)
    val dir = java.nio.file.Files.createTempDirectory("warct").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.warc"), cut)
    val n = Warc.readWarc(spark, dir).count()
    assert(n == fixtures.length - 1L)
  }

  test("corrupt Content-Length ends the walk like a truncation — " +
      "never throws a task") {
    // a non-numeric length on the THIRD record: records 0-1 survive,
    // the walk stops there (can't locate the next record boundary)
    val bad = fixtures.take(2) ++ Seq(fixtures(2)) ++ fixtures.drop(3)
    val bytes = Warc.encodeWarc(bad)
    val pat = s"content-length: ${fixtures(2).payload.length}"
      .getBytes("ISO-8859-1")
    val at = bytes.indexOfSlice(pat)
    assert(at > 0)
    val corrupted = bytes.clone()
    corrupted(at + "content-length: ".length) = 'x'
    val dir = java.nio.file.Files.createTempDirectory("warcc").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.warc"), corrupted)
    assert(Warc.readWarc(spark, dir).count() == 2L)
  }

  test("records parse straight off the gzip stream — the " +
      "decompressed file is never buffered whole") {
    // a highly-compressible payload far larger than any single read
    // buffer: record-at-a-time parsing must reproduce it exactly
    val big = Array.fill[Byte](8 << 20)('a'.toByte)
    val in = Warc.recordStream(
      Warc.encodeWarc(Seq(rec("resource", "urn:big", big)),
        gzipPerRecord = true))
    assert(!in.isInstanceOf[java.io.ByteArrayInputStream])
    val got = Warc.parseRecords(in).toSeq
    assert(got.length == 1 &&
      java.util.Arrays.equals(got.head.payload, big))
  }

  test("streaming WARC ingest: files landing in a drop directory " +
      "parse identically to the batch reader") {
    val dir = java.nio.file.Files.createTempDirectory("warcs").toString
    val out = java.nio.file.Files.createTempDirectory("warcso").toString
    val q = Warc.readWarcStream(spark, dir)
      .select($"record_idx", $"warc_type", $"target_uri",
        md5($"payload").as("m"))
      .writeStream.format("memory").queryName("warc_stream")
      .option("checkpointLocation", s"$out/ckpt")
      .start()
    try {
      // file 1 lands plain, file 2 lands gzipped — two micro-batches
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "part-0.warc"),
        Warc.encodeWarc(fixtures.take(2)))
      q.processAllAvailable()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "part-1.warc.gz"),
        Warc.encodeWarc(fixtures.drop(2), gzipPerRecord = true))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("warc_stream")
      .select($"warc_type", $"target_uri", $"m")
      .as[(String, String, String)].collect().toSet
    val want = Warc.readWarc(spark, writeFixture(gz = false))
      .select($"warc_type", $"target_uri", md5($"payload"))
      .as[(String, String, String)].collect().toSet
    assert(got == want)
  }

  test("warc -> http body -> Html.mainContent composes end to end") {
    val body = Warc.httpResponses(
        Warc.readWarc(spark, writeFixture(gz = false)))
      .where($"http_status" === 200)
      .select($"record_idx".as("doc_id"),
        decode($"body", "UTF-8").as("html"))
    val text = graft.text.Html.mainContent(body, "html", "doc_id",
        minChars = 5)
      .select($"text").as[String].collect().head
    assert(text == "hello warc")
  }
}
