package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC / WET reader — the container web corpora actually arrive in
  * (ISO 28500; CommonCrawl's crawl format). A WARC file is a
  * sequence of records: a `WARC/1.0\r\n` version line, CRLF-separated
  * `Name: value` headers (always including `Content-Length`), a blank
  * line, `Content-Length` payload bytes, and a blank-line separator.
  *
  * Distribution model: WARC files are parallelized FILE-AT-A-TIME —
  * deliberately. Production `.warc.gz` is a gzip MEMBER PER RECORD
  * concatenated into one stream, so the file is not byte-splittable
  * anyway (a split would land mid-member); the corpus-level
  * parallelism axis is the many-files layout every crawl already has
  * (CommonCrawl ships ~64k files per snapshot — far more than any
  * cluster's cores). Each task streams ONE file: `binaryFile` rows
  * feed a mapPartitions record walk with O(record) memory. Payload
  * bytes stay opaque `binary` (the multimodal-column convention);
  * header fields surface as typed columns.
  *
  * gzip: handled transparently when the file starts with the gzip
  * magic — a `GZIPInputStream` over the whole stream decodes
  * concatenated members in sequence (the per-record-member layout
  * decompresses as one stream).
  *
  * Caveat honestly stated: `binaryFile` materializes a file per row
  * (Spark's format caps at `spark.sql.sources.binaryFile
  * .maxLength`, default 2 GiB) — matched to CommonCrawl's ~1 GiB
  * target file size. A custom streaming FileFormat would lift that;
  * same boundary as the multimodal codecs. */
object Warc {

  /** Read WARC records under `path` (glob ok; plain or .gz).
    * Returns one row per record:
    * (file, record_idx, warc_type, target_uri, warc_date,
    * content_type, content_length, payload binary). HTTP response
    * records keep their full HTTP block as payload —
    * [[httpResponses]] peels status/headers/body. */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    files.mapPartitions { rows =>
      rows.flatMap { case (file, raw) =>
        val bytes = maybeGunzip(raw)
        parseRecords(bytes).zipWithIndex.map { case (r, i) =>
          (file, i.toLong,
            r.headers.getOrElse("warc-type", null),
            r.headers.getOrElse("warc-target-uri", null),
            r.headers.getOrElse("warc-date", null),
            r.headers.getOrElse("content-type", null),
            r.payload.length.toLong, r.payload)
        }
      }
    }.toDF("file", "record_idx", "warc_type", "target_uri",
      "warc_date", "content_type", "content_length", "payload")
  }

  /** `response` records with the HTTP envelope peeled: adds
    * http_status, http_content_type, and `body` (the bytes after the
    * header blank line). */
  def httpResponses(warc: DataFrame): DataFrame = {
    val spark = warc.sparkSession
    import spark.implicits._
    warc.where(col("warc_type") === "response")
      .select(col("file"), col("record_idx"), col("target_uri"),
        col("warc_date"), col("payload"))
      .as[(String, Long, String, String, Array[Byte])]
      .map { case (file, idx, uri, date, payload) =>
        val (status, headers, body) = parseHttp(payload)
        (file, idx, uri, date, status,
          headers.getOrElse("content-type", null), body)
      }
      .toDF("file", "record_idx", "target_uri", "warc_date",
        "http_status", "http_content_type", "body")
  }

  /** WET-style extracted text: `conversion` records decoded as UTF-8
    * (WET files are WARC files whose payloads are plain text). */
  def readWet(spark: SparkSession, path: String): DataFrame =
    readWarc(spark, path)
      .where(col("warc_type") === "conversion")
      .select(col("target_uri").as("url"), col("warc_date"),
        decode(col("payload"), "UTF-8").as("text"))

  // ---------------------------------------------------------------

  private[io] final case class Record(headers: Map[String, String],
      payload: Array[Byte])

  private[io] def maybeGunzip(raw: Array[Byte]): Array[Byte] =
    if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f &&
        (raw(1) & 0xff) == 0x8b) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(raw))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } else raw

  /** Walk concatenated records; malformed trailing bytes end the
    * walk (truncated files are a fact of crawls — read what parses,
    * don't throw away the file). */
  private[io] def parseRecords(bytes: Array[Byte]): Iterator[Record] =
    new Iterator[Record] {
      private var pos = 0
      private var nextRec: Record = advance()
      private def lineAt(p: Int): (String, Int) = {
        var e = p
        while (e + 1 < bytes.length &&
          !(bytes(e) == '\r' && bytes(e + 1) == '\n')) e += 1
        (new String(bytes, p, e - p,
          java.nio.charset.StandardCharsets.ISO_8859_1), e + 2)
      }
      private def advance(): Record = {
        // seek the version line
        while (pos < bytes.length) {
          val (line, after) = lineAt(pos)
          if (line.startsWith("WARC/")) {
            var p = after
            val hs = scala.collection.mutable.Map.empty[String, String]
            var done = false
            while (!done && p < bytes.length) {
              val (l, a) = lineAt(p)
              p = a
              if (l.isEmpty) done = true
              else {
                val i = l.indexOf(':')
                if (i > 0) hs(l.substring(0, i).trim.toLowerCase) =
                  l.substring(i + 1).trim
              }
            }
            val len = hs.get("content-length").map(_.toInt)
              .getOrElse(-1)
            if (done && len >= 0 && p + len <= bytes.length) {
              val payload = java.util.Arrays.copyOfRange(bytes, p,
                p + len)
              pos = p + len
              return Record(hs.toMap, payload)
            } else { pos = bytes.length; return null }
          } else if (line.isEmpty && after > pos) pos = after
          else if (after > pos) pos = after
          else { pos = bytes.length }
        }
        null
      }
      def hasNext: Boolean = nextRec != null
      def next(): Record = {
        val r = nextRec; nextRec = advance(); r
      }
    }

  /** Split an HTTP message block: (status code, lowercased headers,
    * body bytes). */
  private[io] def parseHttp(payload: Array[Byte])
      : (Int, Map[String, String], Array[Byte]) = {
    var split = -1
    var i = 0
    while (split < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n') split = i
      i += 1
    }
    if (split < 0) return (0, Map.empty, payload)
    val head = new String(payload, 0, split,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r\n")
    val status = lines.headOption
      .flatMap(l => "\\d{3}".r.findFirstIn(l)).map(_.toInt)
      .getOrElse(0)
    val headers = lines.drop(1).flatMap { l =>
      val j = l.indexOf(':')
      if (j > 0) Some(l.substring(0, j).trim.toLowerCase ->
        l.substring(j + 1).trim)
      else None
    }.toMap
    val body = java.util.Arrays.copyOfRange(payload, split + 4,
      payload.length)
    (status, headers, body)
  }

  /** Fixture encoder (tests/demos): records → WARC bytes, optionally
    * gzipped as ONE member per record (the production layout). The
    * inverse boundary that lets specs round-trip real parses. */
  private[graft] def encodeWarc(records: Seq[Record],
      gzipPerRecord: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val rec = new java.io.ByteArrayOutputStream()
      val sb = new StringBuilder("WARC/1.0\r\n")
      r.headers.filterNot(_._1.equalsIgnoreCase("content-length"))
        .foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
      sb.append(s"content-length: ${r.payload.length}\r\n\r\n")
      rec.write(sb.toString.getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1))
      rec.write(r.payload)
      rec.write("\r\n\r\n".getBytes)
      if (gzipPerRecord) {
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(rec.toByteArray); gz.finish()
      } else out.write(rec.toByteArray)
    }
    out.toByteArray
  }
}
