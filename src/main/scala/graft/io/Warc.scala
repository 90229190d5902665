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
  * magic — records are parsed STRAIGHT OFF a `GZIPInputStream` over
  * the member-concatenated stream (Java's decoder walks members in
  * sequence), so the decompressed file is never materialized: working
  * memory is O(one record) on top of the compressed bytes.
  *
  * Caveat honestly stated: `binaryFile` materializes the COMPRESSED
  * file per row (Spark's format caps at `spark.sql.sources.binaryFile
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
    files.mapPartitions(rowsOf)
      .toDF("file", "record_idx", "warc_type", "target_uri",
        "warc_date", "content_type", "content_length", "payload")
  }

  // the record-to-row mapping shared by the batch and streaming
  // readers — ONE copy of the column contract, so the two paths can
  // never silently diverge in schema
  private def rowsOf(rows: Iterator[(String, Array[Byte])])
      : Iterator[(String, Long, String, String, String, String,
        Long, Array[Byte])] =
    rows.flatMap { case (file, raw) =>
      parseRecords(recordStream(raw)).zipWithIndex.map { case (r, i) =>
        (file, i.toLong,
          r.headers.getOrElse("warc-type", null),
          r.headers.getOrElse("warc-target-uri", null),
          r.headers.getOrElse("warc-date", null),
          r.headers.getOrElse("content-type", null),
          r.payload.length.toLong, r.payload)
      }
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

  /** STREAMING WARC ingest: the same record walk over a
    * `readStream`-monitored drop directory — each newly landed
    * `.warc(.gz)` file becomes one micro-batch contribution, parsed
    * record-at-a-time off its (gzip) stream exactly like the batch
    * path. This is how a crawl actually arrives (files land as the
    * crawler rotates them), and it composes with the streaming ingest
    * stores: `readWarcStream → httpResponses → Html.mainContent →
    * UrlIndexStore/ParagraphIndexStore`. Same schema as [[readWarc]];
    * same file-at-a-time parallelism axis and `binaryFile` size cap. */
  def readWarcStream(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, " +
        "length LONG, content BINARY")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(rowsOf)
      .toDF("file", "record_idx", "warc_type", "target_uri",
        "warc_date", "content_type", "content_length", "payload")
  }

  // ---------------------------------------------------------------

  private[io] final case class Record(headers: Map[String, String],
      payload: Array[Byte])

  /** Stream over a file's bytes: a buffered `GZIPInputStream` when
    * the gzip magic is present (member-concatenated production
    * layout decodes in sequence), the raw bytes otherwise. The
    * decompressed file is never buffered whole. */
  private[io] def recordStream(raw: Array[Byte]): java.io.InputStream = {
    val base = new java.io.ByteArrayInputStream(raw)
    if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f &&
        (raw(1) & 0xff) == 0x8b)
      new java.io.BufferedInputStream(
        new java.util.zip.GZIPInputStream(base, 1 << 16), 1 << 16)
    else base
  }

  /** Walk concatenated records straight off the stream — O(record)
    * working memory. Malformed trailing bytes (truncated payload,
    * unparseable or absent Content-Length, missing header terminator)
    * end the walk: truncated files are a fact of crawls — read what
    * parses, don't throw away the file (and never throw a task). */
  private[io] def parseRecords(in: java.io.InputStream)
      : Iterator[Record] =
    new Iterator[Record] {
      private var eof = false
      // reads a CRLF/LF-terminated line; null at EOF-before-any-byte
      private def readLine(): String = {
        val sb = new java.lang.StringBuilder(64)
        var b = in.read()
        if (b < 0) { eof = true; return null }
        while (b >= 0 && b != '\n') { sb.append(b.toChar); b = in.read() }
        if (b < 0) eof = true
        val l = sb.length
        if (l > 0 && sb.charAt(l - 1) == '\r') sb.setLength(l - 1)
        sb.toString
      }
      private def readFully(n: Int): Array[Byte] = {
        val buf = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val got = in.read(buf, off, n - off)
          if (got < 0) return null
          off += got
        }
        buf
      }
      private var nextRec: Record = advance()
      private def advance(): Record = {
        // seek the version line (skipping inter-record blank lines)
        while (!eof) {
          val line = readLine()
          if (line == null) return null
          if (line.startsWith("WARC/")) {
            val hs = scala.collection.mutable.Map.empty[String, String]
            var done = false
            while (!done && !eof) {
              val l = readLine()
              if (l == null || l.isEmpty) done = l != null
              else {
                val i = l.indexOf(':')
                if (i > 0) hs(l.substring(0, i).trim.toLowerCase) =
                  l.substring(i + 1).trim
              }
            }
            // toLongOption: a corrupt non-numeric Content-Length is a
            // truncation-equivalent, not a task failure
            val len = hs.get("content-length")
              .flatMap(v => v.trim.toLongOption).getOrElse(-1L)
            if (!done || len < 0 || len > Int.MaxValue - 8) return null
            val payload = readFully(len.toInt)
            if (payload == null) return null
            return Record(hs.toMap, payload)
          }
          // non-WARC line: skip and keep seeking
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
