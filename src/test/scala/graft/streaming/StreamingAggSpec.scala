package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming dailyFromHourly matches the batch aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double, Double)]
    val df = mem.toDF().toDF("timestamp", "temp", "precip")

    val out = StreamingAgg.dailyFromHourlyStream(df,
      watermark = "0 seconds")
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("daily_out").start()
    try {
      val rows = for (d <- 1 to 3; h <- 0 until 24) yield (
        java.sql.Timestamp.valueOf(f"2016-01-0$d $h%02d:00:00"),
        270.0 + d + h * 0.5, if (h % 6 == 0) 1.0 else 0.0)
      mem.addData(rows)
      q.processAllAvailable()
      val got = spark.table("daily_out").orderBy($"date").collect()
      assert(got.length == 3)
      val first = got(0)
      assert(first.getAs[Double]("tmin") == 271.0)
      assert(first.getAs[Double]("tmax") == 271.0 + 23 * 0.5)
      assert(first.getAs[Double]("precip") == 4.0)
    } finally q.stop()
  }

  test("sessionStream: native session_window sessions match the gaps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val df = mem.toDF().toDF("user", "ts")
    val out = StreamingAgg.sessionStream(df, "ts", Seq("user"),
      gap = "30 minutes", watermark = "1 hour")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("session_out").start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      mem.addData(Seq(
        ("u1", ts("2016-01-01 10:00:00")),
        ("u1", ts("2016-01-01 10:10:00")), // merges (< 30 min)
        ("u1", ts("2016-01-01 11:00:00")), // new session
        ("u1", ts("2016-01-01 11:20:00")), // merges
        ("u2", ts("2016-01-01 10:05:00"))))
      q.processAllAvailable()
      // sentinel far in the future pushes the watermark past all
      // sessions so append mode flushes them
      mem.addData(Seq(("u9", ts("2016-01-02 00:00:00"))))
      q.processAllAvailable()
      val got = spark.table("session_out")
        .where($"user" =!= "u9")
        .orderBy($"user", $"session_start").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString,
          r.getLong(3)))
      assert(got.toSeq == Seq(
        ("u1", "2016-01-01 10:00:00.0", 2L),
        ("u1", "2016-01-01 11:00:00.0", 2L),
        ("u2", "2016-01-01 10:05:00.0", 1L)))
    } finally q.stop()
  }

  test("dedupStream keeps the first fingerprint occurrence only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, String)]
    val df = mem.toDF().toDF("timestamp", "fp", "text")
    val q = StreamingAgg.dedupStream(df, "fp", watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    try {
      mem.addData(Seq(
        (java.sql.Timestamp.valueOf("2016-01-01 00:00:00"), "a", "one"),
        (java.sql.Timestamp.valueOf("2016-01-01 00:01:00"), "b", "two"),
        (java.sql.Timestamp.valueOf("2016-01-01 00:02:00"), "a", "dup")))
      q.processAllAvailable()
      // a duplicate arriving in a LATER batch within the watermark is
      // dropped by the fingerprint state too
      mem.addData(Seq(
        (java.sql.Timestamp.valueOf("2016-01-01 00:03:00"), "b", "dup2"),
        (java.sql.Timestamp.valueOf("2016-01-01 00:04:00"), "c", "new")))
      q.processAllAvailable()
      val got = spark.table("dedup_out").orderBy($"timestamp").collect()
      assert(got.map(_.getAs[String]("fp")).toSeq == Seq("a", "b", "c"))
      assert(got.map(_.getAs[String]("text")).toSeq ==
        Seq("one", "two", "new"))
    } finally q.stop()
  }

  test("stateful gapStream emits gaps across batches, per station") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingAgg.Obs]
    val q = StreamingAgg.gapStream(mem.toDS(), stepSeconds = 3600L)
      .writeStream.outputMode("append").format("memory")
      .queryName("gap_out").start()
    def obs(st: String, t: String) =
      StreamingAgg.Obs(st, java.sql.Timestamp.valueOf(t), 1.0)
    try {
      mem.addData(Seq(obs("s1", "2016-01-01 00:00:00"),
        obs("s1", "2016-01-01 01:00:00"),
        obs("s2", "2016-01-01 00:00:00")))
      q.processAllAvailable()
      // batch 2: s1 continues seamlessly, s2 skips two hours -> one gap
      // spanning the batch boundary via the kept state
      mem.addData(Seq(obs("s1", "2016-01-01 02:00:00"),
        obs("s2", "2016-01-01 03:00:00")))
      q.processAllAvailable()
      val got = spark.table("gap_out").collect()
      assert(got.length == 1)
      assert(got(0).getAs[String]("station") == "s2")
      assert(got(0).getAs[Long]("gap_seconds") == 3 * 3600L)
    } finally q.stop()
  }

  test("batch disaggregators run unchanged on a streaming daily feed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val days = Seq(
      (java.sql.Date.valueOf("2016-03-01"), 4.8, 12.0),
      (java.sql.Date.valueOf("2016-03-02"), 2.4, 0.0),
      (java.sql.Date.valueOf("2016-03-03"), 7.2, 3.6))
    val mem = MemoryStream[(java.sql.Date, Double, Double)]
    val streamDaily = mem.toDF().toDF("date", "wind", "precip")
    // the BATCH operators applied directly to the unbounded frame
    val windQ = graft.disagg.Wind.disaggregate(
        streamDaily.select($"date", $"wind"),
        method = "cosine", a = 0.4, b = 1.0, tShift = 13.0)
      .writeStream.outputMode("append").format("memory")
      .queryName("wind_stream").start()
    val precQ = graft.disagg.Precipitation.equal(
        streamDaily.select($"date", $"precip"))
      .writeStream.outputMode("append").format("memory")
      .queryName("prec_stream").start()
    try {
      mem.addData(days.take(2))
      windQ.processAllAvailable(); precQ.processAllAvailable()
      mem.addData(days.drop(2)) // a later micro-batch appends cleanly
      windQ.processAllAvailable(); precQ.processAllAvailable()
      val batchDaily = days.toDF("date", "wind", "precip")
      val windBatch = graft.disagg.Wind.disaggregate(
          batchDaily.select($"date", $"wind"),
          method = "cosine", a = 0.4, b = 1.0, tShift = 13.0)
        .orderBy($"timestamp").collect()
      val windStream = spark.table("wind_stream")
        .orderBy($"timestamp").collect()
      assert(windStream.map(_.toSeq).toSeq ==
        windBatch.map(_.toSeq).toSeq)
      assert(windStream.length == 72)
      val precBatch = graft.disagg.Precipitation.equal(
          batchDaily.select($"date", $"precip"))
        .orderBy($"timestamp").collect()
      val precStream = spark.table("prec_stream")
        .orderBy($"timestamp").collect()
      assert(precStream.map(_.toSeq).toSeq ==
        precBatch.map(_.toSeq).toSeq)
      // mass conservation holds per appended micro-batch too
      assert(math.abs(precStream.map(_.getDouble(1)).sum -
        days.map(_._3).sum) < 1e-9)
    } finally { windQ.stop(); precQ.stop() }
  }

  test("text scoring + decontamination run unchanged on a doc stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.text.TextAnalysis
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again again"),
      (2L, "der schnelle braune fuchs springt und und und und und"),
      (3L, "totally novel words with no benchmark overlap whatsoever"))
    val probes = Seq((100L, "the quick brown fox jumps"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val streamDocs = mem.toDF().toDF("doc_id", "text")
    // per-doc scoring: pure expressions, no state needed
    val scored = streamDocs
      .withColumn("tok", TextAnalysis.tokens(lower($"text")))
      .select($"doc_id",
        TextAnalysis.tokenCount($"text").as("n_tokens"),
        TextAnalysis.languageId($"text").as("lang"),
        round(TextAnalysis.qualityScore($"text"), 6).as("quality"),
        TextAnalysis.topCount($"tok").as("top_word_n"))
    val scoreQ = scored.writeStream.outputMode("append")
      .format("memory").queryName("score_stream").start()
    // decontamination counts shared grams per doc — a per-doc
    // aggregation, so the streaming form is foreachBatch: each doc is
    // wholly inside its micro-batch and the probe side is static, so
    // per-batch results equal the batch run
    val deconRows = scala.collection.mutable.ArrayBuffer
      .empty[Seq[Any]]
    val deconQ = streamDocs.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        deconRows.synchronized {
          deconRows ++= graft.text.Curation.decontaminate(
              batch, probes, "text", "doc_id", k = 3)
            .collect().map(_.toSeq)
        }
        ()
      }.start()
    try {
      mem.addData(docs.take(2))
      scoreQ.processAllAvailable(); deconQ.processAllAvailable()
      mem.addData(docs.drop(2))
      scoreQ.processAllAvailable(); deconQ.processAllAvailable()
      val batchDocs = docs.toDF("doc_id", "text")
      val scoreBatch = batchDocs
        .withColumn("tok", TextAnalysis.tokens(lower($"text")))
        .select($"doc_id",
          TextAnalysis.tokenCount($"text").as("n_tokens"),
          TextAnalysis.languageId($"text").as("lang"),
          round(TextAnalysis.qualityScore($"text"), 6).as("quality"),
          TextAnalysis.topCount($"tok").as("top_word_n"))
        .orderBy($"doc_id").collect()
      val scoreStream = spark.table("score_stream")
        .orderBy($"doc_id").collect()
      assert(scoreStream.map(_.toSeq).toSeq ==
        scoreBatch.map(_.toSeq).toSeq)
      val deconBatch = graft.text.Curation.decontaminate(
          batchDocs, probes, "text", "doc_id", k = 3)
        .orderBy($"doc_id").collect().map(_.toSeq).toSeq
      val deconStream = deconRows.synchronized {
        deconRows.sortBy(_.head.asInstanceOf[Long]).toSeq }
      assert(deconStream == deconBatch)
      // doc 1 shares "the quick brown" etc with the probe; 3 is clean
      assert(deconStream.find(_.head == 1L).get(2) == 1L)
      assert(deconStream.find(_.head == 3L).get(2) == 0L)
    } finally { scoreQ.stop(); deconQ.stop() }
  }

  test("curation filters, redaction and chunking run on a doc stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.text.Curation
    val docs = Seq(
      (1L, (1 to 30).map(i => "word" + i).mkString(" ") +
        " mail me: a@b.co now"),
      (2L, "- bullet\n- bullet\n- bullet"),
      (3L, (1 to 40).map(i => "tok" + i).mkString(" ")))
    val mem = MemoryStream[(Long, String)]
    val streamDocs = mem.toDF().toDF("doc_id", "text")
    // heuristic stats + redaction are per-row expressions; chunking is
    // an explode — all append-safe with NO state, so the streaming
    // plans are literally the batch operators applied to the stream
    val curated = Curation.heuristicStats(
        streamDocs.withColumn("text", Curation.redactPii($"text")),
        "text", Curation.HeuristicBounds(minWords = 20))
      .select($"doc_id", $"text", $"n_words", $"keep")
    val chunks = Curation.chunkTokens(
      streamDocs, "text", Seq("doc_id"), maxTokens = 16, stride = 8)
    val q1 = curated.writeStream.outputMode("append")
      .format("memory").queryName("curate_stream").start()
    val q2 = chunks.writeStream.outputMode("append")
      .format("memory").queryName("chunk_stream").start()
    try {
      mem.addData(docs.take(2))
      q1.processAllAvailable(); q2.processAllAvailable()
      mem.addData(docs.drop(2))
      q1.processAllAvailable(); q2.processAllAvailable()
      val batchDocs = docs.toDF("doc_id", "text")
      val curBatch = Curation.heuristicStats(
          batchDocs.withColumn("text", Curation.redactPii($"text")),
          "text", Curation.HeuristicBounds(minWords = 20))
        .select($"doc_id", $"text", $"n_words", $"keep")
        .orderBy($"doc_id").collect().map(_.toSeq).toSeq
      val curStream = spark.table("curate_stream")
        .orderBy($"doc_id").collect().map(_.toSeq).toSeq
      assert(curStream == curBatch)
      // the email was redacted BEFORE stats, in-stream
      assert(curStream.head(1).asInstanceOf[String].contains("<EMAIL>"))
      assert(curStream.map(r => (r.head, r(3))) ==
        Seq((1L, 1L), (2L, 0L), (3L, 1L)))
      val chBatch = Curation.chunkTokens(batchDocs, "text",
          Seq("doc_id"), maxTokens = 16, stride = 8)
        .orderBy($"doc_id", $"chunk_idx").collect().map(_.toSeq).toSeq
      val chStream = spark.table("chunk_stream")
        .orderBy($"doc_id", $"chunk_idx").collect().map(_.toSeq).toSeq
      assert(chStream == chBatch && chStream.size > docs.size)
    } finally { q1.stop(); q2.stop() }
  }

  test("cascade calibration classification: stream equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 12 pairs: dry runs, wet runs, a null hour (numpy NaN quirk: the
    // NaN-adjacent wet parent p7 must land in `isolated`), and a WET
    // FINAL pair (p11) that only the sentinel can flush.
    val hourly: Seq[Option[Double]] = Seq(
      Some(0.0), Some(0.0), Some(3.0), Some(2.0), Some(4.0), Some(0.0),
      Some(0.0), Some(0.0), Some(1.0), Some(1.0), Some(0.0), Some(5.0),
      None, Some(2.0), Some(6.0), Some(7.0), Some(0.0), Some(0.0),
      Some(2.0), Some(3.0), Some(8.0), Some(0.0), Some(0.0), Some(9.0))
    val meanvol = 4.5
    def ts(h: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2016-01-01 00:00:00").getTime +
        h * 3600000L)

    // batch: the same series through the real cascade classification
    val batchDf = hourly.zipWithIndex.map { case (v, i) =>
      (i.toLong, v, ts(i))
    }.toDF("idx", "v", "ts")
    val batch = graft.cascade.Cascade.classifiedPairs(batchDf, meanvol)
      .select($"pair", $"v", $"r1", $"r2", $"ba", $"bt")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4), r.getInt(5)))
      .sortBy(_._1).toSeq

    val mem = MemoryStream[StreamingAgg.PrecipObs]
    val out = StreamingAgg.cascadeClassifyStream(mem.toDS(), meanvol)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("cascade_cls").start()
    try {
      def obs(range: Range) = range.map(h =>
        StreamingAgg.PrecipObs("s1", ts(h), hourly(h)))
      // odd split boundaries exercise the cross-batch half-pair state
      mem.addData(obs(0 until 9)); q.processAllAvailable()
      mem.addData(obs(9 until 17)); q.processAllAvailable()
      mem.addData(obs(17 until 24)); q.processAllAvailable()
      // dry sentinel pair flushes the final wet parent — the streaming
      // equivalent of the batch operator's lead=false at the edge
      mem.addData(Seq(
        StreamingAgg.PrecipObs("s1", ts(24), Some(0.0)),
        StreamingAgg.PrecipObs("s1", ts(25), Some(0.0))))
      q.processAllAvailable()
      // the stream indexes pairs by absolute epoch hour / 2 (a stream
      // has no global row numbering); normalize to the series-relative
      // index the batch positional pairing uses
      val base = ts(0).getTime / 3600000L / 2
      val streamed = spark.table("cascade_cls")
        .collect()
        .map(r => (r.getLong(1) - base, r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getInt(5), r.getInt(6)))
        .sortBy(_._1).toSeq
      assert(streamed == batch)
      // p7 (children 6,7) follows the NaN parent -> isolated (bt 4)
      val p7 = streamed.find(_._1 == 7L).get
      assert(p7._5 == 1 && p7._6 == 4)
      // the final wet pair flushed with next = dry
      assert(streamed.exists(_._1 == 11L))
      // calibration count matrices (nb/n01/n10/nxx per (ba, bt)) agree
      def counts(rows: Seq[(Long, Double, Double, Double, Int, Int)]) =
        rows.groupBy(r => (r._5, r._6)).view.mapValues { g =>
          (g.size, g.count(r => r._3 <= 0 && r._4 > 0),
            g.count(r => r._3 > 0 && r._4 <= 0),
            g.count(r => r._3 > 0 && r._4 > 0))
        }.toMap
      assert(counts(streamed) == counts(batch))
    } finally q.stop()
  }

  test("completeness stream flags short days") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val df = mem.toDF().toDF("timestamp", "temp")
    val q = StreamingAgg.completenessStream(df, "0 seconds")
      .writeStream.outputMode("complete").format("memory")
      .queryName("complete_out").start()
    try {
      val full = (0 until 24).map(h =>
        (java.sql.Timestamp.valueOf(f"2016-02-01 $h%02d:00:00"), 1.0))
      val short = (0 until 20).map(h =>
        (java.sql.Timestamp.valueOf(f"2016-02-02 $h%02d:00:00"), 1.0))
      mem.addData(full ++ short)
      q.processAllAvailable()
      val got = spark.table("complete_out").orderBy($"date").collect()
      assert(got.length == 2)
      assert(got(0).getAs[Boolean]("complete"))
      assert(!got(1).getAs[Boolean]("complete"))
    } finally q.stop()
  }
}
