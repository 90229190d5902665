package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT + whole-stage-codegen compilation otherwise lands
    // on whichever query happens to run first (~5 s of measured noise).
    // One small aggregate+window+join pass touches the main codegen paths.
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val r = spark.range(0, 100000, 1, 4)
        .select(col("id"), (col("id") % 97).as("k"),
          (col("id") * 0.5).as("v"))
      val agg = r.groupBy(col("k")).agg(sum(col("v")).as("s"))
      agg.join(r, "k")
        .withColumn("rn",
          row_number().over(Window.partitionBy(col("k"))
            .orderBy(col("id"))))
        .where(col("rn") <= 3).count()
    }
    // Sorted order: SparkEntry.queries is a HashMap, whose iteration
    // order shifts whenever a query is added — which would hand the
    // residual first-run noise to a different query each round. Three
    // timed passes, min per query (the ScaleSmoke convention):
    // single-shot numbers at this scale carry multi-second JIT/GC —
    // and on a contended box 1.5-2× ambient — noise that lands on
    // arbitrary queries and poisons round-over-round comparison.
    // Optional comma-separated filter for local iteration on specific
    // queries; unset (the driver's mode) benches everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def pass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .map { case (name, fn) =>
        val t0 = System.nanoTime()
        // a failing query must not kill the whole bench, but it must
        // not masquerade as a fast run either — flag it on stderr
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            val msg = Option(e.getMessage).getOrElse("")
              .linesIterator.nextOption.getOrElse("")
            System.err.println(
              s"BENCH ERROR $name: ${e.getClass.getSimpleName}: $msg")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    val nPasses =
      sys.env.get("SPARK_GRAFT_PASSES").map(_.toInt).getOrElse(3)
    val passes = (1 to nPasses).map(_ => pass())
    val results = passes.head.indices.map { i =>
      passes.head(i)._1 -> passes.map(_(i)._2).min }
    // The driver captures only the TAIL of stdout (~2.5 KB) and
    // parses the last metric line it finds — a full-name per-query
    // map (~3.5 KB at 143 queries) never fit, so 12 rounds shipped
    // truncated mid-token. Three-part output, smallest LAST:
    //  1. bench_full.json on disk — full names, microsecond
    //     precision, for judges;
    //  2. two {"metric":"part"} stdout lines carrying the full-name
    //     map (a "part" metric name, so a parser aggregating "total"
    //     lines can never double-count — the round-12 double-printed
    //     duplicate could);
    //  3. ONE final summary line whose per-query keys are the bare
    //     qNN ids (unique by construction, asserted here): ~1.9 KB,
    //     inside the capture window with margin.
    def ms(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def us(v: Double): String = "%.6f".formatLocal(java.util.Locale.ROOT, v)
    def jmap(m: Seq[(String, Double)], fmt: Double => String): String =
      m.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_full.json"),
      (s"""{"metric":"total","value":${us(total)},"unit":"sec",""" +
        s""""queries":${jmap(results, us)},"sf":"$sfDir"}""" + "\n")
        .getBytes("UTF-8"))
    // grouped(0) throws — an over-narrow SPARK_GRAFT_ONLY filter must
    // yield empty-but-valid output, not a crash
    val halves =
      if (results.isEmpty) Seq.empty
      else results.grouped((results.size + 1) / 2).toSeq
    halves.zipWithIndex.foreach { case (h, i) =>
      println(s"""{"metric":"part","i":${i + 1},"n":${halves.size},""" +
        s""""queries":${jmap(h, ms)}}""")
    }
    val bare = results.map { case (k, v) => k.takeWhile(_ != '_') -> v }
    // a colliding bare id would silently merge two queries' times;
    // fall back to full names (truncated tail) rather than lie
    val summary =
      if (bare.map(_._1).distinct.size == bare.size) bare else results
    // The capture window is 2,000 bytes of stdout TAIL and must also
    // hold sbt's "[success] Total time ..." footer (~80 B) plus the
    // "[info] " prefix: round 13's 1,982-byte line (3-decimal values,
    // a "unit" field) overflowed by ~65 B and shipped cut mid-token —
    // the 13th consecutive unparseable round. 2-decimal values and no
    // unit field put 154 bare-id queries at ~1,840 B (BenchLineSpec
    // asserts the bound against the live registry); full-precision
    // numbers stay in bench_full.json and the "part" lines above.
    println(summaryLine(summary, total, sfDir))
    spark.stop()
  }

  /** The driver-facing one-line summary; factored out so a spec can
    * assert the rendered length stays inside the capture window. */
  def summaryLine(queries: Seq[(String, Double)], total: Double,
      sfDir: String): String = {
    def cs(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val q = queries.map { case (k, v) => "\"" + k + "\":" + cs(v) }
      .mkString("{", ",", "}")
    s"""{"metric":"total","value":${cs(total)},"queries":$q,"sf":"$sfDir"}"""
  }
}
