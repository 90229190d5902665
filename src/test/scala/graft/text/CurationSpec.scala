package graft.text

import graft.TestSpark
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs =
    Tables.table(spark, TestSpark.sfDir, "documents").cache()

  test("qualityFilter keeps ~ the requested fraction, per language") {
    val n = docs.count()
    val kept = Curation.qualityFilter(docs, "text", keepFraction = 0.5)
    val k = kept.count()
    assert(k > 0 && k < n)
    // per-language keep rates all land near 50% (sketch-approximate,
    // ties at the cutoff can push past it)
    val langRates = docs
      .withColumn("lang", TextAnalysis.languageId($"text"))
      .groupBy($"lang").count()
      .join(kept.withColumn("lang", TextAnalysis.languageId($"text"))
        .groupBy($"lang").count().withColumnRenamed("count", "kept"),
        "lang")
      .select($"lang", $"kept" / $"count")
      .collect()
    langRates.foreach { r =>
      val rate = r.getDouble(1)
      assert(rate > 0.3 && rate < 0.75, s"${r.getString(0)}: $rate")
    }
    // the kept docs are the HIGH-quality side: their minimum per-language
    // score >= the dropped docs' ... at least mean-wise
    val scoredAll = docs.withColumn("q",
      TextAnalysis.qualityScore($"text"))
    val meanAll = scoredAll.agg(avg($"q")).head().getDouble(0)
    val meanKept = kept.withColumn("q",
      TextAnalysis.qualityScore($"text")).agg(avg($"q")).head().getDouble(0)
    assert(meanKept > meanAll)
    // schema is untouched (helper columns dropped)
    assert(kept.columns.toSeq == docs.columns.toSeq)
  }

  test("stratifiedSample: deterministic, per-stratum rates, drops rest") {
    val df = spark.range(0, 20000)
      .select($"id",
        element_at(array(lit("en"), lit("de"), lit("fr")),
          (pmod($"id", lit(3)) + 1).cast("int")).as("lang"))
    val fractions = Map("en" -> 0.5, "de" -> 0.1)
    val s1 = Curation.stratifiedSample(df, "lang", fractions, Seq("id"))
    val s2 = Curation.stratifiedSample(df.repartition(13), "lang",
      fractions, Seq("id"))
    // identical rows under a different partitioning
    assert(s1.select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
      s2.select($"id").collect().map(_.getLong(0)).sorted.toSeq)
    val rates = s1.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / 6667.0).toMap
    assert(!rates.contains("fr")) // stratum not in fractions -> dropped
    assert(math.abs(rates("en") - 0.5) < 0.05, s"en ${rates("en")}")
    assert(math.abs(rates("de") - 0.1) < 0.03, s"de ${rates("de")}")
    // a different seed draws a different sample
    val s3 = Curation.stratifiedSample(df, "lang", fractions, Seq("id"),
      seed = 7L)
    assert(s3.select($"id").collect().map(_.getLong(0)).sorted.toSeq !=
      s1.select($"id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("decontaminate flags k-gram overlap with the probe set") {
    val probes = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words alpha beta gamma more tail content here"),
      (2L, "completely clean document with no benchmark overlap at all"),
      // two shared trigrams: "alpha beta gamma", "beta gamma delta"
      (3L, "xx alpha beta gamma delta yy"))
      .toDF("doc_id", "text")
    val r = Curation.decontaminate(corpus, probes, "text", "doc_id",
        k = 3)
      .orderBy($"doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((1L, 1L, 1L), (2L, 0L, 0L), (3L, 2L, 1L)))
  }
}
