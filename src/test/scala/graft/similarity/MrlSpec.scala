package graft.similarity

import graft.TestSpark
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Matryoshka coarse-to-fine: truncated-prefix shortlist + exact
  * full-dim rescore. */
class MrlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val emb = Tables.table(spark, TestSpark.sfDir, "embeddings").cache()

  test("prefixTable stores exactly the first prefixDim dimensions") {
    val r = Similarity.prefixTable(emb, "embedding", "vec_id", 16)
      .where($"vec_id" === 3).collect().head
    val full = emb.where($"vec_id" === 3)
      .select($"embedding").collect().head.getSeq[Float](0)
    assert(r.getSeq[Float](1) == full.take(16))
  }

  test("corpus-covering refineFactor reproduces brute force exactly; " +
      "rescoring never ranks below the raw prefix ranking") {
    val q = emb.where($"vec_id" < 8)
    val prefixes = Similarity.prefixTable(emb, "embedding", "vec_id", 16)
    val exact = Similarity.bruteForceTopK(emb, q, "embedding",
        "vec_id", "vec_id", k = 5)
      .select($"query_id", $"corpus_id", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = Similarity.prefixTopKRescored(prefixes, emb, q,
        "embedding", "vec_id", "vec_id", k = 5, prefixDim = 16,
        refineFactor = 100)
      .select($"query_id", $"corpus_id", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == exact)
    val exactPairs = exact.map(t => (t._1, t._2))
    def recall(s: Set[(Long, Long)]) =
      exactPairs.intersect(s).size.toDouble / exactPairs.size
    // the raw prefix ranking, evaluated as if it were final
    val coarseOnly = Similarity.bruteForceTopK(
        prefixes.select($"vec_id", $"prefix".as("embedding")),
        Similarity.prefixTable(q, "embedding", "vec_id", 16)
          .select($"vec_id", $"prefix".as("embedding")),
        "embedding", "vec_id", "vec_id", k = 5)
      .select($"query_id", $"corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rescored = Similarity.prefixTopKRescored(prefixes, emb, q,
        "embedding", "vec_id", "vec_id", k = 5, prefixDim = 16,
        refineFactor = 4)
      .select($"query_id", $"corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(recall(rescored) >= recall(coarseOnly),
      s"rescored=${recall(rescored)} coarse=${recall(coarseOnly)}")
  }

  test("a stored prefix table built under a different prefixDim " +
      "fails loudly instead of returning an empty result") {
    val stored8 = Similarity.prefixTable(emb, "embedding", "vec_id", 8)
    val e = intercept[Throwable] {
      Similarity.prefixTopKRescored(stored8, emb, emb.limit(1),
        "embedding", "vec_id", "vec_id", k = 5, prefixDim = 16)
        .collect()
    }
    def chain(t: Throwable): String = {
      var m = List.empty[String]; var c = t
      while (c != null) { m ::= String.valueOf(c.getMessage); c = c.getCause }
      m.mkString(" | ")
    }
    assert(chain(e).contains("different truncation"), chain(e))
  }

  test("named errors on bad prefixDim / refineFactor") {
    val e1 = intercept[IllegalArgumentException] {
      Similarity.prefixTable(emb, "embedding", "vec_id", 0)
    }
    assert(e1.getMessage.contains("prefixDim"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.prefixTopKRescored(
        Similarity.prefixTable(emb, "embedding", "vec_id", 16), emb,
        emb.limit(1), "embedding", "vec_id", "vec_id", k = 5,
        prefixDim = 16, refineFactor = 0)
    }
    assert(e2.getMessage.contains("refineFactor"))
  }
}
