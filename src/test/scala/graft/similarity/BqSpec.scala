package graft.similarity

import graft.TestSpark
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binary quantization: sign-bit packing, Hamming ranking, and the
  * oversample-then-rescore search. */
class BqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val emb = Tables.table(spark, TestSpark.sfDir, "embeddings").cache()

  test("bqSignBits packs 32 bits per long word, hand-checked") {
    val df = Seq(
      (1L, Seq(1f, -1f, 0f, -2f, 3f)), // signs 1,0,1,0,1 -> 0b10101
      (2L, Seq.fill(33)(1f)), // 33 non-negatives -> full word + bit 0
      (3L, Seq.fill(64)(-1f)) // all negative -> two zero words
    ).toDF("id", "v")
    val got = df.select($"id", Similarity.bqSignBits($"v").as("bits"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq(21L)) // 1 + 4 + 16
    assert(got(2L) == Seq(0xFFFFFFFFL, 1L))
    assert(got(3L) == Seq(0L, 0L))
  }

  test("bqHamming over packed words == dimension-wise sign " +
      "disagreement count") {
    val q = emb.where($"vec_id" === 0)
      .select($"embedding".as("qv")).limit(1)
    val joined = emb.crossJoin(broadcast(q))
    val packed = joined.select($"vec_id",
      Similarity.bqHamming(Similarity.bqSignBits($"embedding"),
        Similarity.bqSignBits($"qv")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val unpacked = joined.select($"vec_id",
      aggregate(zip_with($"embedding", $"qv",
        (a, b) => when((a >= 0) =!= (b >= 0), 1L).otherwise(0L)),
        lit(0L), (acc, v) => acc + v).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packed == unpacked)
  }

  test("bqTopK: rank 1 is Hamming 0 for a self-query; ties " +
      "deterministic under repartitioning") {
    val q = emb.where($"vec_id" < 3)
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.bqTopK(c, q, "embedding", "vec_id", "vec_id", k = 5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getInt(3))).toSet
    val rows = run(emb)
    assert(rows.size == 15)
    // self-distance is 0, so every query's rank-1 hamming must be 0
    val top = rows.filter(_._4 == 1)
    assert(top.size == 3 && top.forall(_._3 == 0L))
    assert(rows == run(emb.repartition(17)))
  }

  test("bq stored-code table round-trips through parquet") {
    val dir = java.nio.file.Files
      .createTempDirectory("bqcodes").toString
    Similarity.bqCodeTable(emb, "embedding", "vec_id")
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val q = emb.where($"vec_id" < 4)
    val a = Similarity.bqTopKFromBits(stored, q, "embedding",
        "vec_id", "vec_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .toSet
    val b = Similarity.bqTopK(emb, q, "embedding", "vec_id",
        "vec_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .toSet
    assert(a == b)
  }

  test("bqTopKRescored at a corpus-covering refineFactor equals " +
      "brute force exactly; recall never below plain BQ") {
    val q = emb.where($"vec_id" < 8)
    val bits = Similarity.bqCodeTable(emb, "embedding", "vec_id")
    val exact = Similarity.bruteForceTopK(emb, q, "embedding",
        "vec_id", "vec_id", k = 5)
      .select($"query_id", $"corpus_id", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // k' = 5*100 >= corpus size -> all candidates -> exact ranking
    val full = Similarity.bqTopKRescored(bits, emb, q, "embedding",
        "vec_id", "vec_id", k = 5, refineFactor = 100)
      .select($"query_id", $"corpus_id", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == exact)
    val exactPairs = exact.map(t => (t._1, t._2))
    def recall(s: Set[(Long, Long)]) =
      exactPairs.intersect(s).size.toDouble / exactPairs.size
    val plain = Similarity.bqTopK(emb, q, "embedding", "vec_id",
        "vec_id", k = 5)
      .select($"query_id", $"corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rescored = Similarity.bqTopKRescored(bits, emb, q,
        "embedding", "vec_id", "vec_id", k = 5, refineFactor = 4)
      .select($"query_id", $"corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(recall(rescored) >= recall(plain),
      s"rescored=${recall(rescored)} plain=${recall(plain)}")
  }

  test("null bits / dimension-mismatched codes fail LOUDLY instead " +
      "of ranking garbage at 1 (ascending window, nulls-first)") {
    def chain(t: Throwable): String = {
      var m = List.empty[String]; var c = t
      while (c != null) { m ::= String.valueOf(c.getMessage); c = c.getCause }
      m.mkString(" | ")
    }
    // corpus packed at 64 dims (2 words), query at 16 (1 word):
    // zip_with pads the short side with nulls -> null Hamming without
    // the guard. (A mismatch WITHIN one word — e.g. 33 vs 64 dims —
    // packs to equal word counts and compares the padding bits as
    // negative signs: deterministic, same silent-truncation semantics
    // as zip_with cosine over unequal dims everywhere else.)
    val shortQ = Seq((0L, Seq.fill(16)(1f))).toDF("vec_id", "embedding")
    val e1 = intercept[Throwable] {
      Similarity.bqTopK(emb, shortQ, "embedding", "vec_id", "vec_id",
        k = 5).collect()
    }
    assert(chain(e1).contains("dimension mismatch"), chain(e1))
    // a null corpus vector packs to null bits
    val withNull = emb.select($"vec_id",
      when($"vec_id" === 7L, lit(null)).otherwise($"embedding")
        .as("embedding"))
    val e2 = intercept[Throwable] {
      Similarity.bqTopK(withNull, emb.where($"vec_id" < 2),
        "embedding", "vec_id", "vec_id", k = 5).collect()
    }
    assert(chain(e2).contains("null Hamming"), chain(e2))
  }

  test("bqTopKRescored rejects refineFactor < 1") {
    val e = intercept[IllegalArgumentException] {
      Similarity.bqTopKRescored(
        Similarity.bqCodeTable(emb, "embedding", "vec_id"), emb,
        emb.limit(1), "embedding", "vec_id", "vec_id", k = 5,
        refineFactor = 0)
    }
    assert(e.getMessage.contains("refineFactor"))
  }
}
