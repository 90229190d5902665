package graft.core

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Zipf-ish stream: item i appears ~N/(i+1) times, plus a long tail
  private def zipf(n: Int) = (0 until n).flatMap { j =>
    val head = (0 until 8).filter(i => j % (i + 1) == 0)
      .map(i => s"hot$i")
    head :+ s"tail${j % (n / 4)}"
  }

  test("guarantees hold vs exact counts under ANY partitioning: " +
      "bounds contain truth, nothing above threshold is missed") {
    val items = zipf(4000)
    val n = items.size.toLong
    val exact = items.groupBy(identity).map { case (i, xs) =>
      i -> xs.size.toLong
    }
    for (parts <- Seq(1, 7, 32)) {
      val df = items.toDF("item").repartition(parts)
      val k = 16
      val hits = HeavyHitters.heavyHitters(df, "item", k)
      assert(hits.size <= k)
      val err = hits.headOption.map(_.err).getOrElse(0L)
      // classical mergeable bound: total slack <= N/(k+1)
      assert(err <= n / (k + 1), s"parts=$parts err=$err n=$n")
      // bounds contain the truth for every reported item
      hits.foreach { h =>
        val t = exact(h.item)
        assert(h.countMin <= t && t <= h.countMin + err,
          s"parts=$parts ${h.item}: min=${h.countMin} err=$err true=$t")
      }
      // NO FALSE NEGATIVES above the threshold
      val reported = hits.map(_.item).toSet
      exact.foreach { case (i, t) =>
        if (t > n / (k + 1))
          assert(reported.contains(i), s"parts=$parts missed $i ($t)")
      }
    }
  }

  test("exploded variant over token arrays finds the planted " +
      "boilerplate line without any shuffle") {
    // every third doc carries the same banner line
    val docs = (0 until 900).map { i =>
      val lines = Seq(s"unique content $i", s"more text ${i * 7}") ++
        (if (i % 3 == 0) Seq("subscribe to our newsletter") else Nil)
      (i.toLong, lines)
    }.toDF("doc_id", "lines")
    val hits = HeavyHitters.heavyHittersExploded(docs.repartition(11),
      col("lines"), k = 8)
    assert(hits.nonEmpty && hits.head.item ==
      "subscribe to our newsletter")
    assert(hits.head.countMin <= 300 &&
      300 <= hits.head.countMin + hits.head.err)
  }

  test("LONG variant: guarantees hold vs exact counts under any " +
      "partitioning — the hashed-line scan dedupLinesApprox runs") {
    // same Zipf stream, items hashed to longs (stand-in for
    // xxhash64(line)); identical bound structure must hold
    val items = zipf(4000).map(s => s.hashCode.toLong * 2654435761L)
    val n = items.size.toLong
    val exact = items.groupBy(identity).map { case (i, xs) =>
      i -> xs.size.toLong
    }
    for (parts <- Seq(1, 7, 32)) {
      val df = items.map(Tuple1(_)).toDF("h")
        .select(array(col("h")).as("arr")).repartition(parts)
      val k = 16
      val hits = HeavyHitters.heavyHittersLongsExploded(df,
        col("arr"), k)
      assert(hits.size <= k)
      val err = hits.headOption.map(_.err).getOrElse(0L)
      assert(err <= n / (k + 1), s"parts=$parts err=$err n=$n")
      hits.foreach { h =>
        val t = exact(h.item)
        assert(h.countMin <= t && t <= h.countMin + err,
          s"parts=$parts ${h.item}: min=${h.countMin} err=$err true=$t")
      }
      val reported = hits.map(_.item).toSet
      exact.foreach { case (i, t) =>
        if (t > n / (k + 1))
          assert(reported.contains(i), s"parts=$parts missed $i ($t)")
      }
    }
    // and the string/long paths agree item-for-item on one partition
    // when k covers the alphabet (both exact there)
    val tiny = Seq(1L, 1L, 2L, 3L, 1L, 2L)
    val lh = HeavyHitters.heavyHittersLongsExploded(
      tiny.map(Tuple1(_)).toDF("h").select(array(col("h")).as("a"))
        .coalesce(1), col("a"), k = 8)
    assert(lh.map(h => h.item -> h.countMin).toMap ==
      Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    assert(lh.head.err == 0L)
  }

  test("single-partition MG on a tiny stream is exact when k covers " +
      "the alphabet; nulls are skipped") {
    val df = Seq("a", "a", "b", null, "a", "c", "b")
      .toDF("item").coalesce(1)
    val hits = HeavyHitters.heavyHitters(df, "item", k = 8)
    assert(hits.map(h => h.item -> h.countMin).toMap ==
      Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    assert(hits.head.err == 0L)
  }
}
