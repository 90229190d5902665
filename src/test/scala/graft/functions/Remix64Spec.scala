package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class Remix64Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("remix64 wraps like Java long arithmetic, keeps nulls") {
    val a = 0x9E3779B97F4A7C15L | 1L
    val b = -7046029254386353131L
    val xs = Seq(0L, 1L, -5L, Long.MaxValue, Long.MinValue, 42L)
    val got = xs.toDF("x").select(Remix64($"x", a, b))
      .collect().map(_.getLong(0))
    assert(got.toSeq == xs.map(x => x * a + b)) // wrap, never throw
    val n = Seq[Option[Long]](Some(3L), None).toDF("x")
      .select(Remix64($"x", a, b)).collect()
    assert(n(0).getLong(0) == 3L * a + b && n(1).isNullAt(0))
  }

  test("distinct constants induce distinct orderings of uniform input") {
    // the property the LSH min-agg relies on: two remixes of the same
    // uniform values disagree about which element is the minimum often
    // enough to act as independent min-wise orderings
    val vals = (0 until 64).map(i =>
      scala.util.hashing.byteswap64(i.toLong + 12345))
    val df = vals.toDF("x")
    val mins = (0 until 16).map { i =>
      def sm(x0: Long): Long = {
        var z = x0 + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      val remixed = df.select($"x", Remix64($"x", sm(2L * i) | 1L,
        sm(2L * i + 1)).as("h"))
      remixed.orderBy($"h").select($"x").head().getLong(0)
    }
    assert(mins.distinct.size > 8, s"argmin collapse: $mins")
  }
}
