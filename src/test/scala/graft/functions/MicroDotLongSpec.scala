package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native integer-micro dot ≡ the composed zip_with/aggregate form it
  * replaces — including negative half-way products (where Math.round
  * and SQL half-up disagree) and the null/mismatch contract. */
class MicroDotLongSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def composed(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) =>
      round(x.cast("double") * y.cast("double") * 1e12).cast("long")),
      lit(0L), (acc, v) => acc + v)

  test("bit-identical to the composed form on float arrays, " +
      "negatives and half-way products included") {
    // -0.5e-12·1e12 = -0.5 exactly: half-up says -1, Math.round says 0
    val rows = Seq(
      (Array(0.25f, -0.5f, 1.5f), Array(2.0f, 3.0f, -4.0f)),
      (Array(-0.0000005f, 1.0f), Array(0.000001f, 1.0f)),
      (Array.empty[Float], Array.empty[Float]),
      (Array(0.1f, 0.2f, 0.3f, 0.4f), Array(-0.4f, 0.3f, -0.2f, 0.1f)))
    val df = rows.toDF("a", "b")
      .select(GraftFunctions.microDotLong($"a", $"b").as("native"),
        composed($"a", $"b").as("ref"))
    df.collect().foreach(r =>
      assert(r.getLong(0) == r.getLong(1), r.toString))
    // exact negative half-way on doubles through the same path
    val d = Seq((Array(-0.5e-12), Array(1.0)))
      .toDF("a", "b")
      .select(GraftFunctions.microDotLong($"a", $"b").as("native"),
        composed($"a", $"b").as("ref"))
      .head()
    assert(d.getLong(0) == d.getLong(1) && d.getLong(0) == -1L)
  }

  test("null array and length mismatch yield null, like the " +
      "composed form") {
    val df = Seq(
      (Some(Array(1.0f)), None: Option[Array[Float]]),
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f))))
      .toDF("a", "b")
      .select(GraftFunctions.microDotLong($"a", $"b").as("native"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("non-finite products and long overflow fail loudly (the " +
      "composed ANSI cast/sum stance), never wrap or NPE") {
    // NaN / Infinity products → ArithmeticException naming the tool
    val nan = intercept[ArithmeticException] {
      MicroDotLong.roundMicro(Double.NaN)
    }
    assert(nan.getMessage.contains("graft_microdot"))
    intercept[ArithmeticException] {
      MicroDotLong.roundMicro(Double.PositiveInfinity)
    }
    // finite input whose SCALED product overflows the double range
    intercept[ArithmeticException] {
      MicroDotLong.roundMicro(1e300)
    }
    // rounded magnitude past Long range → loud, not saturating
    intercept[ArithmeticException] { MicroDotLong.roundMicro(1e7) }
    assert(MicroDotLong.roundMicro(9.0e6) == 9000000000000000000L)
    // accumulator overflow → loud, not wrapping
    intercept[ArithmeticException] {
      MicroDotLong.addMicro(Long.MaxValue, 1L)
    }
    // end-to-end through the codegen path
    val e = intercept[Exception] {
      Seq((Array(Double.NaN), Array(1.0))).toDF("a", "b")
        .select(GraftFunctions.microDotLong($"a", $"b")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage)
        .exists(_.contains("graft_microdot"))))
  }
}
