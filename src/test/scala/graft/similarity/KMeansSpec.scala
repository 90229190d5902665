package graft.similarity

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // three well-separated planted clusters with deterministic jitter
  private def planted(n: Int) = (0 until n).map { i =>
    val c = i % 3
    val j = (i * 37 % 100) / 1000.0f // jitter < 0.1
    val base = Array.fill(4)(0.0f)
    base(c) = 10.0f
    (i.toLong, c, base.zipWithIndex.map { case (v, d) =>
      v + (if (d == (i % 4)) j else -j)
    }.toSeq)
  }.toDF("vec_id", "planted", "embedding")

  test("planted clusters recover exactly; inertia shrinks from the " +
      "md5 init") {
    val df = planted(90)
    val model = KMeans.fit(df, "embedding", "vec_id", k = 3,
      iters = 4)
    val got = KMeans.assign(df, "embedding", model)
      .select($"planted", $"cluster_id").as[(Int, Int)].collect()
    // every planted group lands in ONE cluster, all three distinct
    val mapping = got.groupBy(_._1).map { case (p, rows) =>
      p -> rows.map(_._2).distinct
    }
    assert(mapping.values.forall(_.size == 1), mapping.toString)
    assert(mapping.values.flatten.toSet.size == 3)
    // fitting reduced total inertia vs the farthest-point init
    val vm = df.select($"vec_id",
      KMeans.quantize($"embedding").as("vm_"))
    val init = KMeans.Model(KMeans.init(vm, "vec_id", 3)._2)
    def inertia(m: KMeans.Model) = KMeans.assign(df, "embedding", m)
      .agg(sum($"dist_sq")).as[Long].head()
    assert(inertia(model) < inertia(init))
  }

  test("fit is EXACTLY invariant under input partitioning — the " +
      "integer-arithmetic guarantee") {
    val df = planted(60)
    val a = KMeans.fit(df, "embedding", "vec_id", 3, 3)
    val b = KMeans.fit(df.repartition(13), "embedding", "vec_id", 3, 3)
    val c = KMeans.fit(df.repartition(4, $"vec_id"), "embedding",
      "vec_id", 3, 3)
    assert(a == b && b == c)
  }

  test("a cluster that wins no rows keeps its previous centroid") {
    // two distinct points, k = 3: one centroid can never win a row
    val df = (0L until 12L).map(i =>
      (i, Seq.fill(3)(if (i % 2 == 0) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
    val model = KMeans.fit(df, "embedding", "vec_id", k = 3,
      iters = 3)
    assert(model.k == 3)
    // all rows still assign, to at most 2 distinct clusters
    val used = KMeans.assign(df, "embedding", model)
      .select($"cluster_id").distinct().as[Int].collect().toSet
    assert(used.size <= 2)
    // the unused centroid survived as one of the init vectors
    val initVecs = KMeans.init(
      df.select($"vec_id", KMeans.quantize($"embedding").as("vm_")),
      "vec_id", 3)._2.toSet
    val unused = (0 until 3).toSet -- used
    unused.foreach(u => assert(initVecs.contains(model.centroids(u))))
  }

  test("roundHalfAway = exact-arithmetic HALF_UP for every sign/" +
      "half/extreme case — no double in the loop") {
    val cases = Seq((5L, 2L), (-5L, 2L), (7L, 2L), (-7L, 2L),
      (1L, 3L), (2L, 3L), (-1L, 3L), (-2L, 3L), (0L, 5L), (6L, 2L),
      (9L, 4L), (-9L, 4L), (Long.MaxValue, 3L), (Long.MinValue, 3L),
      // the driver-red mechanism: quotients whose DOUBLE image sits
      // off the exact half — s.toDouble loses exactness above 2^53
      ((1L << 55) + 1L, 2L), (-(1L << 55) - 1L, 2L))
    cases.foreach { case (s, n) =>
      val want = java.math.BigDecimal.valueOf(s)
        .divide(java.math.BigDecimal.valueOf(n), 0,
          java.math.RoundingMode.HALF_UP).longValueExact()
      assert(KMeans.roundHalfAway(s, n) == want, s"($s, $n)")
    }
  }

  test("fitTraced provenance is partitioning-invariant: same seeds, " +
      "same per-iteration hashes") {
    val df = planted(60)
    val (ma, ta) = KMeans.fitTraced(df, "embedding", "vec_id", 3, 3)
    val (mb, tb) = KMeans.fitTraced(df.repartition(13), "embedding",
      "vec_id", 3, 3)
    assert(ma == mb && ta == tb)
    assert(ta.seedIds.length == 3)
    assert(ta.centroidMd5s.length == 4) // seeds + one per iteration
    assert(ta.centroidMd5s.distinct.length > 1) // iterations moved
  }

  test("seedIds matches fitTraced's trace and is iteration-free") {
    val df = planted(60)
    val ids = KMeans.seedIds(df, "embedding", "vec_id", 3)
    val (_, trace) = KMeans.fitTraced(df, "embedding", "vec_id", 3, 2)
    assert(ids == trace.seedIds)
  }

  test("quantizeFloor: floor semantics (round-down everywhere, no " +
      "half-way rule) and exact agreement with round off the halves") {
    // 1/128 = 0.0078125f -> 7812.5 micros exactly: round (HALF_UP)
    // says 7813, floor says 7812, and NEGATIVE floor goes DOWN (-7813
    // where round-half-away says -7813 too but trunc would say -7812)
    val df = Seq((0L, Seq(0.0078125f, -0.0078125f, 0.25f, -0.25f)))
      .toDF("vec_id", "embedding")
    val got = df.select(KMeans.quantizeFloor($"embedding").as("v"))
      .as[Seq[Long]].head()
    assert(got == Seq(7812L, -7813L, 250000L, -250000L))
    val rounded = df.select(KMeans.quantize($"embedding").as("v"))
      .as[Seq[Long]].head()
    assert(rounded == Seq(7813L, -7813L, 250000L, -250000L))
    // off the exact halves the two quantizers agree
    val df2 = planted(30)
    val both = df2.select(KMeans.quantize($"embedding").as("r"),
        KMeans.quantizeFloor($"embedding").as("f"))
      .as[(Seq[Long], Seq[Long])].collect()
    both.foreach { case (r, f) =>
      r.zip(f).foreach { case (a, b) => assert(a == b || a == b + 1) }
    }
  }

  test("assign is a pure row expression: no Exchange, no Join in " +
      "the plan; distances are exact longs") {
    val df = planted(30)
    val model = KMeans.fit(df, "embedding", "vec_id", 3, 2)
    val out = KMeans.assign(df, "embedding", model)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
    // hand-check one distance: quantized micros, pure (v-c)^2 sum
    val row = out.where($"vec_id" === 0L)
      .select($"embedding", $"cluster_id", $"dist_sq")
      .as[(Seq[Float], Int, Long)].head()
    val vm = row._1.map(x => math.round(x.toDouble * 1e6))
    val cm = model.centroids(row._2)
    val want = vm.zip(cm).map { case (v, c) =>
      (v - c) * (v - c)
    }.sum
    assert(row._3 == want)
  }

  test("fitSampleSeeded (large-k form): planted clusters recover, " +
      "the model is deterministic under repartitioning, and k beyond " +
      "the row count fails with a named error") {
    val df = planted(90)
    val model = KMeans.fitSampleSeeded(df, "embedding", "vec_id",
      k = 3, iters = 4)
    // same recovery bar as the farthest-point fit on this fixture:
    // the Lloyd passes wash out the sample seeding
    val got = KMeans.assign(df, "embedding", model)
      .select($"planted", $"cluster_id").as[(Int, Int)].collect()
    val mapping = got.groupBy(_._1).map { case (p, rows) =>
      p -> rows.map(_._2).distinct
    }
    assert(mapping.values.forall(_.length == 1), mapping)
    assert(mapping.values.flatten.toSet.size == 3, mapping)
    // deterministic: hash-ranked seeds + exact-integer Lloyd are a
    // pure function of the data under ANY partitioning
    val model2 = KMeans.fitSampleSeeded(df.repartition(7),
      "embedding", "vec_id", k = 3, iters = 4)
    assert(model2.centroids == model.centroids)
    val e = intercept[IllegalArgumentException] {
      KMeans.fitSampleSeeded(planted(4), "embedding", "vec_id",
        k = 9, iters = 1)
    }
    assert(e.getMessage.contains("more cells than"))
  }
}
