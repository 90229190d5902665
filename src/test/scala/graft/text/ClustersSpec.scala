package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClustersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("connectedComponents: chain, triangle, pair, orientation-mixed") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21;
    // edges given in mixed orientation on purpose
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L), (12L, 10L), (11L, 12L), (21L, 20L))
      .toDF("id_a", "id_b")
    val cc = Clusters.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents matches driver-side union-find on a random graph") {
    val rnd = new scala.util.Random(7)
    val n = 200
    val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // driver union-find ground truth
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> {
        // min member of v's component among touched vertices
        val r = find(v.toInt)
        edges.flatMap(e => Seq(e._1, e._2)).distinct
          .filter(u => find(u.toInt) == r).min
      }).toMap
    val got = Clusters.connectedComponents(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("connectedComponents fails loudly when maxIter truncates") {
    // a 6-chain needs ~5 rounds; maxIter=2 must throw, not return
    // silently split components
    val chain = (0L until 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Clusters.connectedComponents(chain, maxIter = 2)
    }
    // and with enough rounds the same chain converges to one label
    val ok = Clusters.connectedComponents(chain, maxIter = 10)
      .select($"label").distinct().collect()
    assert(ok.map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("connectedComponentsStar: chain, triangle, pair, mixed orientation, " +
      "self-loop-only node — identical to propagation output") {
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L), (12L, 10L), (11L, 12L), (21L, 20L), (30L, 30L))
      .toDF("id_a", "id_b")
    val star = Clusters.connectedComponentsStar(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = Clusters.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L,
      30L -> 30L))
    assert(star == prop)
  }

  test("connectedComponentsStar matches propagation on random graphs " +
      "(sparse, dense, forest)") {
    val rnd = new scala.util.Random(13)
    for ((n, m) <- Seq((120, 60), (120, 200), (40, 400))) {
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .toDF("id_a", "id_b")
        .localCheckpoint() // one dataset, two algorithms
      val star = Clusters.connectedComponentsStar(edges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val prop = Clusters.connectedComponents(edges, maxIter = 200)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == prop, s"divergence on n=$n m=$m")
    }
  }

  test("connectedComponentsStar converges in O(log n) rounds on a " +
      "64-chain (propagation would need ~63)") {
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) =
      Clusters.starWithRounds(chain, "id_a", "id_b", maxIter = 30)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 64 && got.forall(_._2 == 0L))
    assert(rounds <= 12, s"took $rounds rounds on a 64-chain")
  }

  test("connectedComponentsStar fails loudly when maxIter truncates") {
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Clusters.connectedComponentsStar(chain, maxIter = 1)
    }
  }

  test("assign labels singletons with own id and sizes clusters") {
    val df = Seq(1L, 2L, 3L, 4L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val r = Clusters.assign(df, "doc_id", pairs)
      .orderBy($"doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3)))
    assert(r.toSeq == Seq((1L, 1L, 3L, 1L), (2L, 1L, 3L, 0L),
      (3L, 1L, 3L, 0L), (4L, 4L, 1L, 1L), (9L, 9L, 1L, 1L)))
  }

  test("localCheckpoint under AQE drops partitioning (why the CC loop " +
      "does not pre-partition its edge list)") {
    // A pre-repartition($"src") of the edge list would only pay off if
    // localCheckpoint PRESERVED the hash partitioning into its
    // LogicalRDD — then every round's edge-label join could skip the
    // |E|-row exchange. Under AQE it does NOT (UnknownPartitioning),
    // so connectedComponents deliberately skips the upfront shuffle.
    // If a Spark upgrade makes this test fail (1 exchange instead of
    // 2), preserve-partitioning became real: re-add the pre-partition
    // in Clusters.connectedComponents and save a shuffle per round.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = (1L to 500L).map(i => (i, i % 37))
        .toDF("src", "dst").repartition($"src").localCheckpoint(true)
      val labels = (1L to 500L).map(i => (i, i)).toDF("src", "label")
      val round = edges.join(labels, Seq("src"))
        .groupBy($"dst").agg(min($"label"))
      val plan = round.queryExecution.executedPlan.toString
      val srcExchanges = "Exchange hashpartitioning\\(src"
        .r.findAllIn(plan).length
      // the sort-merge join needs hashpartitioning(src) on BOTH sides:
      // 2 = checkpoint lost the edge side's partitioning (today's AQE
      // behavior); 1 would mean it survived
      assert(srcExchanges == 2, s"partitioning behavior changed:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("coherentSplit keeps every cluster in exactly one split") {
    val df = (1L to 300L).toDF("doc_id")
    // 100 clusters of 3: (1,2,3), (4,5,6), ...
    val pairs = (0L until 100L).flatMap(c =>
      Seq((c * 3 + 1, c * 3 + 2), (c * 3 + 2, c * 3 + 3)))
      .toDF("id_a", "id_b")
    val s1 = Clusters.coherentSplit(df, "doc_id", pairs,
      valFrac = 0.2, testFrac = 0.2)
    // no cluster straddles splits
    assert(s1.groupBy($"cluster_id")
      .agg(countDistinct($"split").as("k")).where($"k" > 1).count() == 0)
    // all three splits are populated and fractions are in the right
    // ballpark (100 clusters, expect ~20/20/60)
    val bySplit = s1.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val")
      && bySplit("train") > bySplit("test"))
    // deterministic; a different seed reshuffles some clusters
    val s2 = Clusters.coherentSplit(df, "doc_id", pairs,
      valFrac = 0.2, testFrac = 0.2)
    assert(s1.join(s2, Seq("doc_id"))
      .where(s1("split") =!= s2("split")).count() == 0)
    val s3 = Clusters.coherentSplit(df, "doc_id", pairs,
      valFrac = 0.2, testFrac = 0.2, seed = 7L)
    assert(s1.join(s3, Seq("doc_id"))
      .where(s1("split") =!= s3("split")).count() > 0)
  }

  test("assignKeepBest: keeper is the best-ranked copy, dense ranks, " +
      "singletons keep themselves, labels match assign") {
    val df = Seq(
      (1L, 10L), (2L, 50L), (3L, 30L), // cluster {1,2,3}: 2 is best
      (4L, 99L),                       // singleton
      (5L, 7L), (6L, 7L))              // cluster {5,6}: tie -> id 5
      .toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Clusters.assignKeepBest(df, "doc_id", pairs,
        order = Seq($"quality".desc))
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0),
        r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
        r.getAs[Long]("keeper_rank"), r.getAs[Long]("is_keeper")))
    assert(got.toSeq == Seq(
      (1L, 1L, 3L, 3L, 0L), (2L, 1L, 3L, 1L, 1L), (3L, 1L, 3L, 2L, 0L),
      (4L, 4L, 1L, 1L, 1L),
      (5L, 5L, 2L, 1L, 1L), (6L, 5L, 2L, 2L, 0L)))
    // cluster labels agree with assign()'s
    val a = Clusters.assign(df, "doc_id", pairs)
      .select($"doc_id", $"cluster_id".as("a_cid"))
    assert(Clusters.assignKeepBest(df, "doc_id", pairs,
        Seq($"quality".desc))
      .join(a, Seq("doc_id"))
      .where($"cluster_id" =!= $"a_cid").count() == 0)
  }

  test("dropNearDuplicates keeps one representative per dup family") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "ran far away into the deep green forest before sunset tonight"
    val df = Seq(
      (1L, base), (2L, base), (3L, base.replace("quick", "swift")),
      (4L, "completely unrelated words about spark query engines joins"),
      (5L, "another standalone document mentioning shuffles and scans"))
      .toDF("doc_id", "text")
    val kept = Clusters.dropNearDuplicates(df, "text", "doc_id")
      .select($"doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L))
  }

  test("string/UUID id columns are rejected loudly: a cast-to-null " +
      "would silently drop every edge (all-singleton labels, leaked " +
      "near-dups) with no error anywhere") {
    val pairs = Seq(("uuid-a", "uuid-b")).toDF("id_a", "id_b")
    Seq(
      () => Clusters.connectedComponentsStar(pairs),
      () => Clusters.connectedComponents(pairs)
    ).foreach { f =>
      val e = intercept[IllegalArgumentException](f())
      assert(e.getMessage.contains("integral"), e.getMessage)
    }
  }

  test("scale-0 decimal ids (the Parquet/JDBC integer surface) are " +
      "accepted and cluster correctly; 19-digit decimals that could " +
      "overflow long are rejected") {
    val dec = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
      .select($"id_a".cast("decimal(18,0)").as("id_a"),
        $"id_b".cast("decimal(18,0)").as("id_b"))
    val labels = Clusters.connectedComponentsStar(dec)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L))
    val wide = dec.select($"id_a".cast("decimal(19,0)").as("id_a"),
      $"id_b")
    val e = intercept[IllegalArgumentException](
      Clusters.connectedComponentsStar(wide))
    assert(e.getMessage.contains("integral"), e.getMessage)
  }
}
