package graft.core

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Exact-integer PageRank: hand-checked recurrence, determinism,
  * dangling-leak semantics. */
class GraphsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int) =
    Graphs.pageRankMicros(edges.toDF("src", "dst"), "src", "dst",
        iterations = iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("one iteration on a 3-node star matches the hand-computed " +
      "integer recurrence") {
    // a->b, a->c, b->a, c->a; r0 = 1000000, base = 150000
    // a's share per edge: 1000000 div 2 = 500000, damped
    //   (850000*500000) div 1e6 = 425000
    // b,c's share: (850000*1000000) div 1e6 = 850000
    val r = ranks(Seq("a" -> "b", "a" -> "c", "b" -> "a", "c" -> "a"), 1)
    assert(r("a") == 150000L + 850000L + 850000L)
    assert(r("b") == 150000L + 425000L)
    assert(r("c") == 150000L + 425000L)
  }

  test("symmetric cycle stays exactly uniform") {
    val r = ranks(Seq("a" -> "b", "b" -> "a"), 5)
    // r0=1000000; contrib=(850000*1000000) div 1e6=850000;
    // base=150000 -> 1000000 again, a fixed point with zero floor loss
    assert(r == Map("a" -> 1000000L, "b" -> 1000000L))
  }

  test("dangling node leaks mass: totals shrink but ranking holds") {
    val r1 = ranks(Seq("a" -> "b"), 1)
    assert(r1 == Map("a" -> 150000L, "b" -> 1000000L))
    val r2 = ranks(Seq("a" -> "b"), 2)
    // b never votes (dangling): a keeps only the base; b gets a's
    // damped 150000 share on top of the base
    assert(r2 == Map("a" -> 150000L, "b" -> (150000L + 127500L)))
    assert(r2.values.sum < r1.values.sum)
  }

  test("iterations = 0 returns the uniform start; duplicate edge rows " +
      "collapse (simple-graph semantics)") {
    val r = ranks(Seq("a" -> "b", "a" -> "b", "b" -> "a"), 0)
    assert(r == Map("a" -> 1000000L, "b" -> 1000000L))
    val dup = ranks(Seq("a" -> "b", "a" -> "b", "b" -> "a"), 2)
    val simple = ranks(Seq("a" -> "b", "b" -> "a"), 2)
    assert(dup == simple)
  }

  test("result is a pure function of the graph: identical under any " +
      "input partitioning") {
    val edges = (0 until 200).map(i => s"n${i % 37}" -> s"n${(i * 7) % 41}")
    def run(p: Int) = Graphs.pageRankMicros(
        edges.toDF("src", "dst").repartition(p), "src", "dst",
        iterations = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = run(1)
    assert(a == run(13))
    assert(a.values.max > a.values.min) // non-degenerate fixture
  }

  test("personalized: seeds = all nodes IS plain PageRank") {
    val edges = (0 until 60).map(i => s"n${i % 11}" -> s"n${(i * 5) % 13}")
    val seeds = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .toDF("node")
    val plain = Graphs.pageRankMicros(edges.toDF("src", "dst"),
        "src", "dst", iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ppr = Graphs.personalizedPageRankMicros(
        edges.toDF("src", "dst"), "src", "dst", seeds, "node",
        iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ppr == plain)
  }

  test("personalized: mass flows only from seeds; unreachable nodes " +
      "rank exactly 0; off-graph seeds are ignored") {
    val edges = Seq("a" -> "b", "c" -> "d").toDF("src", "dst")
    def run(seedIds: Seq[String], iters: Int) =
      Graphs.personalizedPageRankMicros(edges, "src", "dst",
          seedIds.toDF("node"), "node", iterations = iters)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // seed {a}: a keeps only its base, b gets a's damped full share,
    // the c->d component never sees any mass
    assert(run(Seq("a"), 1) ==
      Map("a" -> 150000L, "b" -> 850000L, "c" -> 0L, "d" -> 0L))
    assert(run(Seq("a"), 4)("c") == 0L)
    assert(run(Seq("a"), 4)("d") == 0L)
    assert(run(Seq("a", "zz"), 2) == run(Seq("a"), 2))
  }

  test("weighted: all-1 weights IS plain PageRank; scaling every " +
      "weight by a constant changes nothing; duplicate rows sum") {
    val edges = (0 until 120).map(i =>
      (s"n${i % 17}", s"n${(i * 11) % 19}", (i % 5 + 1).toLong))
    def runW(es: Seq[(String, String, Long)]) =
      Graphs.weightedPageRankMicros(es.toDF("src", "dst", "w"),
          "src", "dst", "w", iterations = 3)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val uniform = edges.map(e => (e._1, e._2)).distinct
      .map { case (s, d) => (s, d, 1L) }
    val plain = Graphs.pageRankMicros(
        edges.map(e => (e._1, e._2)).toDF("src", "dst"), "src", "dst",
        iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(runW(uniform) == plain)
    // floor(r*cw / cW) = floor(r*w / W): only proportions matter
    val base = edges.map(e => (e._1, e._2)).distinct.zipWithIndex
      .map { case ((s, d), i) => (s, d, (i % 7 + 1).toLong) }
    assert(runW(base) == runW(base.map(e => (e._1, e._2, e._3 * 1000))))
    // parallel (src,dst) rows add their weights
    val dup = Seq(("a", "b", 2L), ("a", "b", 2L), ("b", "a", 1L))
    val merged = Seq(("a", "b", 4L), ("b", "a", 1L))
    assert(runW(dup) == runW(merged))
  }

  test("weighted: hand-checked proportional split; non-positive " +
      "weight fails loudly") {
    // a->b w3, a->c w1, b->a w2, c->a w5; W_a=4, W_b=2, W_c=5
    // b gets (850000*((1e6*3) div 4)) div 1e6 = 637500
    // c gets (850000*((1e6*1) div 4)) div 1e6 = 212500
    // a gets 850000 from b and 850000 from c (full shares)
    val r = Graphs.weightedPageRankMicros(
        Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 2L),
          ("c", "a", 5L)).toDF("src", "dst", "w"),
        "src", "dst", "w", iterations = 1)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a" -> (150000L + 850000L + 850000L),
      "b" -> (150000L + 637500L), "c" -> (150000L + 212500L)))
    val e = intercept[Throwable] {
      Graphs.weightedPageRankMicros(
        Seq(("a", "b", 0L)).toDF("src", "dst", "w"),
        "src", "dst", "w", iterations = 1).collect()
    }
    def chain(t: Throwable): String = {
      var m = List.empty[String]; var c = t
      while (c != null) { m ::= String.valueOf(c.getMessage); c = c.getCause }
      m.mkString(" | ")
    }
    assert(chain(e).contains("weight must be a positive integer"),
      chain(e))
  }

  test("hits: one iteration matches the hand-computed max-normalized " +
      "recurrence; directed bipartite sources/sinks zero out") {
    // a->x, b->x, b->y: a1r x=2e6 y=1e6 -> maxA=2e6 -> a(x)=1e6,
    // a(y)=500000; h1r a=1e6, b=1.5e6 -> maxH=1.5e6 ->
    // h(a)=(1e6*1e6)div 1.5e6=666666, h(b)=1e6
    val r = Graphs.hitsMicros(
        Seq("a" -> "x", "b" -> "x", "b" -> "y").toDF("src", "dst"),
        "src", "dst", iterations = 1)
      .collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r("a") == (666666L, 0L))
    assert(r("b") == (1000000L, 0L))
    assert(r("x") == (0L, 1000000L))
    assert(r("y") == (0L, 500000L))
  }

  test("hits: pure function of the graph under any partitioning; " +
      "top hub and authority sit at exactly One") {
    val edges = (0 until 150).map(i => s"h${i % 13}" -> s"a${(i * 7) % 17}")
    def run(p: Int) = Graphs.hitsMicros(
        edges.toDF("src", "dst").repartition(p), "src", "dst",
        iterations = 3)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val a = run(1)
    assert(a == run(13))
    assert(a.values.map(_._1).max == 1000000L)
    assert(a.values.map(_._2).max == 1000000L)
    val e = intercept[IllegalArgumentException] {
      Graphs.hitsMicros(Seq.empty[(String, String)].toDF("src", "dst"),
        "src", "dst", iterations = 1)
    }
    assert(e.getMessage.contains("empty graph"))
  }

  test("prepared graph: every rank variant off one artifact is " +
      "bit-identical to its one-shot entry point") {
    val edges = (0 until 150)
      .map(i => (s"n${i % 13}", s"n${(i * 7) % 17}", (i % 4 + 1).toLong))
    val df = edges.toDF("src", "dst", "w")
    val seeds = Seq("n1", "n2", "n3").toDF("node")
    def m(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val simple = Graphs.prepareSimple(df, "src", "dst")
    assert(m(Graphs.pageRankMicrosOn(simple, iterations = 3)) ==
      m(Graphs.pageRankMicros(df, "src", "dst", iterations = 3)))
    assert(m(Graphs.personalizedPageRankMicrosOn(simple, seeds,
        "node", iterations = 3)) ==
      m(Graphs.personalizedPageRankMicros(df, "src", "dst", seeds,
        "node", iterations = 3)))
    val weighted = Graphs.prepareWeighted(df, "src", "dst", "w")
    assert(m(Graphs.pageRankMicrosOn(weighted, iterations = 3)) ==
      m(Graphs.weightedPageRankMicros(df, "src", "dst", "w",
        iterations = 3)))
    assert(m(Graphs.personalizedPageRankMicrosOn(weighted, seeds,
        "node", iterations = 3)) ==
      m(Graphs.weightedPersonalizedPageRankMicros(df, "src", "dst",
        "w", seeds, "node", iterations = 3)))
  }

  test("hits over pre-pinned frames is bit-identical to the one-shot " +
      "entry point") {
    val edges = (0 until 150).map(i => s"h${i % 13}" -> s"a${(i * 7) % 17}")
    val df = edges.toDF("src", "dst")
    val e = df.distinct().localCheckpoint(false)
    val nodes = e.select($"src".as("node"))
      .union(e.select($"dst".as("node"))).distinct()
      .localCheckpoint(false)
    def m(r: org.apache.spark.sql.DataFrame) = r.collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(m(Graphs.hitsMicrosOn(e, nodes, iterations = 3)) ==
      m(Graphs.hitsMicros(df, "src", "dst", iterations = 3)))
  }

  test("hits: broadcast and shuffle recurrences are bit-identical " +
      "(spark.graft.hits.broadcastMaxNodes picks strategy only)") {
    val df = (0 until 150).map(i => s"h${i % 13}" -> s"a${(i * 7) % 17}")
      .toDF("src", "dst")
    def m(r: org.apache.spark.sql.DataFrame) = r.collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    val broadcastPath = m(Graphs.hitsMicros(df, "src", "dst", 3))
    spark.conf.set("spark.graft.hits.broadcastMaxNodes", "0")
    try {
      val shufflePath = m(Graphs.hitsMicros(df, "src", "dst", 3))
      assert(broadcastPath == shufflePath)
    } finally spark.conf.unset("spark.graft.hits.broadcastMaxNodes")
  }

  test("named errors on an empty graph and out-of-range damping") {
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    val e1 = intercept[IllegalArgumentException] {
      Graphs.pageRankMicros(empty, "src", "dst", iterations = 1)
    }
    assert(e1.getMessage.contains("empty graph"))
    val e2 = intercept[IllegalArgumentException] {
      Graphs.pageRankMicros(Seq("a" -> "b").toDF("src", "dst"),
        "src", "dst", iterations = 1, dampingMicros = 2000000L)
    }
    assert(e2.getMessage.contains("dampingMicros"))
  }
}
