package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only the last 2,000 bytes of bench stdout and
  * parses the final metric line it finds. Rounds 1-13 all shipped a
  * summary line that overflowed that window and was cut mid-token
  * (round 13 missed by ~65 bytes). This spec renders the real line
  * over the LIVE registry with worst-case-width values, so adding a
  * query that pushes the line past the window fails here instead of
  * in the driver. */
class BenchLineSpec extends AnyFunSuite {

  // window(2000) − sbt "[info] " prefix(7) − "[success] Total time:
  // NNNNN s (MMM:SS), completed <date>" footer(~80) − slack(60)
  val MaxLineBytes = 1850

  test("bench summary line fits the driver's 2 KB stdout tail") {
    // rendered at the widest value the bench plausibly produces per
    // query (9.99 — no scored gate has exceeded 7 s since round 10;
    // a >10 s gate is itself a regression long before the line width
    // matters), so the assertion tracks REGISTRY growth: one added
    // query costs ~13 bytes and trips this before it trips the driver
    val qs = SparkEntry.queries.keysIterator.toSeq.sorted
      .map(k => k.takeWhile(_ != '_') -> 9.99)
    val line = Bench.summaryLine(qs, qs.map(_._2).sum,
      "/root/testdata/sf0.1")
    assert(line.getBytes("UTF-8").length <= MaxLineBytes,
      s"summary line is ${line.length} bytes — the driver's capture " +
        "window will cut it mid-token; shrink the format before " +
        "adding more queries")
  }

  test("bare query ids stay unique (the summary would silently merge)") {
    val bare = SparkEntry.queries.keysIterator.toSeq
      .map(_.takeWhile(_ != '_'))
    assert(bare.distinct.size == bare.size)
  }
}
