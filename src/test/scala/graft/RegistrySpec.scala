package graft

import org.scalatest.funsuite.AnyFunSuite

class RegistrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and returns rows") {
    // overlap independent query jobs (guide §2.6): the queries share
    // one session and have no cross-query ordering contract, so a
    // small pool back-fills the scheduler's idle capacity — this
    // smoke was the single slowest test in the suite (90 s serial)
    // and the suite's wall is itself a driver gate. Shared artifact
    // caches are ConcurrentHashMaps (computeIfAbsent), so concurrent
    // first-builds are safe.
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutor(pool)
    try {
      val checks = SparkEntry.queries.toSeq.map { case (name, fn) =>
        Future {
          val n = fn(spark, TestSpark.sfDir).count()
          assert(n > 0, s"query $name returned no rows")
        }
      }
      Await.result(Future.sequence(checks), Duration.Inf)
    } finally pool.shutdown()
  }

  test("every oracle key has a query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
