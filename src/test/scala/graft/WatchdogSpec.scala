package graft

import org.scalatest.funsuite.AnyFunSuite

/** Harness-robustness contract (round-6 lesson): one stuck or throwing
  * query must cost exactly one red row in the artifact, never the run.
  */
class WatchdogSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("success returns None") {
    assert(Watchdog.run(spark, "wd-ok", 30) { () }.isEmpty)
  }

  test("an exception is captured as its message, not rethrown") {
    val r = Watchdog.run(spark, "wd-boom", 30) {
      throw new IllegalStateException("boom")
    }
    assert(r.contains("boom"))
  }

  test("a hung body times out promptly and reports the budget") {
    val t0 = System.nanoTime()
    val r = Watchdog.run(spark, "wd-hang", 1) {
      // simulates round 6's q341: work that never finishes and never
      // checks interrupts — the watchdog must abandon it, not join it
      var x = 0L
      while (x >= 0) { x = (x + 1) % 1000000007L }
    }
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(r.exists(_.contains("watchdog timeout after 1s")))
    assert(elapsed < 15.0, s"watchdog took ${elapsed}s to give up")
  }

  test("a run continues past a timed-out query (artifact degrades per-query)") {
    val first = Watchdog.run(spark, "wd-seq-1", 1) {
      while (true) { Thread.sleep(50) }
    }
    val second = Watchdog.run(spark, "wd-seq-2", 30) { () }
    assert(first.isDefined && second.isEmpty)
  }
}
