package graft

import org.scalatest.funsuite.AnyFunSuite

/** Failure contract of [[SparkUtil.inParallel]] (round-20: the overlap
  * helper landed in round 19 without spec coverage). The contract the
  * maintenance protocols rely on:
  *
  *  - every action RUNS TO COMPLETION even when a sibling fails (Spark
  *    actions are not interruptible mid-commit; letting them finish keeps
  *    the on-disk state one of the replay-whole shapes);
  *  - the FIRST failure rethrows AS-IS — protocol error types
  *    ([[graft.sources.FenceViolation]]) must cross unchanged so callers'
  *    race/outage classification keeps working;
  *  - later failures ride along as suppressed (no diagnostics lost);
  *  - null action slots are skipped (the optional-component idiom);
  *  - declaration order is the execution order under the sequential
  *    fallback (`GRAFT_INPARALLEL=off`), and single-action calls run
  *    inline on the calling thread.
  */
class SparkUtilSpec extends AnyFunSuite {

  test("inParallel: all actions complete; first failure rethrows as-is") {
    val ran = new java.util.concurrent.atomic.AtomicInteger(0)
    val boom = new graft.sources.FenceViolation("claimed elsewhere", null)
    val thrown = intercept[graft.sources.FenceViolation] {
      SparkUtil.inParallel(
        () => { Thread.sleep(50); ran.incrementAndGet(); () },
        () => throw boom,
        () => { Thread.sleep(20); ran.incrementAndGet(); () })
    }
    assert(thrown eq boom, "protocol error types must cross unchanged")
    assert(ran.get() == 2, "sibling actions must run to completion")
  }

  test("inParallel: second failure is suppressed onto the first, not lost") {
    val first = new RuntimeException("first")
    val second = new IllegalStateException("second")
    val gate = new java.util.concurrent.CountDownLatch(1)
    val thrown = intercept[Throwable] {
      SparkUtil.inParallel(
        () => { gate.await(); throw second }, // ordered: fails after first
        () => { try throw first finally gate.countDown() })
    }
    val both = Set[Throwable](thrown) ++ thrown.getSuppressed.toSet
    assert(both == Set[Throwable](first, second),
      s"one thrown + one suppressed, got $both")
  }

  test("inParallel: null slots skipped; empty and single-action run inline") {
    SparkUtil.inParallel() // no-op
    SparkUtil.inParallel(null, null) // all-null: no-op
    val t = Thread.currentThread()
    var sawThread: Thread = null
    SparkUtil.inParallel(null, () => { sawThread = Thread.currentThread() })
    assert(sawThread eq t, "single real action runs on the calling thread")
    var count = 0
    SparkUtil.inParallel(() => { count += 1 }, null, () => { count += 1 })
    assert(count == 2)
  }

  test("inParallel: actions observe the caller's inheritable thread-locals") {
    // job group/description are InheritableThreadLocal-backed; the helper
    // creates threads from the calling thread so Spark job properties
    // propagate. Modeled directly with an InheritableThreadLocal.
    val itl = new InheritableThreadLocal[String]
    itl.set("caller-scope")
    val seen = new java.util.concurrent.atomic.AtomicReference[String]
    SparkUtil.inParallel(
      () => seen.set(itl.get()),
      () => ())
    assert(seen.get() == "caller-scope")
  }
}
