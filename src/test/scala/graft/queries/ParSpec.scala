package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins the contract of [[Par]], the r14 prewarm-overlap helper
  * (guide §2.6): every thunk runs exactly once, the call blocks until
  * all finish, and a failing thunk fails the caller (after the others
  * complete) exactly as the old sequential form did — a prewarm build
  * error must fail the bench row loudly, not vanish on a daemon thread.
  */
class ParSpec extends AnyFunSuite {

  test("Par runs every thunk exactly once and joins before returning") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    Par(
      () => { hits.incrementAndGet(); seen.add(1); () },
      () => { hits.incrementAndGet(); seen.add(2); () },
      () => { hits.incrementAndGet(); seen.add(3); () })
    assert(hits.get() === 3)
    assert(seen.size === 3)
  }

  test("Par actually overlaps: two blocking thunks release each other") {
    // Each thunk waits on the barrier — only concurrent execution can
    // pass it (a sequential runner would dead-wait on the first thunk).
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    Par(
      () => { barrier.await(10, java.util.concurrent.TimeUnit.SECONDS); () },
      () => { barrier.await(10, java.util.concurrent.TimeUnit.SECONDS); () })
  }

  test("Par rethrows the first failure and still runs the other thunks") {
    val ran = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[RuntimeException] {
      Par(
        () => throw new RuntimeException("build failed"),
        () => { ran.incrementAndGet(); () })
    }
    assert(e.getMessage === "build failed")
    assert(ran.get() === 1) // sibling completed; failure was not silent
  }

  test("Par with dependent work inside ONE thread keeps its order") {
    val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    Par(
      () => { order.add("a1"); order.add("a2"); () })
    assert(order.toArray.toSeq === Seq("a1", "a2"))
  }
}
