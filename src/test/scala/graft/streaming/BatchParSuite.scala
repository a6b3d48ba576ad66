package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** [[BatchPar]] — the r18 overlap seam under every maintenance stream's
  * foreachBatch tail. The replay/equivalence semantics of the overlapped
  * lanes are pinned by the existing stream suites (batch≡stream, chain,
  * replay, replay-across-compaction — all of which now execute the
  * parallel path); this suite pins the harness contract itself:
  * every lane runs to completion, and the first failure (and only a
  * failure) propagates to the calling thread. */
class BatchParSuite extends AnyFunSuite {

  test("all lanes run, on the calling thread's happy path") {
    val ran = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    BatchPar.run(
      () => { ran.add(1): Unit },
      () => { ran.add(2): Unit },
      () => { ran.add(3): Unit })
    assert(ran.size == 3)
  }

  test("single lane runs inline (no thread)") {
    var thread: String = null
    BatchPar.run(() => { thread = Thread.currentThread().getName })
    assert(thread == Thread.currentThread().getName)
  }

  test("a failing lane does not stop the others; the failure rethrows") {
    val ran = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val gate = new java.util.concurrent.CountDownLatch(1)
    val e = intercept[IllegalStateException] {
      BatchPar.run(
        () => { gate.countDown(); throw new IllegalStateException("lane 0") },
        () => {
          // only completes if BatchPar keeps running lanes past a failure
          gate.await()
          Thread.sleep(50)
          ran.add(1): Unit
        })
    }
    assert(e.getMessage == "lane 0")
    assert(ran.contains(1), "the surviving lane must run to completion")
  }

  test("the FIRST failure wins when several lanes fail") {
    val e = intercept[RuntimeException] {
      BatchPar.run(
        () => throw new RuntimeException("a"),
        () => { Thread.sleep(100); throw new RuntimeException("b") })
    }
    assert(Set("a", "b").contains(e.getMessage))
  }
}
