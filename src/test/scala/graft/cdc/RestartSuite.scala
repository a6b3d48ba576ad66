package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Table-driven tests of the restart decision table (ec:2172-2194) and the
  * discard / monotonic-guard predicates — SURVEY §7.4.1 calls this the
  * subtlest logic in the reference. */
class RestartSuite extends AnyFunSuite {

  // (requested, useSavepoints, minOpenTxn, lastCommitted) -> expected start
  private val table = Seq(
    // explicit arg >= 0 always wins (ec:2173-2175 comment rows 2/5)
    (0L, true, Some(500L), 900L) -> 0L,
    (123L, true, Some(500L), 900L) -> 123L,
    (123L, false, None, 0L) -> 123L,
    // default + savepoints: min open txn wins when present (ec:2183-2186)
    (-1L, true, Some(500L), 900L) -> 500L,
    (-1L, true, Some(500L), 0L) -> 500L,
    // default + savepoints, no open txns: last committed + 1 (ec:2187-2189)
    (-1L, true, None, 900L) -> 901L,
    (-1L, true, Some(0L), 900L) -> 901L, // nvl(min,0)=0 behaves like "none"
    // default + savepoints, nothing recorded at all: start of stream
    (-1L, true, None, 0L) -> 0L,
    // default, no savepoints: always 0 (ec:2191-2193)
    (-1L, false, Some(500L), 900L) -> 0L,
    (-1L, false, None, 0L) -> 0L)

  test("activation decision table (ec:2172-2194)") {
    table.foreach { case ((req, sp, open, last), want) =>
      assert(Restart.resolveStartSeq(req, sp, open, last) == want,
        s"requested=$req useSavepoints=$sp minOpen=$open last=$last")
    }
  }

  test("seq_number < -1 is rejected in both savepoint modes (ec:2176-2179)") {
    intercept[IllegalArgumentException](Restart.resolveStartSeq(-2L, true, None, 0L))
    intercept[IllegalArgumentException](Restart.resolveStartSeq(-5L, false, None, 0L))
  }

  test("discard flags: strictly-before last committed (ec:1459-1461, 1527-1529)") {
    assert(Restart.discardCandidate(899L, 900L))
    assert(!Restart.discardCandidate(900L, 900L))
    assert(!Restart.discardCandidate(901L, 900L))
    assert(!Restart.discardCandidate(0L, 0L))
  }

  test("committed-LSN upsert only advances (monotonic guard, ec:747)") {
    assert(Restart.advanceLastCommitted(900L, 901L) == 901L)
    assert(Restart.advanceLastCommitted(900L, 899L) == 900L)
    assert(Restart.advanceLastCommitted(900L, 900L) == 900L)
  }

  test("restart LSN never exceeds any open transaction's begin seq") {
    // The invariant that makes resume-from-min-open safe (SURVEY §5).
    val opens = Seq(500L, 700L, 900L)
    val start = Restart.resolveStartSeq(-1L, true, Some(opens.min), 950L)
    assert(opens.forall(start <= _))
  }
}
