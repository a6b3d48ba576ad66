package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** CDC batch-operator semantics on a crafted change stream with
  * hand-computable outcomes (rollbacks, truncates, upserts, deletes) —
  * complementing the oracle's 60k-row statistical coverage with cases
  * whose expected result is written down, not recomputed. The real query
  * functions run unmodified against a temp dir shaped like the driver's. */
class CdcSemanticsSuite extends AnyFunSuite {

  private lazy val dir: String = {
    val s = TestSpark.spark
    import s.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    // user 1: view, signup (truncate marker), click, purchase
    // user 2: view, error (rolled-back txn), view
    // user 3: signup, signup, click   — double truncate, last wins
    // user 4: a single view
    val events = Seq(
      (1L, ts(0), 1L, "view", 10.0, "{}"),
      (2L, ts(1), 1L, "signup", 0.0, "{}"),
      (3L, ts(2), 1L, "click", 5.0, "{}"),
      (4L, ts(3), 1L, "purchase", 7.0, "{}"),
      (5L, ts(4), 2L, "view", 1.0, "{}"),
      (6L, ts(5), 2L, "error", 0.0, "{}"),
      (7L, ts(6), 2L, "view", 2.0, "{}"),
      (8L, ts(7), 3L, "signup", 0.0, "{}"),
      (9L, ts(8), 3L, "signup", 0.0, "{}"),
      (10L, ts(9), 3L, "click", 3.0, "{}"),
      (11L, ts(10), 4L, "view", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val customer = Seq(
      (1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0))
      .toDF("c_custkey", "c_name", "c_acctbal")
    val orders = Seq(
      (100L, 1L, "O", 99.0), (101L, 1L, "O", 111.0), // cust 1: latest = 101
      (102L, 4L, "O", 50.0),                         // cust 4: insert
      (103L, 2L, "F", 75.0))  // cust 2: DELETE marker for q_delete_apply;
                              // still an upsert (75.0) for q_upsert_merge
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val d = java.nio.file.Files.createTempDirectory("cdc_fix").toString
    events.coalesce(1).write.parquet(s"$d/events.parquet")
    customer.coalesce(1).write.parquet(s"$d/customer.parquet")
    orders.coalesce(1).write.parquet(s"$d/orders.parquet")
    d
  }

  private def run(name: String) =
    CdcQueries.queries(name)(TestSpark.spark, dir)

  test("q_latest_per_key: highest-LSN image wins per key") {
    val got = run("q_latest_per_key").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 4L, 2L -> 7L, 3L -> 10L, 4L -> 11L))
  }

  test("q_rollback_filter: every change of an erroring key is dropped") {
    val got = run("q_rollback_filter").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 3L, 4L, 8L, 9L, 10L, 11L)) // user 2 gone
  }

  test("q_truncate_apply: only changes after each key's LAST truncate survive") {
    val got = run("q_truncate_apply").collect().map(_.getLong(0)).toSeq
    // user 1 truncated at 2 → {3,4}; user 2 never truncated → {5,6,7};
    // user 3 truncated at 9 (second signup wins) → {10}; user 4 → {11}
    assert(got == Seq(3L, 4L, 5L, 6L, 7L, 10L, 11L))
  }

  test("q_upsert_merge: MERGE keeps unmatched base rows, latest update wins") {
    val got = run("q_upsert_merge").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 111.0, 2L -> 75.0, 3L -> 30.0, 4L -> 50.0))
  }

  test("q_delete_apply: keys with DELETE markers vanish from the snapshot") {
    val got = run("q_delete_apply").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L)) // bob (custkey 2) deleted by the F order
  }

  test("q_updbef_updaft_pair: each change sees the previous image") {
    val got = run("q_updbef_updaft_pair").collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3)))
    // user 1: (seq, prev_seq) chains 1→null, 2→1, 3→2, 4→3
    assert(got.toSeq == Seq((1L, -1L), (2L, 1L), (3L, 2L), (4L, 3L)))
  }

  test("q_txn_stats: count/min/max/span per transaction") {
    val got = run("q_txn_stats").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got(1L) == ((4L, 1L, 4L, 3L)))
    assert(got(4L) == ((1L, 11L, 11L, 0L)))
  }

  test("q_scd2: consecutive duplicate images collapse, versions chain, " +
      "last version is open-ended") {
    // (user, version, valid_from, valid_to_or -1, value, is_current)
    val got = run("q_scd2").collect().map(r => (r.getLong(0), r.getInt(1),
      r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
      r.getDouble(4), r.getInt(5)))
    // user 3's two consecutive 0.0 signups open ONE version (8→10)
    assert(got.filter(_._1 == 3L).toSeq == Seq(
      (3L, 1, 8L, 10L, 0.0, 0), (3L, 2, 10L, -1L, 3.0, 1)))
    // user 1: four distinct values → four versions chained by seq
    assert(got.filter(_._1 == 1L).toSeq == Seq(
      (1L, 1, 1L, 2L, 10.0, 0), (1L, 2, 2L, 3L, 0.0, 0),
      (1L, 3, 3L, 4L, 5.0, 0), (1L, 4, 4L, -1L, 7.0, 1)))
    // every key's last version (and only it) is current
    assert(got.groupBy(_._1).forall { case (_, vs) =>
      vs.init.forall(_._6 == 0) && vs.last._6 == 1 && vs.last._4 == -1L })
  }

  test("scd2History: a leading NULL image still opens version 1 — the " +
      "prior state must never look current past a NULL-encoded delete") {
    val s = TestSpark.spark
    import s.implicits._
    // key 1 starts with a NULL image (delete encoded as NULL), then 5.0;
    // key 2 is NULL → NULL (the duplicate still collapses)
    val ch = Seq[(Long, Long, Option[Double])](
      (1L, 1L, None), (1L, 2L, Some(5.0)),
      (2L, 1L, None), (2L, 2L, None))
      .toDF("k", "seq", "v")
    val got = CdcQueries.scd2History(ch, "k", "seq", "v").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4), r.getInt(5)))
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (1L, 1, 1L, -1.0, 0), (1L, 2, 2L, 5.0, 1), // NULL opens v1, closed by 5.0
      (2L, 1, 1L, -1.0, 1)))                     // NULL→NULL collapses to one open version
  }
}
