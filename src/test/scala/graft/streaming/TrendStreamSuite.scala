package graft.streaming

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Streaming trending-counts contract: the stream-maintained windowed
  * counts equal the batch recompute over the same fixture (no window
  * leakage, no heartbeat rows), and the serving cut is a bounded rank. */
class TrendStreamSuite extends AnyFunSuite {

  test("stream counts ≡ batch recompute; top-k cut bounded and ordered") {
    val s = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    val out = TrendStream.sTopk(s, d).collect()
    // batch recompute of the same mapping (event -> image at id*4+2)
    val expect = graft.Tables.events(s, d)
      .selectExpr("user_id AS k", "event_id * 4 + 2 AS seq")
      .selectExpr("seq - seq % 10000 AS win_start_us", "k")
      .groupBy("win_start_us", "k").agg(count(lit(1)).as("n"))
    val topk = TrendStream.topkPerWindow(expect, 3)
      .orderBy(col("win_start_us"), col("rnk")).collect()
    assert(out.length == topk.length)
    assert(out.map(_.toSeq).toSeq == topk.map(_.toSeq).toSeq)
    // rank never exceeds k; within a window ranks are 1..m
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val rnks = rows.map(_.getInt(3)).sorted.toSeq
      assert(rnks == (1 to rnks.length).toSeq, rnks)
    }
  }
}
