package graft.streaming

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** The streaming IVM invariant for the drift monitor: the histogram
  * maintained by the stream (MvStream versioned snapshots) must reproduce
  * the batch `q_drift_psi` answer EXACTLY — same segments, same counts,
  * same nano-nat PSI. Any double-count on replay, any float-value bucket
  * drift, or any divergence between the two PSI tails breaks this. */
class DriftStreamSuite extends AnyFunSuite {
  private val d = "/root/testdata/sf0.001"

  test("stream-maintained histogram reproduces the batch PSI exactly") {
    val s = TestSpark.spark
    val stream = DriftStream.sDrift(s, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toList
    val batch = SparkEntry.queries("q_drift_psi")(s, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toList
    assert(stream.nonEmpty)
    assert(stream == batch, s"stream=$stream batch=$batch")
  }
}
