package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The stateful streams under the RocksDB state store provider — the
  * production form at scale. The default HDFSBackedStateStoreProvider
  * keeps every store's working set on the executor HEAP; at a real
  * firehose's open-transaction volume that is an OOM, and the documented
  * remedy is `spark.sql.streaming.stateStore.providerClass =
  * RocksDBStateStoreProvider` (off-heap, spills to local disk, changelog
  * checkpointing). State-store providers are semantically interchangeable,
  * so results must be bit-identical to the default provider's — this suite
  * pins exactly that for the three stateful shapes the engine ships
  * (txn-assembly flatMapGroupsWithState + merge sink, stream-stream join,
  * watermarked window agg).
  */
class RocksDbStateSuite extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ConfKey = "spark.sql.streaming.stateStore.providerClass"

  /** Scopes the RocksDB provider over `body` (set → run → restore); the
    * provider class is captured when each query starts. */
  private def withRocksDb[A](body: => A): A = {
    val saved = s.conf.getOption(ConfKey)
    s.conf.set(ConfKey, Provider)
    try body
    finally saved match {
      case Some(v) => s.conf.set(ConfKey, v)
      case None => s.conf.unset(ConfKey)
    }
  }

  private def collectAll(name: String) =
    CdcPipeline.queries(name)(s, sf).collect().map(_.toSeq).toSeq

  test("merge pipeline, stream-stream join, and commit windows produce " +
      "identical results under RocksDB state") {
    // Default-provider baselines first (fresh runs — the wrappers clear
    // checkpoints), then the same queries under RocksDB. A provider swap
    // that changed ANY row would show here.
    val defaults = Seq("s_cdc_pipeline", "s_stream_join", "s_commit_windows")
      .map(n => n -> collectAll(n)).toMap
    withRocksDb {
      defaults.foreach { case (name, want) =>
        val got = collectAll(name)
        assert(got == want, s"$name differs under RocksDB state store")
      }
    }
  }
}
