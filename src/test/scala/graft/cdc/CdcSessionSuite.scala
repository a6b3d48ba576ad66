package graft.cdc

import graft.TestSpark
import graft.streaming.CdcPipeline
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The lifecycle facade: enable → activate must position the stream per
  * the decision table and deliver envelope records end-to-end. */
class CdcSessionSuite extends AnyFunSuite {

  test("enable registers names; registry seeds from them") {
    val cdc = CdcSession(CdcConfig(id = 7))
      .enable(1, "db@server:informix.orders")
      .enable(2, "db@server:informix.customer")
    assert(cdc.registry.tabname(1) == "db@server:informix.orders")
    assert(cdc.registry.tabname(2) == "db@server:informix.customer")
  }

  test("activate applies the restart decision table before opening the stream") {
    // explicit seq wins; default resolves from savepoint state
    val s = TestSpark.spark
    val root = java.nio.file.Files.createTempDirectory("cdcsess").toFile
    val chunks = new java.io.File(root, "chunks").getAbsolutePath
    CdcPipeline.recordFixture(s, "/root/testdata/sf0.001", chunks)

    def countRows(seqNumber: Long, lastCommitted: Long = 0L): Long = {
      val cdc = CdcSession(CdcConfig()).enable(CdcPipeline.StreamTabid,
        CdcPipeline.StreamTabname)
      val df = cdc.activate(s, chunks, seqNumber, lastCommitted = lastCommitted)
      var n = 0L
      val q = df.writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ck").toString)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          n += b.count(); ()
        }).start()
      q.awaitTermination()
      n
    }

    val all = countRows(seqNumber = -1L)
    assert(all > 0)
    // explicit mid-stream start sees strictly fewer records
    val later = countRows(seqNumber = 2000L)
    assert(later > 0 && later < all)
    // savepoint state: default -1 with lastCommitted resolves to last+1
    val resumed = countRows(seqNumber = -1L, lastCommitted = 1999L)
    assert(resumed == later)
    // invalid explicit seq rejected by the decision table
    intercept[IllegalArgumentException](countRows(seqNumber = -2L))
  }
}
