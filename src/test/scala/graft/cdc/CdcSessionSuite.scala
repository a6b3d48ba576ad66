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

  test("a non-fixture table shape streams through the facade: tabnames " +
      "threaded to the source, envelope derived from the in-band schema") {
    val s = TestSpark.spark
    val root = java.nio.file.Files.createTempDirectory("cdcsess_shape").toFile
    val chunkDir = new java.io.File(root, "chunks")
    chunkDir.mkdirs()

    // Different column order AND types from the fixture: the string comes
    // FIRST, the integral key is an int (not bigint), the value a double,
    // plus an extra CHAR column the envelope has no slot for.
    val tabid = 42
    val ddl = "name varchar(16), id integer, extra char(4), score float"
    val schema = DdlParser.parse(tabid, "app.scores", ddl)
    val out = new java.io.ByteArrayOutputStream()
    out.write(CdcCodec.encodeFrame(TabSchema(tabid, 0, 0, 3, 1, ddl)))
    out.write(CdcCodec.encodeFrame(BeginTx(9, 1, 9, 0)))
    out.write(CdcCodec.encodeRowFrame(CdcRecords.INSERT, schema, 10, 1, 0,
      IndexedSeq("alpha", 7, "xx", 2.5)))
    out.write(CdcCodec.encodeRowFrame(CdcRecords.INSERT, schema, 11, 1, 0,
      IndexedSeq("beta", null, "yy", null)))
    out.write(CdcCodec.encodeFrame(CommitTx(12, 1, 12)))
    java.nio.file.Files.write(
      new java.io.File(chunkDir, "chunk-000.bin").toPath, out.toByteArray)

    val cdc = CdcSession(CdcConfig()).enable(tabid, "app.scores")
    val df = cdc.activate(s, chunkDir.getAbsolutePath)
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Any, Any, Any)]
    val q = df.writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck_shape").toString)
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
        b.collect().foreach { r =>
          got += ((r.getString(0), r.getLong(1),
            if (r.isNullAt(3)) null else r.getLong(3),
            if (r.isNullAt(4)) null else r.getDouble(4),
            if (r.isNullAt(5)) null else r.getString(5)))
        }
        ()
      }).start()
    q.awaitTermination()

    val images = got.filter(_._1 == "CDC_REC_INSERT").sortBy(_._2)
    // key ← first integral column (id, widened int→long), v ← first
    // fractional (score, float wire→double), etype ← first string (name).
    assert(images.toSeq == Seq(
      ("CDC_REC_INSERT", 10L, 7L, 2.5, "alpha"),
      ("CDC_REC_INSERT", 11L, null, null, "beta")))
  }
}
