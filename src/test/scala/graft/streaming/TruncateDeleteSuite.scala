package graft.streaming

import graft.TestSpark
import graft.cdc._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming DELETE (tombstone) and TRUNCATE (table wipe) semantics on
  * crafted change streams — §2.a rows 16-18 as *materialization* behavior,
  * not just decode: a reference user's pipeline applies deletes and
  * truncates to the maintained table.
  *
  * The crafted streams exercise the ordering hazards specifically:
  *  - a committed-later transaction whose seqs sit BELOW an applied
  *    truncate must still be wiped (truncate high-water carried forward);
  *  - a stale upsert arriving after a delete must not resurrect the key
  *    (tombstones are retained, not physically dropped);
  *  - a rolled-back truncate must change nothing.
  */
class TruncateDeleteSuite extends AnyFunSuite {

  private val schema = DdlParser.parse(
    CdcPipeline.StreamTabid, CdcPipeline.StreamTabname, CdcPipeline.StreamDdl)

  private def tabschem: Array[Byte] =
    CdcCodec.encodeFrame(TabSchema(CdcPipeline.StreamTabid, 0, 16, 2, 1,
      CdcPipeline.StreamDdl))

  private def ins(seq: Long, txid: Int, k: Long, v: Double): Array[Byte] =
    CdcCodec.encodeRowFrame(CdcRecords.INSERT, schema, seq, txid, 0,
      IndexedSeq(k, v, "e"))

  private def del(seq: Long, txid: Int, k: Long, v: Double): Array[Byte] =
    CdcCodec.encodeRowFrame(CdcRecords.DELETE, schema, seq, txid, 0,
      IndexedSeq(k, v, "e"))

  private def writeChunks(dir: java.io.File, chunks: Seq[Seq[Array[Byte]]]): Unit = {
    dir.mkdirs()
    chunks.zipWithIndex.foreach { case (frames, i) =>
      val out = new java.io.ByteArrayOutputStream()
      frames.foreach(out.write)
      java.nio.file.Files.write(
        new java.io.File(dir, f"chunk-$i%03d.bin").toPath, out.toByteArray)
    }
  }

  private def runStream(tag: String, chunks: Seq[Seq[Array[Byte]]]): Seq[(Long, Long, Double)] = {
    val s = TestSpark.spark
    val root = java.nio.file.Files.createTempDirectory(s"cdc_td_$tag").toFile
    val chunkDir = new java.io.File(root, "chunks")
    writeChunks(chunkDir, chunks)
    CdcPipeline.startV2(s, chunkDir.getAbsolutePath,
      new java.io.File(root, "ck").getAbsolutePath,
      new java.io.File(root, "out").getAbsolutePath).awaitTermination()
    CdcPipeline.readMaterialized(s, new java.io.File(root, "out").getAbsolutePath)
      .orderBy("k").collect()
      .map(r => (r.getLong(r.fieldIndex("k")), r.getLong(r.fieldIndex("last_seq")),
        r.getDouble(r.fieldIndex("v")))).toSeq
  }

  test("committed truncate wipes prior rows, keeps later ones, and carries " +
      "its high-water into later batches") {
    val begin = (seq: Long, tx: Int) =>
      CdcCodec.encodeFrame(BeginTx(seq, tx, seq, 0))
    val commit = (seq: Long, tx: Int) =>
      CdcCodec.encodeFrame(CommitTx(seq, tx, seq))
    val chunks = Seq(
      // tx1: two inserts, committed — the pre-truncate table.
      Seq(tabschem, begin(9, 1), ins(10, 1, 1, 1.0), ins(12, 1, 2, 2.0),
        commit(13, 1)),
      // tx2: TRUNCATE at 20, then an insert the truncate must NOT wipe.
      Seq(tabschem, begin(19, 2),
        CdcCodec.encodeFrame(TruncateTab(20, 2, CdcPipeline.StreamTabid)),
        ins(21, 2, 3, 3.0), commit(22, 2)),
      Seq(tabschem), // batch boundary filler (maxFilesPerTrigger = 3)
      // tx3 commits AFTER the truncate was applied, but its row's seq (19)
      // is below the truncate position — must be wiped by the carried
      // high-water mark, not materialized.
      Seq(tabschem, begin(18, 3), ins(19, 3, 4, 4.0), commit(23, 3)))
    assert(runStream("trunc", chunks) == Seq((3L, 21L, 3.0)))
  }

  test("delete tombstones the key; a stale lower-seq upsert cannot resurrect it") {
    val begin = (seq: Long, tx: Int) =>
      CdcCodec.encodeFrame(BeginTx(seq, tx, seq, 0))
    val commit = (seq: Long, tx: Int) =>
      CdcCodec.encodeFrame(CommitTx(seq, tx, seq))
    val chunks = Seq(
      Seq(tabschem, begin(9, 1), ins(10, 1, 1, 1.0), ins(12, 1, 2, 2.0),
        commit(13, 1)),
      // tx2 deletes k=1 at seq 31 (full before-image, rec 41).
      Seq(tabschem, begin(30, 2), del(31, 2, 1, 1.0), commit(32, 2)),
      Seq(tabschem),
      // tx3: stale upsert of k=1 at seq 25 < 31, arriving a batch later —
      // the tombstone must win the (k, seq) window.
      Seq(tabschem, begin(24, 3), ins(25, 3, 1, 9.0), commit(33, 3)))
    assert(runStream("del", chunks) == Seq((2L, 12L, 2.0)))
  }

  test("duplicate chunk delivery (at-least-once transport) leaves the " +
      "materialization unchanged") {
    val s = TestSpark.spark
    val begin = (seq: Long, tx: Int) =>
      CdcCodec.encodeFrame(BeginTx(seq, tx, seq, 0))
    val commit = (seq: Long, tx: Int) =>
      CdcCodec.encodeFrame(CommitTx(seq, tx, seq))
    val tx1 = Seq(tabschem, begin(9, 1), ins(10, 1, 1, 1.0),
      ins(12, 1, 2, 2.0), commit(13, 1))
    val tx2 = Seq(tabschem, begin(19, 2), ins(20, 2, 3, 3.0), commit(21, 2))
    // chunk 2 re-delivers tx2's ENTIRE chunk (same frames, later name):
    // the re-assembled transaction re-commits the same (k, seq) images,
    // which the idempotent merge must absorb.
    val got = runStream("dup", Seq(tx1, tx2, tx2))
    assert(got == Seq((1L, 10L, 1.0), (2L, 12L, 2.0), (3L, 20L, 3.0)))
  }

  test("DISCARD trims the transaction tail after its seq (ec:1617-1655)") {
    val begin = (seq: Long, tx: Int) =>
      CdcCodec.encodeFrame(BeginTx(seq, tx, seq, 0))
    val commit = (seq: Long, tx: Int) =>
      CdcCodec.encodeFrame(CommitTx(seq, tx, seq))
    val chunks = Seq(Seq(tabschem, begin(9, 1),
      ins(10, 1, 1, 1.0), ins(12, 1, 2, 2.0), ins(14, 1, 3, 3.0),
      CdcCodec.encodeFrame(DiscardTx(12, 1)), // server drops the tail > 12
      commit(15, 1)))
    assert(runStream("discard", chunks) == Seq((1L, 10L, 1.0), (2L, 12L, 2.0)))
  }

  test("rolled-back truncate and delete change nothing") {
    val begin = (seq: Long, tx: Int) =>
      CdcCodec.encodeFrame(BeginTx(seq, tx, seq, 0))
    val commit = (seq: Long, tx: Int) =>
      CdcCodec.encodeFrame(CommitTx(seq, tx, seq))
    val chunks = Seq(
      Seq(tabschem, begin(9, 1), ins(10, 1, 1, 1.0), commit(11, 1)),
      Seq(tabschem, begin(19, 2),
        CdcCodec.encodeFrame(TruncateTab(20, 2, CdcPipeline.StreamTabid)),
        del(21, 2, 1, 1.0),
        CdcCodec.encodeFrame(RollbackTx(22, 2))))
    assert(runStream("rbtrunc", chunks) == Seq((1L, 10L, 1.0)))
  }
}
