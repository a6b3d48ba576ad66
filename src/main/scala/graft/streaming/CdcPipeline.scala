package graft.streaming

import graft.Tables
import graft.cdc._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** `s_cdc_pipeline` (SURVEY.md §2.b, M2): the reference's pull loop +
  * savepoint semantics (ec:2228-2368) as a Structured Streaming pipeline:
  *
  * {{{
  * readStream(binaryFile chunks) → FrameBuffer decode (in-band TABSCHEM)
  *   → flatMapGroupsWithState keyed by txid   (open-txn state, ec:581-771)
  *   → foreachBatch idempotent merge sink     (latest-per-key + monotonic
  *                                             LSN guard, ec:735-771)
  * }}}
  *
  * Mapping of the reference's moving parts:
  *  - the smart-blob byte stream → a directory of binary chunk files; each
  *    chunk opens with its TABSCHEM frame (schema is re-announced per
  *    segment, the in-band discovery path of ec:1722-1804) and ends with a
  *    TIMEOUT heartbeat (ec:1403-1428);
  *  - `informixcdc_opntxns` (open transactions) → `GroupState[TxnBuf]` per
  *    txid: BEGIN/rows buffer (upsert_opntxns, ec:663-700), COMMIT emits the
  *    buffered images downstream and clears (delete_opntxns + upsert_lsttxn
  *    atomically, ec:2269-2299), ROLLBACK clears without emitting
  *    (ec:2301-2308), DISCARD drops the tail after its seq (ec:1617-1655);
  *  - `informixcdc_lsttxn` + exactly-once restart → the streaming
  *    checkpoint (offset log) plus an idempotent merge sink: re-delivering
  *    a batch cannot change the materialized table, so foreachBatch retries
  *    and checkpoint-restart replays are safe (SURVEY §7.4.2);
  *  - restart-LSN decision table → [[graft.cdc.Restart.resolveStartSeq]]
  *    (checkpoint recovery makes the offset decision in Spark; the pure
  *    function is the unit-testable contract).
  *
  * Scale: chunks decode in parallel (one task per file split), transaction
  * assembly shuffles once on txid into the state store, and the sink's
  * latest-per-key merge is one window over (key) — the same shape as batch
  * `q_latest_per_key`. At 100 TB the chunk directory becomes a real queue
  * (Kafka/object-store log) and the sink a transactional table format; both
  * swaps are config, not code, because every stage is declarative.
  */
object CdcPipeline {

  /** Captured-table schema for the streamed fixture (key, value, type). */
  val StreamDdl = "k bigint, v float, etype varchar(32)"
  val StreamTabid = 1
  val StreamTabname = "cdc_stream"
  private def emptyRegistry = SchemaRegistry(Map(StreamTabid -> StreamTabname))
  private def streamSchema = DdlParser.parse(StreamTabid, StreamTabname, StreamDdl)

  /** Flat record envelope for the streaming plan (flat nullable fields beat
    * a true union for Encoder friendliness — SURVEY §1.5). */
  final case class Envelope(recordType: String, seq: Long, txid: Int,
                            key: Option[Long], v: Option[Double],
                            etype: Option[String])

  /** One buffered row image in open-txn state; `kind` is the record type
    * tag so before-images can be paired at commit time. `v`/`etype` are
    * None when the captured table has no fractional / string column (the
    * envelope contract) — the KEY is the one required shape, since the
    * sink merge is keyed on it. */
  final case class Image(seq: Long, key: Long, v: Option[Double],
                         etype: Option[String], kind: String)

  /** Open-transaction state: buffered images + terminal markers seen.
    * `truncSeq` is the highest in-transaction TRUNCATE position
    * (ec:1657-1720) — applied only if the transaction commits. */
  final case class TxnBuf(images: List[Image], commitSeq: Option[Long],
                          rolledBack: Boolean, discardAfter: Option[Long],
                          truncSeq: Option[Long] = None)

  /** A committed change ready for materialization; `old_v` is the paired
    * before-image value for updates (null for inserts). `op` is the
    * materialization verb:
    *  - `upsert` — INSERT/UPDAFT image; latest per key wins;
    *  - `delete` — DELETE image (full before-image, rec 41): a TOMBSTONE.
    *    Kept in the table (not physically dropped) so a lower-LSN upsert
    *    arriving in a later batch of a non-monotonic stream cannot
    *    resurrect the key; reads filter tombstones out;
    *  - `truncate` — table-level wipe at `last_seq` (rec 119): stored on
    *    the [[TruncateKey]] sentinel as the truncate high-water mark, so
    *    later batches keep dropping rows at or below it. */
  final case class Committed(k: Long, last_seq: Long, v: Option[Double],
                             old_v: Option[Double], etype: Option[String],
                             op: String = "upsert")

  /** Sentinel key holding the truncate high-water row in the materialized
    * table (real keys are non-negative in every fixture and capture). */
  val TruncateKey: Long = Long.MinValue

  // ------------------------------------------------------------- fixture

  /** Deterministic fixture change-log derived from `events.parquet` — the
    * analog of the reference's record mode (`write_testing_sblob`,
    * ec:201-217), which captured a live stream into a replayable file.
    * Test-harness tooling, not an operator: the bounded collect here builds
    * fixture files; the pipeline that CONSUMES them is fully distributed.
    *
    * Mapping (also encoded in the DuckDB oracle for `s_cdc_pipeline`):
    *  - txid = event_id / 20 (integer division) — 20-change transactions;
    *  - each event becomes an INSERT image with seq = event_id * 4 + 2,
    *    key = user_id, v = value, etype = event_type — EXCEPT 'purchase'
    *    events, which become an UPDBEF (v - 1.0) at seq - 1 followed by an
    *    UPDAFT (v) at seq: separate adjacent records, exactly how the
    *    reference delivers updates (rec 42/43, ec:1848-1856);
    *  - BEGIN at min(image seq) - 1; txns with txid % 13 == 5 ROLL BACK at
    *    max + 1, all others COMMIT at max + 1;
    *  - a txn lives in chunk (txid % numChunks), except every third txn's
    *    terminal record lands one chunk later — transactions spanning
    *    micro-batches, exercising cross-batch state.
    *
    * `ordered = true` instead assigns contiguous txid ranges to chunks (and
    * keeps terminals in-chunk), making the stream globally LSN-ordered
    * across chunk files like a real transaction log — the precondition for
    * savepoint-style restart ([[startFromSavepoint]]).
    */
  def recordFixture(spark: SparkSession, sfDir: String, outDir: String,
                    numChunks: Int = 8, ordered: Boolean = false): Unit = {
    val schema = streamSchema
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      .orderBy(col("event_id"))
      .collect()

    val chunks = Array.fill(numChunks)(new java.io.ByteArrayOutputStream())
    val chunkMaxSeq = new Array[Long](numChunks)
    chunks.foreach { out =>
      out.write(CdcCodec.encodeFrame(TabSchema(StreamTabid, 0,
        8 + 8, 2, 1, StreamDdl)))
    }
    val byTxid = events.groupBy(r => (r.getLong(0) / 20).toInt).toSeq.sortBy(_._1)
    val nTx = byTxid.length
    byTxid.zipWithIndex
      .foreach { case ((txid, rows), txIdx) =>
        val seqs = rows.map(_.getLong(0) * 4 + 2)
        val chunk = if (ordered) txIdx * numChunks / nTx else txid % numChunks
        val lateTerminal = !ordered && txid % 3 == 0
        val terminalChunk = math.min(chunk + (if (lateTerminal) 1 else 0), numChunks - 1)
        chunks(chunk).write(CdcCodec.encodeFrame(
          BeginTx(seqs.min - 1, txid, startTime = seqs.min, userId = 0)))
        rows.foreach { r =>
          val seq = r.getLong(0) * 4 + 2
          val (k, v, et) = (r.getLong(1), r.getDouble(2), r.getString(3))
          if (et == "purchase") {
            chunks(chunk).write(CdcCodec.encodeRowFrame(CdcRecords.UPDBEF,
              schema, seq - 1, txid, 0, IndexedSeq(k, v - 1.0, et)))
            chunks(chunk).write(CdcCodec.encodeRowFrame(CdcRecords.UPDAFT,
              schema, seq, txid, 0, IndexedSeq(k, v, et)))
          } else {
            chunks(chunk).write(CdcCodec.encodeRowFrame(CdcRecords.INSERT,
              schema, seq, txid, 0, IndexedSeq(k, v, et)))
          }
        }
        val terminal =
          if (txid % 13 == 5) CdcCodec.encodeFrame(RollbackTx(seqs.max + 1, txid))
          else CdcCodec.encodeFrame(CommitTx(seqs.max + 1, txid, commitTime = seqs.max))
        chunks(terminalChunk).write(terminal)
        chunkMaxSeq(chunk) = math.max(chunkMaxSeq(chunk), seqs.max + 1)
        chunkMaxSeq(terminalChunk) = math.max(chunkMaxSeq(terminalChunk), seqs.max + 1)
      }
    // Per-chunk TIMEOUT heartbeat carrying the chunk's high-water LSN —
    // the reference's semantics (seq = current stream position,
    // ec:1403-1428), which lets a watermark advance without data. The last
    // chunk closes with a beat well past the log tail so every pending
    // event-time window can flush at end of stream.
    chunks.zipWithIndex.foreach { case (out, i) =>
      out.write(CdcCodec.encodeFrame(TimeoutBeat(chunkMaxSeq(i))))
    }
    chunks.last.write(CdcCodec.encodeFrame(TimeoutBeat(chunkMaxSeq.max + 10000000L)))

    val dir = new java.io.File(outDir)
    dir.mkdirs()
    chunks.zipWithIndex.foreach { case (out, i) =>
      val f = new java.io.File(dir, f"chunk-$i%03d.bin")
      java.nio.file.Files.write(f.toPath, out.toByteArray)
      // File-source ordering is by modification time; make it chunk order.
      f.setLastModified(1700000000000L + i * 60000L)
    }
    java.nio.file.Files.write(new java.io.File(dir, FixtureMarker).toPath,
      Array.emptyByteArray)
  }

  /** The recording-complete marker, version-stamped: bump the suffix on
    * ANY fixture format change, so stale recordings (and derived files
    * keyed to this marker, like `sChangelogDedup`'s replay chunk) can
    * never serve a new reader. */
  private[streaming] val FixtureMarker = "_RECORDED_v2"

  /** Record the fixture unless an identical one is already on disk — the
    * content is a pure function of (sfDir, numChunks, ordered), so a
    * completed recording (marked by [[FixtureMarker]]) is reusable across
    * runs; the driver-side collect+encode is the dominant fixed cost of
    * the streaming queries in the bench loop. */
  def recordFixtureCached(spark: SparkSession, sfDir: String, outDir: String,
                          numChunks: Int = 8, ordered: Boolean = false): Unit = {
    if (!new java.io.File(outDir, FixtureMarker).isFile)
      recordFixture(spark, sfDir, outDir, numChunks, ordered)
  }

  // -------------------------------------------------------------- pipeline

  /** Envelope projection, derived from the chunk's in-band TABSCHEM
    * registry rather than fixed positions/types (mirrors the V2 source,
    * [[graft.sources.CdcChunkSource]]): `key` = the table's first integral
    * column (widened to long), `v` = its first fractional column (as
    * double), `etype` = its first string column — None when the table has
    * no such column. Decoded host values are coerced by their actual
    * runtime type, so a captured table of ANY shape streams through the
    * binaryFile path without ClassCastException. */
  private[graft] def envelopeCols(img: RowImage, schemas: SchemaRegistry)
      : (Option[Long], Option[Double], Option[String]) = {
    import org.apache.spark.sql.types._
    val specs = schemas.tables.get(img.tabid).map(_.cols)
    def pick(wanted: DataType => Boolean): Option[Any] = specs.flatMap { cols =>
      val i = cols.indexWhere(c => wanted(c.colType.sparkType))
      if (i < 0 || i >= img.columns.length) None
      else Option(img.columns(i).value)
    }
    val k = pick(t => t == LongType || t == IntegerType || t == ShortType)
      .collect {
        case x: Long => x
        case x: Int => x.toLong
        case x: Short => x.toLong
      }
    val v = pick(t => t == DoubleType || t == FloatType ||
        t.isInstanceOf[DecimalType])
      .collect {
        case x: Double => x
        case x: Float => x.toDouble
        case x: java.math.BigDecimal => x.doubleValue
        case x: BigDecimal => x.toDouble
      }
    val e = pick(_ == StringType).map {
      case s: String => s
      case other => other.toString
    }
    (k, v, e)
  }

  /** Decode a chunk's bytes into envelope records (the frame walk of
    * fetchone, ec:2246-2254, via [[FrameBuffer]]; TABSCHEM consumed in-band,
    * control records dropped after use). */
  private[streaming] def decodeChunk(bytes: Array[Byte]): Iterator[Envelope] = {
    val fb = new FrameBuffer(emptyRegistry)
    val recs = fb.append(bytes)
    require(fb.pendingBytes == 0, "fixture chunk ends mid-frame")
    recs.iterator.collect {
      case r: RowImage =>
        val (k, v, e) = envelopeCols(r, fb.registry)
        Envelope(r.recordType, r.seqNumber, r.transactionId, k, v, e)
      case r: BeginTx => Envelope(r.recordType, r.seqNumber, r.transactionId, None, None, None)
      case r: CommitTx => Envelope(r.recordType, r.seqNumber, r.transactionId, None, None, None)
      case r: RollbackTx => Envelope(r.recordType, r.seqNumber, r.transactionId, None, None, None)
      case r: DiscardTx => Envelope(r.recordType, r.seqNumber, r.transactionId, None, None, None)
      case r: TruncateTab => Envelope(r.recordType, r.seqNumber, r.transactionId, None, None, None)
    }
  }

  /** Open-transaction assembly (the savepoint hooks of ec:2259-2319 as
    * group state): buffer row images per txid; COMMIT releases them
    * downstream in seq order; ROLLBACK drops them; DISCARD trims the tail
    * after its seq. Emits nothing for still-open transactions — their
    * state persists into the next micro-batch (exactly the opntxns rows).
    *
    * UPDBEF/UPDAFT arrive as SEPARATE records (ec:1848-1856); they pair
    * here, inside the per-transaction state, by (txid, seq) adjacency —
    * SURVEY §7.4.5: pairing with windows downstream would be fragile under
    * reordering, in state it's exact. */
  private def assemble(txid: Int, records: Iterator[Envelope],
                       state: GroupState[TxnBuf]): Iterator[Committed] = {
    var buf = state.getOption.getOrElse(TxnBuf(Nil, None, rolledBack = false, None))
    records.foreach { r =>
      r.recordType match {
        case t @ ("CDC_REC_INSERT" | "CDC_REC_UPDAFT" | "CDC_REC_UPDBEF" |
                  "CDC_REC_DELETE") =>
          buf = buf.copy(images =
            Image(r.seq, r.key.get, r.v, r.etype, t) :: buf.images)
        case "CDC_REC_COMMTX" => buf = buf.copy(commitSeq = Some(r.seq))
        case "CDC_REC_RBTX" => buf = buf.copy(rolledBack = true)
        case "CDC_REC_DISCARD" => buf = buf.copy(discardAfter = Some(r.seq))
        case "CDC_REC_TRUNCATE" =>
          buf = buf.copy(truncSeq = Some(buf.truncSeq.fold(r.seq)(math.max(_, r.seq))))
        case _ => // BEGIN opens the buffer; nothing to record beyond its existence
      }
    }
    if (buf.rolledBack) {
      state.remove() // delete_opntxns on ROLLBACK (ec:2301-2308)
      Iterator.empty
    } else if (buf.commitSeq.isDefined) {
      state.remove() // delete_opntxns + upsert_lsttxn on COMMIT (ec:2269-2299)
      val kept = buf.discardAfter.fold(buf.images)(d => buf.images.filter(_.seq <= d))
      // An in-transaction TRUNCATE wipes the txn's own earlier images too.
      val surviving = buf.truncSeq.fold(kept)(t => kept.filter(_.seq > t))
      val bySeq = surviving.sortBy(_.seq)
      val befores = bySeq.iterator
        .filter(_.kind == "CDC_REC_UPDBEF").map(i => (i.seq, i.key) -> i.v).toMap
      val marker = buf.truncSeq.iterator
        .map(t => Committed(TruncateKey, t, Some(0.0), None, Some(""),
          op = "truncate"))
      marker ++ bySeq.iterator
        .filter(_.kind != "CDC_REC_UPDBEF")
        .map(i => Committed(i.key, i.seq, i.v,
          befores.get((i.seq - 1, i.key)).flatten, i.etype,
          op = if (i.kind == "CDC_REC_DELETE") "delete" else "upsert"))
    } else {
      state.update(buf) // upsert_opntxns: still open (ec:663-700)
      Iterator.empty
    }
  }

  /** Hash buckets of the materialized table (data buckets `0..n-1`, the
    * truncate marker in dedicated bucket `n`). Fixed at table creation and
    * persisted in [[BucketMeta]]; the test default is small, a 100 TB
    * deployment sizes it so one bucket ≈ one executor-friendly rewrite
    * unit (thousands). */
  val DefaultBuckets = 8
  private val BucketMeta = "_graft_buckets"

  private def bucketExpr(nb: Int) =
    when(col("op") === "truncate", lit(nb))
      .otherwise(pmod(hash(col("k")), lit(nb)))
      .cast("int").as("bucket")

  /** The table's persisted bucket count, if the table exists. The count is
    * part of the table layout — changing it would re-route keys — so the
    * persisted value always wins over a caller's `numBuckets`. */
  private def readBuckets(fs: org.apache.hadoop.fs.FileSystem,
                          out: Path): Option[Int] = {
    val meta = new Path(out, BucketMeta)
    if (!fs.exists(meta)) {
      // Missing meta next to existing bucket data is the same hazard as an
      // unreadable meta: guessing a different count re-routes keys across
      // buckets, leaving duplicate live rows per key. Refuse.
      if (hasData(fs, out)) throw new IllegalStateException(
        s"missing $BucketMeta on a table WITH bucket data at $out — " +
          "refusing to guess the key routing")
      None
    }
    else {
      val in = fs.open(meta)
      val txt =
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      txt.trim.toIntOption match {
        case some @ Some(_) => some
        case None if !hasData(fs, out) => None // torn init crash: re-init
        case None => throw new IllegalStateException(
          s"unreadable $BucketMeta ('${txt.trim}') on a table WITH bucket " +
            s"data at $out — refusing to guess the key routing")
      }
    }
  }

  /** Create the table root + bucket-count meta on the FIRST non-empty
    * merge (an all-empty stream must not leave a parquet-less dir that
    * breaks schema inference for readers). The meta is written to a temp
    * name and renamed in, so a crash can never leave a half-written
    * count next to bucket data. */
  private def initBucketsIfMissing(fs: org.apache.hadoop.fs.FileSystem,
                                   out: Path, nb: Int): Unit = {
    if (readBuckets(fs, out).isEmpty) {
      fs.mkdirs(out)
      val tmp = new Path(out, BucketMeta + ".tmp")
      val os = fs.create(tmp, true)
      try os.write(nb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally os.close()
      fs.delete(new Path(out, BucketMeta), false)
      require(fs.rename(tmp, new Path(out, BucketMeta)),
        s"could not publish $BucketMeta at $out")
    }
  }

  private def hasData(fs: org.apache.hadoop.fs.FileSystem, out: Path): Boolean =
    fs.exists(out) && fs.listStatus(out)
      .exists(_.getPath.getName.startsWith("bucket="))

  /** A pre-bucketing `mergeLatest` layout (part files at the table root)
    * must not be treated as an empty table — its history would be ignored,
    * and root-level parquet mixed with new `bucket=` dirs breaks partition
    * discovery ("conflicting directory structures"). Fail fast instead of
    * silently forking the table's history. */
  private def rejectLegacyLayout(fs: org.apache.hadoop.fs.FileSystem,
                                 out: Path): Unit = {
    if (fs.exists(out)) {
      val rootParts = fs.listStatus(out).filter { st =>
        val n = st.getPath.getName
        st.isFile && (n.startsWith("part-") || n.endsWith(".parquet"))
      }
      if (rootParts.nonEmpty) throw new IllegalStateException(
        s"legacy (unbucketed) materialized-table layout at $out: found " +
          s"root-level data files (e.g. ${rootParts.head.getPath.getName}); " +
          "re-materialize into a fresh directory or migrate the files into " +
          "bucket= partitions before merging")
    }
  }

  /** Idempotent latest-per-key merge into a hash-bucketed parquet
    * "materialized table" — the lsttxn-style sink with the monotonic guard
    * (ec:747): an existing row only loses to a strictly-or-equally newer
    * seq, so replaying a batch (foreachBatch retry, checkpoint restart) is
    * a no-op.
    *
    * Scale shape (the point of the savepoint design, ec:2104-2194: ingest
    * cost must be O(new work), not O(history)): the table is laid out as
    * `bucket=pmod(hash(k), n)` partitions, and a batch rewrites ONLY the
    * buckets its keys land in — per-batch cost is O(|batch| + touched
    * buckets), never O(|table|). TRUNCATE is therefore lazy: committing
    * one rewrites just the marker bucket (the high-water row on
    * [[TruncateKey]]); rows at or below the mark linger physically in
    * untouched buckets but are invisible to [[readMaterialized]] and are
    * physically dropped whenever their bucket is next rewritten. Delete
    * tombstones stay in the table so a stale lower-LSN upsert arriving in
    * a later batch loses the per-key window instead of resurrecting the
    * key.
    *
    * The truncate high-water is computed IN-PLAN (a 1-row aggregate over
    * the marker bucket ∪ the batch's truncate verbs, broadcast onto every
    * row — the [[graft.api.Graft.applyChanges]] template), so the sink
    * runs exactly one job per batch.
    *
    * Crash safety: each touched bucket swaps individually (live renamed
    * aside to `.backup/bucket=B`, then staging promoted), so no committed
    * row ever exists only as deleted bytes. A crash mid-swap leaves some
    * buckets old and some new; [[recoverSwap]] re-promotes any orphaned
    * backup, and the streaming checkpoint replays the uncommitted batch,
    * which the monotonic merge absorbs per bucket. The sink assumes ONE
    * writer (foreachBatch serializes batches); a concurrent READER's
    * recoverSwap can still race the swap window, so every rename is
    * result-checked and a promotion that finds the live dir re-occupied
    * clears and retries — staged content supersedes, never silently
    * drops. On an object store the
    * same per-bucket two-step keeps every committed row reachable; a
    * production deployment would swap this sink for a transactional table
    * format, a config change because the merge itself is declarative. */
  def mergeLatest(changes: DataFrame, outDir: String,
                  numBuckets: Int = DefaultBuckets): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val spark = changes.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val out = new Path(outDir)
    val fs = out.getFileSystem(conf)
    recoverSwap(fs, out)
    rejectLegacyLayout(fs, out)
    val nb = readBuckets(fs, out).getOrElse(numBuckets)
    // Accept op-less frames (plain upsert streams) for compatibility.
    val withOp =
      if (changes.columns.contains("op")) changes
      else changes.withColumn("op", lit("upsert"))
    val batch = withOp.withColumn("bucket", bucketExpr(nb)).persist()
    try {
      // Bounded driver metadata (≤ nb+1 ints), NOT data: which bucket
      // directories this batch rewrites.
      val touched = batch.select("bucket").distinct()
        .collect().map(_.getInt(0)).sorted
      if (touched.isEmpty) return // empty micro-batch: nothing to merge
      initBucketsIfMissing(fs, out, nb)
      val exists = hasData(fs, out)
      // ONE table read (one listing/schema pass); both the touched-bucket
      // base and the marker read are partition-pruned filters of it.
      val table = if (exists) spark.read.parquet(outDir) else batch.limit(0)
      // Base = touched buckets ONLY (partition-pruned scan).
      val base =
        if (exists) table.filter(col("bucket").isin(touched.toSeq: _*))
        else table
      // Truncate high-water in-plan: the persisted marker (its own tiny
      // bucket, read pruned) ∪ any truncate verbs in this batch.
      val markerRows =
        if (exists) table.filter(col("bucket") === nb)
        else batch.limit(0)
      val truncT = markerRows
        .unionByName(batch.filter(col("op") === "truncate"))
        .agg(max(when(col("op") === "truncate", col("last_seq")))
          .as("_trunc_t"))
      val current = base.unionByName(batch)
        .crossJoin(broadcast(truncT))
        .filter(col("_trunc_t").isNull || col("op") === "truncate" ||
          col("last_seq") > col("_trunc_t"))
        .drop("_trunc_t")
      val merged = current
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("k")).orderBy(col("last_seq").desc)))
        .filter(col("rn") === 1).drop("rn")
      val staging = new Path(out, ".staging")
      val backup = new Path(out, ".backup")
      fs.delete(staging, true)
      fs.delete(backup, true)
      merged.write.partitionBy("bucket").mode("overwrite")
        .parquet(staging.toString)
      fs.mkdirs(backup)
      touched.foreach { b =>
        val live = new Path(out, s"bucket=$b")
        val stag = new Path(staging, s"bucket=$b")
        if (fs.exists(live))
          require(fs.rename(live, new Path(backup, s"bucket=$b")),
            s"could not retire $live")
        if (fs.exists(stag)) {
          // A concurrent reader's recoverSwap may have re-promoted the
          // just-retired backup; the staged content supersedes it, so
          // clear and retry rather than silently dropping the batch.
          if (!fs.rename(stag, live)) {
            fs.delete(live, true)
            require(fs.rename(stag, live), s"could not promote $stag")
          }
        }
        // A bucket fully wiped by truncate has no staging dir: it simply
        // stops existing — recovery-safe because the batch replays.
      }
      fs.delete(backup, true)
      fs.delete(staging, true)
    } finally batch.unpersist()
  }

  /** Maintenance compaction: physically drop every data row at or below
    * the truncate high-water from ALL buckets (the rows [[mergeLatest]]
    * wipes lazily and cleans only when a bucket is next touched). Run
    * off the ingest path when truncate churn has left dead rows in cold
    * buckets; visible content ([[readMaterialized]]) is unchanged by
    * construction. Rewrites every non-empty bucket once via the same
    * checked staging/backup swap as the merge. */
  def compact(spark: SparkSession, outDir: String): Unit = {
    val out = new Path(outDir)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs, out)
    rejectLegacyLayout(fs, out)
    if (!hasData(fs, out)) return
    val nb = readBuckets(fs, out).getOrElse(DefaultBuckets)
    val table = spark.read.parquet(outDir)
    val truncT = table.filter(col("bucket") === nb)
      .agg(max(when(col("op") === "truncate", col("last_seq")))
        .as("_trunc_t"))
    val kept = table.crossJoin(broadcast(truncT))
      .filter(col("_trunc_t").isNull || col("op") === "truncate" ||
        col("last_seq") > col("_trunc_t"))
      .drop("_trunc_t")
    val buckets = fs.listStatus(out).map(_.getPath.getName)
      .filter(_.startsWith("bucket=")).map(_.stripPrefix("bucket=").toInt)
      .sorted
    val staging = new Path(out, ".staging")
    val backup = new Path(out, ".backup")
    fs.delete(staging, true)
    fs.delete(backup, true)
    kept.write.partitionBy("bucket").mode("overwrite").parquet(staging.toString)
    fs.mkdirs(backup)
    buckets.foreach { b =>
      val live = new Path(out, s"bucket=$b")
      val stag = new Path(staging, s"bucket=$b")
      if (fs.exists(live))
        require(fs.rename(live, new Path(backup, s"bucket=$b")),
          s"could not retire $live")
      if (fs.exists(stag)) {
        if (!fs.rename(stag, live)) {
          fs.delete(live, true)
          require(fs.rename(stag, live), s"could not promote $stag")
        }
      }
    }
    fs.delete(backup, true)
    fs.delete(staging, true)
  }

  /** Promote per-bucket backups left by a crash mid-swap: any
    * `.backup/bucket=B` whose live dir is missing is re-promoted. The
    * interrupted batch was never acknowledged to the checkpoint, so it
    * replays — and the idempotent merge re-applies it per bucket. Safe to
    * call any time. */
  private def recoverSwap(fs: org.apache.hadoop.fs.FileSystem, out: Path): Unit = {
    val backup = new Path(out, ".backup")
    if (fs.exists(backup)) {
      fs.listStatus(backup).foreach { st =>
        val live = new Path(out, st.getPath.getName)
        if (!fs.exists(live)) fs.rename(st.getPath, live)
      }
    }
  }

  /** Read the materialized table as its USERS see it: live rows only —
    * delete tombstones, the truncate marker, and rows at or below the
    * truncate high-water (lazily wiped: still on disk in buckets the
    * sink hasn't rewritten since) are sink bookkeeping ([[Committed]] and
    * [[mergeLatest]] docs), not data. The high-water read is pruned to
    * the one marker bucket and broadcast — O(1) overhead on the scan. */
  def readMaterialized(spark: SparkSession, outDir: String): DataFrame = {
    val p = new Path(outDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs, p)
    val df = spark.read.parquet(outDir)
    if (!df.columns.contains("op")) df
    else {
      val marker = readBuckets(fs, p) match {
        case Some(nb) if df.columns.contains("bucket") =>
          df.filter(col("bucket") === nb)
        case _ => df
      }
      val truncT = marker.filter(col("op") === "truncate")
        .agg(max(col("last_seq")).as("_trunc_t"))
      df.filter(col("op") === "upsert")
        .crossJoin(broadcast(truncT))
        .filter(col("_trunc_t").isNull || col("last_seq") > col("_trunc_t"))
        .drop("_trunc_t", "op", "bucket")
    }
  }

  /** The shared downstream: txn assembly + idempotent merge sink.
    * Heartbeats (V2 source) advance source progress but carry no change —
    * drop them before keying state, or txid 0 accrues an empty buffer. */
  private def runPipeline(envelopes: Dataset[Envelope], checkpointDir: String,
                          outDir: String) = {
    import envelopes.sparkSession.implicits._
    val committed = envelopes
      .filter(_.recordType != "CDC_REC_TIMEOUT")
      .groupByKey(_.txid)
      .flatMapGroupsWithState[TxnBuf, Committed](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(assemble)
    committed.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((batch: Dataset[Committed], _: Long) =>
        mergeLatest(batch.toDF(), outDir))
      .start()
  }

  /** Build and start the streaming query (binaryFile source path: whole
    * chunk files decoded in a flatMap); caller awaits termination. */
  def start(spark: SparkSession, chunkDir: String, checkpointDir: String,
            outDir: String, maxFilesPerTrigger: Option[Int] = Some(3)) = {
    import spark.implicits._
    val reader = spark.readStream.format("binaryFile")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY"))
      .option("pathGlobFilter", "*.bin")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val envelopes = reader.load(chunkDir)
      .select(col("content")).as[Array[Byte]]
      .flatMap(decodeChunk _)
    runPipeline(envelopes, checkpointDir, outDir)
  }

  /** The `informixcdc_lsttxn` savepoint analog: the highest committed LSN
    * present in the materialized table (0 when nothing is materialized —
    * the NOTFOUND → 0 rule, ec:642-644). */
  def lastCommittedSeq(spark: SparkSession, outDir: String): Long = {
    val p = new Path(outDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs, p) // a crashed swap must not read as "no savepoint"
    if (!hasData(fs, p)) 0L
    else spark.read.parquet(outDir)
      .agg(coalesce(max(col("last_seq")), lit(0L))).head().getLong(0)
  }

  /** Restart WITHOUT a checkpoint — the reference's savepoint path: resolve
    * the activation LSN from persisted state via the ec:2172-2194 decision
    * table ([[Restart.resolveStartSeq]]) and let the source discard
    * already-committed history. With no open-txn record (the sink only
    * stores committed rows), the rule resolves to `last committed + 1`;
    * changes already in the table survive because the merge is monotonic.
    *
    * Precondition (as for the reference's log): the stream is globally
    * LSN-ordered across chunk files — otherwise an unprocessed transaction
    * with seqs below the high-water mark would be skipped. */
  def startFromSavepoint(spark: SparkSession, chunkDir: String,
                         freshCheckpointDir: String, outDir: String) = {
    val startSeq = Restart.resolveStartSeq(
      requested = -1L, useSavepoints = true, minOpenTxn = None,
      lastCommitted = lastCommittedSeq(spark, outDir))
    startV2(spark, chunkDir, freshCheckpointDir, outDir, startingSeq = startSeq)
  }

  /** Same pipeline over the DataSource V2 source
    * ([[graft.sources.CdcChunkSource]]): LSN-aware offsets, admission
    * control, and source-side discard of pre-`startingSeq` history. */
  def startV2(spark: SparkSession, chunkDir: String, checkpointDir: String,
              outDir: String, maxFilesPerTrigger: Option[Int] = Some(3),
              startingSeq: Long = 0L) = {
    import spark.implicits._
    val reader = spark.readStream
      .format("graft.sources.CdcChunkSource")
      .option("path", chunkDir)
      .option("startingSeq", startingSeq.toString)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    runPipeline(reader.load().as[Envelope], checkpointDir, outDir)
  }

  /** Streaming windowed aggregation with a watermark over the CDC stream
    * (`s_commit_windows`): commits per 1 ms event-time window, event time
    * derived from the LSN (`timestamp_micros(seq)` — the log's total order
    * IS the stream's clock). The watermark advances on every envelope
    * INCLUDING heartbeats — the reference's TIMEOUT semantic (progress
    * without data, ec:1403-1428): each chunk's closing beat carries its
    * high-water LSN, and the fixture's final beat sits past the log tail,
    * flushing every pending window in the eviction batch. Append mode +
    * the file sink give exactly-once window emission under restart (same
    * checkpoint machinery as the merge pipeline).
    *
    * Scale: one shuffle on the window key with partial aggregation
    * upstream; state holds only open windows (bounded by watermark lag),
    * not the stream. */
  def commitWindows(spark: SparkSession, chunkDir: String,
                    checkpointDir: String, outDir: String) = {
    val env = spark.readStream
      .format("graft.sources.CdcChunkSource")
      .option("path", chunkDir)
      .option("maxFilesPerTrigger", "3")
      .load()
    // Conditional aggregates instead of a pre-filter: a `filter(recordType
    // = COMMTX)` above the watermark gets PUSHED BELOW EventTimeWatermark
    // by Catalyst (the predicate doesn't touch the event-time column), and
    // then heartbeats never reach the max-event-time tracker — exactly the
    // progress signal they exist to provide. Aggregating every envelope
    // row and dropping empty windows AFTER the agg keeps the plan
    // un-pushable and the watermark heartbeat-driven.
    val isCommit = col("recordType") === "CDC_REC_COMMTX"
    env
      .select(col("recordType"), col("seq"),
        timestamp_micros(col("seq")).as("ts"))
      .withWatermark("ts", "1 millisecond")
      .groupBy(window(col("ts"), "1 millisecond"))
      .agg(sum(when(isCommit, 1L).otherwise(0L)).as("n_commits"),
        min(when(isCommit, col("seq"))).as("min_seq"),
        max(when(isCommit, col("seq"))).as("max_seq"))
      .filter(col("n_commits") > 0)
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("n_commits"), col("min_seq"), col("max_seq"))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** State-store partition count for the driver-checked streaming runs.
    *
    * A stateful operator's partitioning is captured from
    * `spark.sql.shuffle.partitions` at the query's FIRST micro-batch and
    * persisted in the checkpoint; every batch then commits one state-store
    * delta PER PARTITION per stateful operator, so the fixed per-batch
    * overhead scales with the partition count whether or not a partition
    * holds state. Batch shuffle width and streaming state width are
    * therefore different knobs: batch shuffles size to the DATA (32 here),
    * state stores size to the STATEFUL LOAD — open transactions / open
    * windows / in-flight join rows, which the watermark bounds to a tiny
    * fraction of the stream. On a 1000-executor cluster ingesting a real
    * firehose you'd raise this (state volume grows with open-txn count,
    * and more partitions = more parallel state commits); at the bench's
    * micro-batch cadence 8 cuts the per-batch fixed cost ~3× with zero
    * semantic change (measured: 10.8→4.0 s stream join, 6.2→3.4 s merge
    * pipeline, 3.5→2.1 s commit windows at sf0.1, local[32]).
    *
    * BENCH_r08 recorded 7.5 s for the merge pipeline, apparently
    * contradicting the 3.4 s above — both numbers were real: the bench
    * ran ~580 query executions in one JVM without releasing
    * localCheckpoint/persist blocks, and the accumulated block-manager
    * pressure penalized the streaming queries most (they re-plan every
    * micro-batch). In a fresh JVM (graft.tools.ProfileQ) the same build
    * ran 3.0-3.5 s. Fixed in [[graft.Bench]] by unpersisting + GC'ing
    * between queries; the r9 bench reads 3.0 s. */
  val StreamStatePartitions = 8

  /** Scopes `spark.sql.shuffle.partitions` to [[StreamStatePartitions]]
    * for the duration of `body` (a start + awaitTermination pair — the
    * conf must stay scoped until the stream FINISHES, because the value is
    * read when the first micro-batch is planned, asynchronously to
    * `start()`), then restores the session's batch setting.
    *
    * SERIAL-HARNESS ASSUMPTION (r8 advice): the setting is session-global
    * while `body` runs — a concurrent batch query on the same session
    * would plan with [[StreamStatePartitions]] shuffle partitions, and
    * two overlapping calls would restore the wrong saved value. The
    * driver's Verify/Bench harness runs queries strictly serially, which
    * is why this is safe here; a concurrent deployment should isolate
    * the stream on `SparkSession.newSession()` (own conf, shared
    * catalog/state) instead of scoping the shared conf. */
  private[streaming] def withStatePartitions[A](s: SparkSession)(body: => A): A = {
    val saved = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", StreamStatePartitions)
    try body finally s.conf.set("spark.sql.shuffle.partitions", saved)
  }

  /** Watermarked STREAM-STREAM join (`s_stream_join`): each committed row
    * image joined to ITS transaction's COMMIT record on (txid, event-time
    * range) — commit-LSN enrichment as Spark's symmetric hash join instead
    * of [[runPipeline]]'s explicit per-txn `flatMapGroupsWithState`. The
    * two sides are filtered branches of ONE source stream (a streaming
    * self-join): row images (INSERT/UPDAFT — the apply images) on the
    * left, COMMTX markers on the right. An inner join makes rollback
    * filtering structural — rolled-back transactions HAVE no commit
    * record, so their images simply never match (the reference's
    * delete-on-rollback, ec:1566-1615, with no state code at all).
    *
    * Both sides carry watermarks and the join condition bounds commit
    * time to (image time, image time + `maxTxnSpanMicros`] — the bound
    * MUST cover the longest transaction's (first image → commit)
    * event-time span, because an image whose commit lands outside it
    * silently never matches and its rows are DROPPED (r8 advice #1: this
    * was a hardcoded fixture constant; it is now the knob a caller sizes
    * to their source's transaction horizon, like any stream-stream join
    * range condition). The default 100 µs covers the driver fixture's
    * < 80 µs transactions (20 events × 4 seq units on the LSN clock).
    * That bound is what lets Spark evict join state as the watermark
    * advances: buffered images older than watermark − `maxTxnSpanMicros`
    * can never match a future commit and are dropped — state is O(open
    * transactions), never O(stream); a larger bound trades state size
    * for transaction-length tolerance. Append mode emits each match
    * exactly once; the checkpoint + file sink make restarts and replays
    * no-ops (same exactly-once machinery as the merge pipeline). */
  def commitJoin(spark: SparkSession, chunkDir: String,
                 checkpointDir: String, outDir: String,
                 maxFilesPerTrigger: Int = 3,
                 maxTxnSpanMicros: Long = 100L) = {
    def env = spark.readStream
      .format("graft.sources.CdcChunkSource")
      .option("path", chunkDir)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load()
    val images = env
      .filter(col("recordType").isin("CDC_REC_INSERT", "CDC_REC_UPDAFT"))
      .select(col("seq"), col("txid"), col("key").as("k"),
        timestamp_micros(col("seq")).as("img_ts"))
      .withWatermark("img_ts", "1 millisecond")
    val commits = env
      .filter(col("recordType") === "CDC_REC_COMMTX")
      .select(col("seq").as("commit_seq"), col("txid").as("c_txid"),
        timestamp_micros(col("seq")).as("c_ts"))
      .withWatermark("c_ts", "1 millisecond")
    require(maxTxnSpanMicros > 0,
      s"maxTxnSpanMicros must be positive, got $maxTxnSpanMicros")
    images.join(commits,
        col("txid") === col("c_txid") &&
          col("c_ts") > col("img_ts") &&
          col("c_ts") <= col("img_ts") +
            expr(s"INTERVAL $maxTxnSpanMicros MICROSECONDS"))
      .select(col("seq"), col("k"), col("txid"), col("commit_seq"))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Driver-checked: run [[commitJoin]] over the globally LSN-ordered
    * fixture and return the joined rows. The DuckDB oracle recomputes the
    * join relationally from `events` (committed transactions only). */
  def sStreamJoin(s: SparkSession, d: String): DataFrame = {
    val root = new java.io.File(
      s"/tmp/graft_stream_join/${d.replaceAll("[^A-Za-z0-9.]", "_")}")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(root, "checkpoint"))
    rm(new java.io.File(root, "joined"))
    val chunkDir = new java.io.File(root, "chunks")
    recordFixtureCached(s, d, chunkDir.getAbsolutePath, ordered = true)
    val ck = new java.io.File(root, "checkpoint").getAbsolutePath
    val out = new java.io.File(root, "joined").getAbsolutePath
    withStatePartitions(s) {
      commitJoin(s, chunkDir.getAbsolutePath, ck, out).awaitTermination()
    }
    s.read.parquet(out).orderBy(col("seq"))
  }

  /** Watermarked streaming DEDUPLICATION (`s_changelog_dedup`): the
    * at-least-once → exactly-once repair. The reference's stream is
    * at-least-once across reconnects — after a restart it can re-deliver
    * records at or before the resume LSN, which is why it carries
    * `discard_candidate` flags (ec:1459-1461, 1527-1529) and why the
    * restart table resolves a resume point rather than trusting delivery
    * (ec:2172-2194). Here the repair is declarative:
    * `dropDuplicatesWithinWatermark` keyed by the LSN — a re-delivered
    * record's seq is already in dedup state (same micro-batch or later)
    * or is older than the watermark (late data, dropped outright);
    * either way it emits exactly once. State is watermark-bounded: only
    * the in-flight window's seqs are remembered, never the stream. */
  def changelogDedup(spark: SparkSession, chunkDir: String,
                     checkpointDir: String, outDir: String,
                     maxFilesPerTrigger: Int = 3) = {
    spark.readStream
      .format("graft.sources.CdcChunkSource")
      .option("path", chunkDir)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load()
      .filter(col("recordType").isin("CDC_REC_INSERT", "CDC_REC_UPDAFT"))
      .select(col("seq"), col("txid"), col("key").as("k"), col("v"),
        col("etype"), timestamp_micros(col("seq")).as("ts"))
      .withWatermark("ts", "1 millisecond")
      .dropDuplicatesWithinWatermark("seq")
      .select(col("seq"), col("txid"), col("k"), col("v"), col("etype"))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming SESSION windows over the change stream
    * (`s_session_window`): per-key activity sessions that close after a
    * 10 ms event-time gap (seq micros — the log's total order is the
    * clock, as in [[commitWindows]]) — the streaming twin of the batch
    * `q_session_window`, on Spark's native `session_window` state
    * (merging windows, watermark-driven emission) instead of batch
    * gaps-and-islands.
    *
    * The watermark trap, session edition: a recordType PRE-filter would
    * be pushed below EventTimeWatermark (the predicate doesn't touch
    * `ts`) and heartbeats would stop advancing the clock — so instead
    * the key is MASKED before the watermark: non-image records flow
    * through the watermark tracker with `k = null` and pool in null-key
    * sessions that the post-agg `n_rows > 0` filter (an aggregate
    * result — unpushable) discards. Real keys' sessions therefore
    * contain image rows only, so their extents can't be stretched by a
    * same-key BEGIN/UPDBEF marker. State = open sessions only, bounded
    * by the watermark; the final heartbeat past the log tail flushes
    * every pending session. */
  def sessionWindows(spark: SparkSession, chunkDir: String,
                     checkpointDir: String, outDir: String) = {
    val isImage = col("recordType").isin("CDC_REC_INSERT", "CDC_REC_UPDAFT")
    spark.readStream
      .format("graft.sources.CdcChunkSource")
      .option("path", chunkDir)
      .option("maxFilesPerTrigger", "3")
      .load()
      .select(col("seq"),
        when(isImage, col("key")).as("k"),
        when(isImage, lit(1L)).otherwise(lit(0L)).as("is_img"),
        timestamp_micros(col("seq")).as("ts"))
      .withWatermark("ts", "1 millisecond")
      .groupBy(session_window(col("ts"), "10 milliseconds").as("w"), col("k"))
      .agg(sum(col("is_img")).as("n_rows"),
        min(when(col("is_img") === 1, col("seq"))).as("first_seq"),
        max(when(col("is_img") === 1, col("seq"))).as("last_seq"))
      .filter(col("n_rows") > 0)
      .select(col("k"), unix_micros(col("w.start")).as("sess_start_us"),
        col("n_rows"), col("first_seq"), col("last_seq"))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Driver-checked: [[sessionWindows]] over the ordered fixture. */
  def sSessionWindow(s: SparkSession, d: String): DataFrame = {
    val root = new java.io.File(
      s"/tmp/graft_stream_sess/${d.replaceAll("[^A-Za-z0-9.]", "_")}")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(root, "checkpoint"))
    rm(new java.io.File(root, "sessions"))
    val chunkDir = new java.io.File(root, "chunks")
    recordFixtureCached(s, d, chunkDir.getAbsolutePath, ordered = true)
    val ck = new java.io.File(root, "checkpoint").getAbsolutePath
    val out = new java.io.File(root, "sessions").getAbsolutePath
    withStatePartitions(s) {
      sessionWindows(s, chunkDir.getAbsolutePath, ck, out).awaitTermination()
    }
    s.read.parquet(out).orderBy(col("k"), col("sess_start_us"))
  }

  /** Driver-checked: record the ordered fixture, then RE-DELIVER one
    * middle chunk verbatim (a copy that lists right after the original —
    * the reconnect-replay shape), run [[changelogDedup]], and return the
    * deduped rows. The oracle is the duplicate-free mapping from
    * `events`, so any double emission breaks the row count AND the hash. */
  def sChangelogDedup(s: SparkSession, d: String): DataFrame = {
    val root = new java.io.File(
      s"/tmp/graft_stream_dedup/${d.replaceAll("[^A-Za-z0-9.]", "_")}")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(root, "checkpoint"))
    rm(new java.io.File(root, "deduped"))
    val chunkDir = new java.io.File(root, "chunks")
    // r8 advice #4: the replay copy is keyed to the SAME version marker
    // as the recording — a re-recorded fixture (marker bump) re-derives
    // the replay chunk instead of leaving a stale-encoding copy in the
    // chunks dir to corrupt the stream input.
    val freshlyRecorded =
      !new java.io.File(chunkDir, FixtureMarker).isFile
    recordFixtureCached(s, d, chunkDir.getAbsolutePath, ordered = true)
    val orig = new java.io.File(chunkDir, "chunk-003.bin")
    val replay = new java.io.File(chunkDir, "chunk-003x.bin")
    if (freshlyRecorded || !replay.isFile) {
      replay.delete()
      java.nio.file.Files.copy(orig.toPath, replay.toPath)
      replay.setLastModified(orig.lastModified() + 1000L)
    }
    val ck = new java.io.File(root, "checkpoint").getAbsolutePath
    val out = new java.io.File(root, "deduped").getAbsolutePath
    withStatePartitions(s) {
      changelogDedup(s, chunkDir.getAbsolutePath, ck, out).awaitTermination()
    }
    s.read.parquet(out).orderBy(col("seq"))
  }

  /** Driver-checked: run [[commitWindows]] over a globally LSN-ordered
    * fixture (the real transaction-log shape — the monotonic-watermark
    * precondition) and return the emitted windows. */
  def sCommitWindows(s: SparkSession, d: String): DataFrame = {
    val root = new java.io.File(
      s"/tmp/graft_stream_win/${d.replaceAll("[^A-Za-z0-9.]", "_")}")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(root, "checkpoint"))
    rm(new java.io.File(root, "windows"))
    val chunkDir = new java.io.File(root, "chunks")
    recordFixtureCached(s, d, chunkDir.getAbsolutePath, ordered = true)
    val ck = new java.io.File(root, "checkpoint").getAbsolutePath
    val out = new java.io.File(root, "windows").getAbsolutePath
    withStatePartitions(s) {
      commitWindows(s, chunkDir.getAbsolutePath, ck, out).awaitTermination()
    }
    s.read.parquet(out).orderBy(col("win_start_us"))
  }

  /** The driver-checked entry: record the fixture, run the pipeline to
    * completion from a clean checkpoint, return the materialized table.
    * The DuckDB oracle recomputes the same result relationally from
    * `events` (the fixture mapping is deterministic), so the whole
    * decode → txn-state → merge path is hash-checked. */
  def sCdcPipeline(s: SparkSession, d: String): DataFrame = {
    val root = new java.io.File(s"/tmp/graft_stream/${d.replaceAll("[^A-Za-z0-9.]", "_")}")
    val chunkDir = new java.io.File(root, "chunks")
    val checkpoint = new java.io.File(root, "checkpoint")
    val outDir = new java.io.File(root, "materialized")
    // Fresh deterministic run: clear all STATE; the recorded chunk fixture
    // is content-addressed by its inputs and reused.
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(checkpoint)
    rm(outDir) // staging/backup live INSIDE the table root; one rm covers all
    recordFixtureCached(s, d, chunkDir.getAbsolutePath)
    // The V2 source path (custom DataSource V2 with offset log + admission
    // control); the binaryFile path is spec-checked equal to it.
    withStatePartitions(s) {
      startV2(s, chunkDir.getAbsolutePath, checkpoint.getAbsolutePath,
        outDir.getAbsolutePath).awaitTermination()
    }
    readMaterialized(s, outDir.getAbsolutePath)
      .select(col("k"), col("last_seq"), col("v"), col("old_v"), col("etype"))
      .orderBy(col("k"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_cdc_pipeline" -> (sCdcPipeline _),
    "s_commit_windows" -> (sCommitWindows _),
    "s_stream_join" -> (sStreamJoin _),
    "s_changelog_dedup" -> (sChangelogDedup _),
    "s_session_window" -> (sSessionWindow _),
    "s_mv_delta" -> (MvStream.sMvDelta _)
  )

  val oracle: Map[String, String] = Map(
    "s_cdc_pipeline" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, value, event_type,
        |         CAST(event_id // 20 AS integer) AS txid
        |  FROM events),
        |keep AS (SELECT * FROM ev WHERE txid % 13 != 5)
        |SELECT user_id AS k, event_id * 4 + 2 AS last_seq, value AS v,
        |       CASE WHEN event_type = 'purchase' THEN value - 1.0 END AS old_v,
        |       event_type AS etype
        |FROM keep
        |QUALIFY row_number() OVER (PARTITION BY user_id
        |                           ORDER BY event_id DESC) = 1
        |ORDER BY k""".stripMargin,
    "s_commit_windows" ->
      """WITH ev AS (
        |  SELECT event_id, CAST(event_id // 20 AS integer) AS txid FROM events),
        |tx AS (
        |  SELECT txid, max(event_id * 4 + 2) + 1 AS commit_seq
        |  FROM ev GROUP BY txid),
        |c AS (SELECT commit_seq FROM tx WHERE txid % 13 != 5)
        |SELECT (commit_seq // 1000) * 1000 AS win_start_us,
        |       count(*) AS n_commits,
        |       min(commit_seq) AS min_seq, max(commit_seq) AS max_seq
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "s_stream_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id,
        |         CAST(event_id // 20 AS integer) AS txid FROM events),
        |tx AS (
        |  SELECT txid, max(event_id * 4 + 2) + 1 AS commit_seq
        |  FROM ev GROUP BY txid),
        |c AS (SELECT txid, commit_seq FROM tx WHERE txid % 13 != 5)
        |SELECT ev.event_id * 4 + 2 AS seq, ev.user_id AS k, ev.txid,
        |       c.commit_seq
        |FROM ev JOIN c USING (txid)
        |ORDER BY seq""".stripMargin,
    "s_changelog_dedup" ->
      """SELECT event_id * 4 + 2 AS seq,
        |       CAST(event_id // 20 AS integer) AS txid,
        |       user_id AS k, value AS v, event_type AS etype
        |FROM events ORDER BY seq""".stripMargin,
    // Session windows: gaps-and-islands over the image seqs (every event
    // maps to one image at event_id*4+2). Spark's session is half-open
    // [start, last+gap), so a gap of EXACTLY 10000 us starts a new
    // session — hence `>=`.
    "s_session_window" ->
      """WITH im AS (
        |  SELECT user_id AS k, event_id * 4 + 2 AS seq FROM events),
        |marked AS (
        |  SELECT k, seq,
        |         CASE WHEN lag(seq) OVER (PARTITION BY k ORDER BY seq) IS NULL
        |              OR seq - lag(seq) OVER (PARTITION BY k ORDER BY seq) >= 10000
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM im),
        |sess AS (
        |  SELECT k, seq,
        |         sum(new_s) OVER (PARTITION BY k ORDER BY seq
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT k, min(seq) AS sess_start_us, count(*) AS n_rows,
        |       min(seq) AS first_seq, max(seq) AS last_seq
        |FROM sess GROUP BY k, sid
        |ORDER BY k, sess_start_us""".stripMargin,
    // The streaming IVM invariant: the stream-maintained MV must equal
    // the full recompute over the log. Every event contributes exactly
    // one INSERT/UPDAFT image (purchases' UPDBEF is filtered out), so
    // the recompute is a plain per-key aggregate of `events`.
    "s_mv_delta" ->
      """SELECT user_id AS k, count(*) AS n_rows,
        |       cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value,
        |       max(event_id * 4 + 2) AS last_seq
        |FROM events GROUP BY user_id ORDER BY k""".stripMargin
  )
}
