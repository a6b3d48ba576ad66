package graft.cdc

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.time.{LocalDate, LocalDateTime, ZoneOffset}

/** Binary codec for the scheme-66 CDC wire format (SURVEY.md §1.1, M1).
  *
  * Frame: 16-byte header `header_sz:int4 | payload_sz:int4 | scheme:int4
  * (=66) | record_number:int4`, payload at offset 16 (ec:58-63, 774-781).
  * Row-image payloads carry a 20-byte change header `seq:int8 | txid:int4 |
  * tabid:int4 | flags:int4`, a var-len length array (4 bytes per
  * variable-length column, length INCLUDES the type's prefix), then column
  * bytes — fixed-width columns advance by their wire size, var-length by the
  * decoded length (ec:1183-1207).
  *
  * All multi-byte integers are big-endian (`ld2/ld4/ld8`, ec:2647-2678);
  * IEEE floats are big-endian on the wire (`lddbl/ldfloat` byte-swap on
  * little-endian hosts, ec:2680-2720) — `ByteBuffer.BIG_ENDIAN` gives both.
  *
  * NULLs are in-band sentinels per type, as Informix's `risnull` checks
  * (ec:823, 848, 865...). The reference links against the closed ESQL/C
  * runtime for the exact patterns; we fix them explicitly:
  *   - SMALLINT `0x8000`, INT/SERIAL/DATE `0x80000000`, BIGINT
  *     `0x8000000000000000` (the standard Informix integer sentinels);
  *   - INT8: sign word `0x7fff` (valid signs are 1/-1);
  *   - FLOAT/SMALLFLOAT: all bytes `0xff` (a quiet-NaN pattern);
  *   - BOOL: first byte 1 = null, else second byte is the value — explicit
  *     in the reference (ec:888-897);
  *   - CHAR: first byte `0x00` (a blank-padded CHAR never contains NUL);
  *   - VARCHAR/LVARCHAR: data length 1 with a single `0x00` byte;
  *   - DECIMAL/DATETIME: lead flag byte 0.
  *
  * DECIMAL and DATETIME decode correctly here — the reference DISABLED both
  * (returns literal "0.0", ec:1031-1040, 1075-1084) to dodge an `lddecimal`
  * memory leak (ec:18-21). DECIMAL(p,s) is packed BCD: sign byte then p
  * digits two-per-byte, fixed-point with s fractional digits. DATETIME is
  * the `YYYYMMDDhhmmss` + fraction digit-group layout the reference's dead
  * path sliced out of `dectoasc` text (ec:1140-1146), packed as 20 BCD
  * digits (fraction widened to 6 digits = microseconds, Spark's precision).
  *
  * The encoder exists for fixture generation and round-trip verification —
  * the reference's record mode (`write_testing_sblob`, ec:201-217) captured
  * live streams instead; with no committed golden file, encode→decode
  * identity is the testable contract (property specs + the DuckDB-checked
  * `q_cdc_roundtrip` query).
  */
object CdcCodec {
  import CdcRecords._

  val NullInt2: Short = Short.MinValue
  val NullInt4: Int = Int.MinValue
  val NullInt8: Long = Long.MinValue
  val NullSign: Short = 0x7fff.toShort

  /** Informix DATE epoch: day 1 = 1900-01-01 (`rjulmdy`, ec:863-886). */
  private val DateEpoch: Long = LocalDate.of(1899, 12, 31).toEpochDay

  // ------------------------------------------------------------ column codec

  /** Write one FIXED-WIDTH column value into `bb` at its current position
    * (var-length text goes through [[encodeRowPayload]]'s pre-encoded
    * bytes). Hot path: no per-column allocation — one shared buffer per
    * row, exactly the reference's write-into-the-frame discipline. */
  private def writeFixedColumn(spec: ColSpec, value: Any, bb: ByteBuffer): Unit = {
    spec.colType match {
      case ColType.Int2 =>
        bb.putShort(if (value == null) NullInt2 else value.asInstanceOf[Short])
      case ColType.Int4 =>
        bb.putInt(if (value == null) NullInt4 else value.asInstanceOf[Int])
      case ColType.Bigint =>
        bb.putLong(if (value == null) NullInt8 else value.asInstanceOf[Long])
      case ColType.Int8 =>
        if (value == null) { bb.putShort(NullSign); bb.putInt(0); bb.putInt(0) }
        else {
          val v = value.asInstanceOf[Long]
          val mag = math.abs(v)
          bb.putShort(if (v < 0) -1 else 1)
          bb.putInt((mag & 0xffffffffL).toInt)         // lo at +2 (ec:820)
          bb.putInt((mag >>> 32).toInt)                // hi at +6 (ec:821)
        }
      case ColType.DateDay =>
        bb.putInt(if (value == null) NullInt4
          else (localDateOf(value).toEpochDay - DateEpoch).toInt)
      case ColType.Bool =>
        if (value == null) { bb.put(1.toByte); bb.put(0.toByte) }
        else { bb.put(0.toByte)
          bb.put(if (value.asInstanceOf[Boolean]) 1.toByte else 0.toByte) }
      case ColType.Float8 =>
        if (value == null) bb.putLong(-1L)
        else bb.putDouble(value.asInstanceOf[Double])
      case ColType.Float4 =>
        if (value == null) bb.putInt(-1)
        else bb.putFloat(value.asInstanceOf[Float])
      case ColType.Char(n) =>
        val start = bb.position()
        if (value == null) {
          bb.put(0.toByte)
          var i = 1
          while (i < n) { bb.put(' '.toByte); i += 1 }
        } else {
          val raw = value.asInstanceOf[String].getBytes(UTF_8)
          require(raw.length <= n, s"CHAR($n) overflow for ${spec.name}")
          bb.put(raw)
          var i = raw.length
          while (i < n) { bb.put(' '.toByte); i += 1 }
        }
        assert(bb.position() == start + n)
      case ColType.Dec(p, s) =>
        val start = bb.position()
        val nBytes = (p + 1) / 2
        if (value == null) {
          var i = 0
          while (i <= nBytes) { bb.put(0.toByte); i += 1 }
        } else {
          val bd = value.asInstanceOf[java.math.BigDecimal].setScale(s)
          bb.put(if (bd.signum() < 0) 2.toByte else 1.toByte)
          packDigits(bd.abs.unscaledValue().toString, p, bb.array(),
            bb.arrayOffset() + bb.position())
          bb.position(bb.position() + nBytes)
        }
        assert(bb.position() == start + 1 + nBytes)
      case ColType.DTime =>
        if (value == null) {
          var i = 0
          while (i < 11) { bb.put(0.toByte); i += 1 }
        } else {
          val ldt = localDateTimeOf(value)
          bb.put(1.toByte)
          // Digit pairs packed directly (no string formatting — hot path).
          def bcd(v: Int): Byte = (((v / 10) << 4) | (v % 10)).toByte
          val y = ldt.getYear
          bb.put(bcd(y / 100)); bb.put(bcd(y % 100))
          bb.put(bcd(ldt.getMonthValue)); bb.put(bcd(ldt.getDayOfMonth))
          bb.put(bcd(ldt.getHour)); bb.put(bcd(ldt.getMinute))
          bb.put(bcd(ldt.getSecond))
          val us = ldt.getNano / 1000
          bb.put(bcd(us / 10000)); bb.put(bcd(us / 100 % 100)); bb.put(bcd(us % 100))
        }
      case _: ColType.Varchar.type | _: ColType.Lvarchar.type =>
        throw new IllegalStateException("var-length columns are pre-encoded")
    }
  }

  /** Encode one column value; returns (wire bytes, var-len array entry if
    * the type is variable-length). Spec-test surface — the row hot path
    * writes into a shared buffer via [[writeFixedColumn]] instead. */
  private[cdc] def encodeColumn(spec: ColSpec, value: Any): (Array[Byte], Option[Int]) =
    spec.colType match {
      case v: ColType.Varchar.type => encodeVarText(value, v.prefix)
      case v: ColType.Lvarchar.type => encodeVarText(value, v.prefix)
      case t =>
        val bb = ByteBuffer.allocate(t.wireSize)
        writeFixedColumn(spec, value, bb)
        (bb.array(), None)
    }

  /** Accept every host representation Spark hands out for DATE — the
    * decoded value is always `java.time.LocalDate` (UTC wall-clock). */
  private def localDateOf(value: Any): LocalDate = value match {
    case d: java.sql.Date => d.toLocalDate
    case d: LocalDate => d
    case other => throw new IllegalArgumentException(s"not a date: $other")
  }

  /** Accept every host representation Spark hands out for TIMESTAMP /
    * TIMESTAMP_NTZ; wall-clock digits are taken in UTC for instants. */
  private def localDateTimeOf(value: Any): LocalDateTime = value match {
    case t: java.sql.Timestamp => LocalDateTime.ofInstant(t.toInstant, ZoneOffset.UTC)
    case t: java.time.Instant => LocalDateTime.ofInstant(t, ZoneOffset.UTC)
    case t: LocalDateTime => t
    case other => throw new IllegalArgumentException(s"not a timestamp: $other")
  }

  private def encodeVarText(value: Any, prefix: Int): (Array[Byte], Option[Int]) = {
    val data = if (value == null) Array[Byte](0)
      else value.asInstanceOf[String].getBytes(UTF_8)
    (new Array[Byte](prefix) ++ data, Some(prefix + data.length))
  }

  /** Pack a digit string right-aligned (zero-filled) into `width` BCD
    * digits at `off`, without building a padded copy. */
  private def packDigits(digits: String, width: Int, out: Array[Byte], off: Int): Unit = {
    require(digits.length <= width, s"decimal overflow: $digits > $width digits")
    val total = width + (width & 1) // whole bytes
    val pad = total - digits.length
    var d = 0
    while (d < digits.length) {
      val pos = pad + d
      val digit = digits.charAt(d) - '0'
      if ((pos & 1) == 0) out(off + pos / 2) = (digit << 4).toByte
      else out(off + pos / 2) = (out(off + pos / 2) | digit).toByte
      d += 1
    }
  }

  private def unpackDigits(bytes: Array[Byte], off: Int, nBytes: Int): String = {
    val sb = new StringBuilder(nBytes * 2)
    var i = 0
    while (i < nBytes) {
      val b = bytes(off + i) & 0xff
      sb.append(('0' + (b >> 4)).toChar).append(('0' + (b & 0xf)).toChar)
      i += 1
    }
    sb.toString
  }

  /** Decode one column (extract_column_to_dict, ec:783-1161); returns
    * (value-or-null, bytes consumed from the column area, var entries used).
    * Spec-test surface — the row hot path shares one wrapped buffer. */
  private[cdc] def decodeColumn(spec: ColSpec, bytes: Array[Byte], off: Int,
                                varLens: IndexedSeq[Int], varIdx: Int): (Any, Int, Int) =
    decodeColumnBuf(spec, bytes, ByteBuffer.wrap(bytes), off,
      if (varLens.isEmpty) EmptyVarLens else varLens.toArray, varIdx)

  private val EmptyVarLens = Array.emptyIntArray

  private def decodeColumnBuf(spec: ColSpec, bytes: Array[Byte], buf: ByteBuffer,
                              off: Int, varLens: Array[Int],
                              varIdx: Int): (Any, Int, Int) = {
    spec.colType match {
      case ColType.Int2 =>
        val v = buf.getShort(off)
        (if (v == NullInt2) null else v, 2, 0)
      case ColType.Int4 =>
        val v = buf.getInt(off)
        (if (v == NullInt4) null else v, 4, 0)
      case ColType.Bigint =>
        val v = buf.getLong(off)
        (if (v == NullInt8) null else v, 8, 0)
      case ColType.Int8 =>
        val sign = buf.getShort(off)
        val v = if (sign == NullSign) null else {
          val lo = buf.getInt(off + 2) & 0xffffffffL
          val hi = buf.getInt(off + 6) & 0xffffffffL
          sign * ((hi << 32) | lo)
        }
        (v, 10, 0)
      case ColType.DateDay =>
        val v = buf.getInt(off)
        // java.time.LocalDate, not java.sql.Date: epoch-day arithmetic with
        // no calendar/timezone round-trip, and Spark encoders map it to
        // DateType directly — the envelope stays primitive-friendly.
        (if (v == NullInt4) null else LocalDate.ofEpochDay(v + DateEpoch), 4, 0)
      case ColType.Bool =>
        (if (bytes(off) == 1) null else bytes(off + 1) != 0, 2, 0)
      case ColType.Char(n) =>
        (if (bytes(off) == 0) null else new String(bytes, off, n, UTF_8), n, 0)
      case v: ColType.Varchar.type => decodeVarText(bytes, off, varLens(varIdx), v.prefix)
      case v: ColType.Lvarchar.type => decodeVarText(bytes, off, varLens(varIdx), v.prefix)
      case ColType.Float8 =>
        val raw = buf.getLong(off)
        (if (raw == -1L) null else java.lang.Double.longBitsToDouble(raw), 8, 0)
      case ColType.Float4 =>
        val raw = buf.getInt(off)
        (if (raw == -1) null else java.lang.Float.intBitsToFloat(raw), 4, 0)
      case ColType.Dec(p, s) =>
        val nBytes = (p + 1) / 2
        val v = bytes(off) match {
          case 0 => null
          case sign =>
            val unscaled = new java.math.BigInteger(unpackDigits(bytes, off + 1, nBytes))
            val bd = new java.math.BigDecimal(unscaled, s)
            if (sign == 2) bd.negate() else bd
        }
        (v, 1 + nBytes, 0)
      case ColType.DTime =>
        val v = if (bytes(off) == 0) null else {
          def un(i: Int): Int = { val b = bytes(off + i) & 0xff; (b >> 4) * 10 + (b & 0xf) }
          val ldt = LocalDateTime.of(
            un(1) * 100 + un(2), un(3), un(4), un(5), un(6), un(7),
            (un(8) * 10000 + un(9) * 100 + un(10)) * 1000)
          // java.time.Instant (UTC wall clock), not java.sql.Timestamp —
          // see the DateDay note.
          ldt.toInstant(ZoneOffset.UTC)
        }
        (v, 11, 0)
    }
  }

  private def decodeVarText(bytes: Array[Byte], off: Int, varLen: Int,
                            prefix: Int): (Any, Int, Int) = {
    val colLen = varLen - prefix
    val v = if (colLen == 1 && bytes(off + prefix) == 0) null
      else new String(bytes, off + prefix, colLen, UTF_8)
    (v, varLen, 1)
  }

  // --------------------------------------------------------------- row codec

  /** Encode a row image payload: change header + var-len array + columns
    * (layout per ec:1183-1207). `values` in declared column order.
    *
    * Hot path (the streaming fixture recorder and `q_cdc_roundtrip` run
    * this once per change): one size pass, one allocation, direct writes —
    * only var-length text pre-encodes its UTF-8 bytes (needed for the
    * length array that precedes the column area). */
  def encodeRowPayload(schema: TableSchema, seq: Long, txid: Int, flags: Int,
                       values: IndexedSeq[Any]): Array[Byte] = {
    val n = schema.cols.length
    require(values.length == n,
      s"${schema.tabname}: ${values.length} values for $n columns")
    val varData = new Array[Array[Byte]](n)   // null ⇒ fixed-width column
    val varPrefix = new Array[Int](n)
    var colBytes = 0
    var nVar = 0
    var i = 0
    while (i < n) {
      schema.cols(i).colType match {
        case v: ColType.Varchar.type =>
          val d = varTextBytes(values(i))
          varData(i) = d; varPrefix(i) = v.prefix; nVar += 1
          colBytes += v.prefix + d.length
        case v: ColType.Lvarchar.type =>
          val d = varTextBytes(values(i))
          varData(i) = d; varPrefix(i) = v.prefix; nVar += 1
          colBytes += v.prefix + d.length
        case t => colBytes += t.wireSize
      }
      i += 1
    }
    val bb = ByteBuffer.allocate(ChangeHeaderSz + 4 * nVar + colBytes)
    bb.putLong(seq).putInt(txid).putInt(schema.tabid).putInt(flags)
    i = 0
    while (i < n) {                            // var-len length array
      if (varData(i) != null) bb.putInt(varPrefix(i) + varData(i).length)
      i += 1
    }
    i = 0
    while (i < n) {                            // column area
      if (varData(i) != null) {
        var p = 0
        while (p < varPrefix(i)) { bb.put(0.toByte); p += 1 }
        bb.put(varData(i))
      } else writeFixedColumn(schema.cols(i), values(i), bb)
      i += 1
    }
    bb.array()
  }

  /** Var-length text data bytes; null encodes as one 0x00 sentinel byte. */
  private def varTextBytes(value: Any): Array[Byte] =
    if (value == null) NullVarText
    else value.asInstanceOf[String].getBytes(UTF_8)
  private val NullVarText = Array[Byte](0)

  /** Decode a row image payload with the registered schema
    * (extract_columns_to_list + extract_iud, ec:1163-1304). One buffer
    * wrap per row; the column walk reads at absolute offsets. */
  def decodeRowPayload(recordNumber: Int, payload: Array[Byte],
                       registry: SchemaRegistry): RowImage = {
    val buf = ByteBuffer.wrap(payload)
    val seq = buf.getLong(0)
    val txid = buf.getInt(8)
    val tabid = buf.getInt(12)
    val flags = buf.getInt(16)
    val schema = registry(tabid)
    val nVar = schema.numVarCols
    val varLens = if (nVar == 0) EmptyVarLens else {
      val a = new Array[Int](nVar)
      var i = 0
      while (i < nVar) { a(i) = buf.getInt(ChangeHeaderSz + 4 * i); i += 1 }
      a
    }
    var off = ChangeHeaderSz + 4 * nVar
    var varIdx = 0
    val n = schema.cols.length
    val cols = new Array[ColValue](n)
    var c = 0
    while (c < n) {
      val spec = schema.cols(c)
      val (v, adv, varUsed) = decodeColumnBuf(spec, payload, buf, off, varLens, varIdx)
      off += adv
      varIdx += varUsed
      cols(c) = ColValue(spec.name, v)
      c += 1
    }
    RowImage(recordNumber, seq, txid, tabid, flags,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(cols))
  }

  // ------------------------------------------------------------ record codec

  /** Encode any record to a complete frame (header + payload). */
  def encodeFrame(rec: CdcRecord, registryForRows: SchemaRegistry = null,
                  rowValues: IndexedSeq[Any] = null): Array[Byte] = {
    val payload: Array[Byte] = rec match {
      case r: BeginTx =>
        ByteBuffer.allocate(24).putLong(r.seqNumber).putInt(r.transactionId)
          .putLong(r.startTime).putInt(r.userId).array()
      case r: CommitTx =>
        ByteBuffer.allocate(20).putLong(r.seqNumber).putInt(r.transactionId)
          .putLong(r.commitTime).array()
      case r: RollbackTx =>
        ByteBuffer.allocate(12).putLong(r.seqNumber).putInt(r.transactionId).array()
      case r: DiscardTx =>
        ByteBuffer.allocate(12).putLong(r.seqNumber).putInt(r.transactionId).array()
      case r: TruncateTab =>
        ByteBuffer.allocate(16).putLong(r.seqNumber).putInt(r.transactionId)
          .putInt(r.tabid).array()
      case r: TimeoutBeat =>
        ByteBuffer.allocate(8).putLong(r.seqNumber).array()
      case r: TabSchema =>
        val text = r.colsDesc.getBytes(UTF_8)
        // cols_desc is NUL-terminated on the wire: decode reads payload_sz-1
        // bytes of text (ec:1346).
        ByteBuffer.allocate(20 + text.length + 1).putInt(r.tabid).putInt(r.flags)
          .putInt(r.fixLenSz).putInt(r.fixLenCols).putInt(r.varLenCols)
          .put(text).put(0.toByte).array()
      case r: RowImage =>
        encodeRowPayload(registryForRows(r.tabid), r.seqNumber, r.transactionId,
          r.flags, r.columns.map(_.value))
      case ErrorRecord => Array.emptyByteArray
    }
    frame(rec.recordNumber, payload)
  }

  /** Convenience: build a row-image frame directly from raw values. */
  def encodeRowFrame(recordNumber: Int, schema: TableSchema, seq: Long,
                     txid: Int, flags: Int, values: IndexedSeq[Any]): Array[Byte] =
    frame(recordNumber, encodeRowPayload(schema, seq, txid, flags, values))

  private def frame(recordNumber: Int, payload: Array[Byte]): Array[Byte] =
    ByteBuffer.allocate(RecordHeaderOffset + payload.length)
      .putInt(RecordHeaderOffset).putInt(payload.length)
      .putInt(PacketScheme).putInt(recordNumber)
      .put(payload).array()

  /** Decode one record payload by record number (extract_record dispatcher,
    * ec:1806-1923). Unknown numbers raise — the dispatcher's explicit
    * CDC_REC_UNKNOWN error path. */
  def decodeRecord(recordNumber: Int, payload: Array[Byte],
                   registry: SchemaRegistry): CdcRecord = {
    val buf = ByteBuffer.wrap(payload)
    recordNumber match {
      case BEGINTX =>
        BeginTx(buf.getLong(0), buf.getInt(8), buf.getLong(12), buf.getInt(20))
      case COMMTX => CommitTx(buf.getLong(0), buf.getInt(8), buf.getLong(12))
      case RBTX => RollbackTx(buf.getLong(0), buf.getInt(8))
      case DISCARD => DiscardTx(buf.getLong(0), buf.getInt(8))
      case TRUNCATE => TruncateTab(buf.getLong(0), buf.getInt(8), buf.getInt(12))
      case TIMEOUT => TimeoutBeat(buf.getLong(0))
      case ERROR => ErrorRecord
      case TABSCHEM =>
        TabSchema(buf.getInt(0), buf.getInt(4), buf.getInt(8), buf.getInt(12),
          buf.getInt(16), new String(payload, 20, payload.length - 21, UTF_8))
      case INSERT | DELETE | UPDBEF | UPDAFT =>
        decodeRowPayload(recordNumber, payload, registry)
      case n =>
        throw new IllegalArgumentException(s"unknown CDC record number $n")
    }
  }

  /** Decode exactly one frame (hot path for one-frame-per-message sources;
    * [[FrameBuffer]] handles multi-frame chunked streams). */
  def decodeFrame(bytes: Array[Byte], registry: SchemaRegistry): CdcRecord = {
    val bb = ByteBuffer.wrap(bytes)
    val headerSz = bb.getInt(0)
    val payloadSz = bb.getInt(4)
    require(bb.getInt(8) == PacketScheme, s"invalid packet scheme ${bb.getInt(8)}")
    require(headerSz + payloadSz == bytes.length,
      s"frame size mismatch: header says ${headerSz + payloadSz}, got ${bytes.length}")
    decodeRecord(bb.getInt(12),
      java.util.Arrays.copyOfRange(bytes, headerSz, headerSz + payloadSz), registry)
  }

  /** Decode every complete frame in a buffer, threading registry updates on
    * in-band TABSCHEM records (the fetchone side-effect, ec:2310-2316).
    * Returns the records and the updated registry. Trailing partial bytes
    * raise — callers with chunked input use [[FrameBuffer]]. */
  def decodeAll(bytes: Array[Byte],
                registry: SchemaRegistry): (Vector[CdcRecord], SchemaRegistry) = {
    var reg = registry
    val out = Vector.newBuilder[CdcRecord]
    val fb = new FrameBuffer(reg)
    out ++= fb.append(bytes)
    reg = fb.registry
    require(fb.pendingBytes == 0,
      s"${fb.pendingBytes} trailing bytes do not form a complete frame")
    (out.result(), reg)
  }
}

/** Chunk-boundary-safe frame splitter — the buffered pull loop of
  * `fetchone` (ec:2228-2368) as a reusable class: bytes arrive in arbitrary
  * chunks (`ifx_lo_read` returns whatever the server has), complete frames
  * are decoded and returned, and a trailing partial frame is compacted to
  * the buffer head (memcpy, ec:2334-2338) to await the next chunk.
  *
  * Registry updates (TABSCHEM) happen inline during the walk, exactly where
  * the reference hooks `add_tabschema` (ec:2310-2316), so a row image
  * arriving after its schema record in the same chunk decodes correctly.
  */
final class FrameBuffer(initial: SchemaRegistry) {
  import CdcRecords._
  private var reg = initial
  private var buf: Array[Byte] = Array.emptyByteArray

  def registry: SchemaRegistry = reg
  def pendingBytes: Int = buf.length

  /** Append a chunk; return all records whose frames completed. */
  def append(chunk: Array[Byte]): Vector[CdcRecord] = {
    buf = if (buf.isEmpty) chunk else buf ++ chunk
    val out = Vector.newBuilder[CdcRecord]
    var start = 0
    val bb = ByteBuffer.wrap(buf)
    while (buf.length - start >= RecordHeaderOffset && {
      val headerSz = bb.getInt(start)
      val payloadSz = bb.getInt(start + 4)
      // Corrupt sizes must fail loudly, not mis-walk: a negative payload_sz
      // would move the cursor backwards (infinite loop), an undersized
      // header would overlap payloads. The reference trusts the server; a
      // decoder over arbitrary files cannot.
      require(headerSz == RecordHeaderOffset,
        s"invalid header_sz $headerSz (scheme-66 headers are $RecordHeaderOffset bytes)")
      require(payloadSz >= 0, s"invalid negative payload_sz $payloadSz")
      // Long arithmetic: headerSz + payloadSz near Int.MaxValue would wrap
      // negative and make the completeness test spuriously true, crashing
      // later inside copyOfRange instead of waiting for (or rejecting) the
      // rest of the frame.
      buf.length - start >= headerSz.toLong + payloadSz
    }) {
      val headerSz = bb.getInt(start)
      val payloadSz = bb.getInt(start + 4)
      val scheme = bb.getInt(start + 8)
      require(scheme == PacketScheme, s"invalid packet scheme $scheme")
      val recordNumber = bb.getInt(start + 12)
      val payload = java.util.Arrays.copyOfRange(buf, start + headerSz,
        start + headerSz + payloadSz)
      val rec = CdcCodec.decodeRecord(recordNumber, payload, reg)
      rec match {
        case ts: TabSchema => reg = reg.withTabSchema(ts)
        case _ =>
      }
      out += rec
      start += headerSz + payloadSz
    }
    buf = if (start == 0) buf else java.util.Arrays.copyOfRange(buf, start, buf.length)
    out.result()
  }
}
