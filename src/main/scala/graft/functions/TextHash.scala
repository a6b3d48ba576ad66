package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types._

/** Native token-hash kernels for the dedup family (SURVEY §7.3).
  *
  * The MinHash/SimHash/Jaccard/fingerprint operators hash every token or
  * shingle of every document. Composed from built-ins that is
  * `transform(toks, t -> cast(conv(substring(md5(t),1,15),16,10) AS
  * bigint))` — an interpreted lambda per element that materializes a hex
  * string, a substring, and a decimal string per token, and (being a
  * higher-order function) splits the surrounding codegen stage. At the
  * 100 TB design point token hashing is the dominant per-row cost of the
  * whole dedup family, so these two expressions replace the hot
  * compositions with single native passes:
  *
  *  - `h60_array(array<string>) -> array<long>` — per element, the first
  *    60 bits of md5 as a positive long: BIT-IDENTICAL to
  *    `conv(substring(md5(s),1,15),16,10)` (15 hex digits = first 7.5
  *    bytes = `firstEightBytes >>> 4`), so the DuckDB oracles
  *    (`('0x' || substring(md5(s),1,15))::UBIGINT::BIGINT`) stay valid.
  *  - `minhash_sig(array<long>) -> array<long>` — all 16 seeded
  *    permutation minima in ONE pass over the (already mod-P) hash set,
  *    replacing 16 separate `array_min(transform(hs, x -> (a*x+b) % P))`
  *    projections. Same arithmetic, same constants ([[MinHashFamily]]),
  *    element i null iff the input is empty (array_min's semantics).
  *
  * Both generate a call to a static helper from `doGenCode`, keeping the
  * surrounding stage inside whole-stage codegen (the helper loop is a
  * single JIT-friendly method, like Spark's own runtime helpers).
  */
object MinHashFamily {
  val P = 2147483647L
  val NumPerms = 16
  /** Seeds shared verbatim with the DuckDB oracle SQL (LlmQueries). */
  val perms: IndexedSeq[(Long, Long)] =
    (0 until NumPerms).map(i => ((1000003L * (i + 1)) % P, (999983L * i + 12345L) % P))
  private[functions] val A: Array[Long] = perms.map(_._1).toArray
  private[functions] val B: Array[Long] = perms.map(_._2).toArray
}

case class H60Array(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"h60_array expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    H60Array.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.H60Array.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): H60Array =
    copy(child = newChild)
  override def prettyName: String = "h60_array"
}

object H60Array {
  /** One MD5 instance per thread, shared by every kernel in this file so
    * the oracle-critical hash plumbing exists exactly once. */
  private[functions] val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Fold an md5 digest to its first 60 bits: 15 hex digits == first 7.5
    * bytes == big-endian first 8 bytes with the low nibble dropped. The
    * ONE definition of the h60 bit layout — [[ShingleH60]] folds through
    * here too, so the composed and fused pipelines cannot desynchronize. */
  private[functions] def fold60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Per-thread 16-byte digest output buffer: `md.digest(buf, 0, 16)`
    * instead of the allocating `md.digest()`, keeping the per-token hot
    * path allocation-free across every kernel in this file. */
  private[functions] val buf16 = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** Open-addressing table capacity for `count` keys: the next power of
    * two ≥ 2·count (load factor ≤ 0.5). Guarded: past 2^29 keys the
    * doubled capacity would overflow Int and either hang the probe loop
    * (full table) or spin `c <<= 1` forever — a >500M-token single
    * document is beyond any sane in-row kernel, so fail LOUDLY instead
    * of becoming the silent straggler these kernels exist to prevent. */
  private[functions] def tableCap(count: Int): Int = {
    require(count <= (1 << 29),
      s"document too large for an in-row kernel: $count keys (max ${1 << 29})")
    var c = 8
    val n = count * 2
    while (c < n) c <<= 1
    c
  }

  /** First 60 bits of md5(s). */
  def h60(bytes: Array[Byte]): Long = {
    val md = digest.get()
    val out = buf16.get()
    md.reset()
    md.update(bytes)
    md.digest(out, 0, 16)
    fold60(out)
  }

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) null
        else h60(arr.getUTF8String(i).getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Fused shingling kernel: raw text → the DISTINCT h60 hashes of its word
  * `n`-grams, in one native pass. Bit-identical to the composition
  * `array_distinct(h60_array(array_distinct(transform(sequence(1,
  * greatest(size(toks)-n+1, 1)), i -> array_join(slice(toks, i, n),
  * ' ')))))` over `toks = split(text, ' ')` (same split semantics, same
  * clipping for short docs, same md5-based h60) — deduping before or after
  * hashing yields the same set, so the DuckDB oracles that replicate the
  * composed pipeline stay valid. `modP` additionally reduces each hash mod
  * [[MinHashFamily.P]] (the MinHash domain) before deduping, matching
  * `array_distinct(transform(h60_array(shingles), h -> h % P))`.
  *
  * Why fused: the composed form materializes a token array, a shingle
  * STRING per position, and three intermediate arrays per document, with
  * interpreted lambdas splitting the codegen stage; this kernel hashes
  * each shingle incrementally (md5 update per token + separator) without
  * ever building the joined string — shingle hashing is the dominant
  * per-row cost of the whole dedup family at the 100 TB design point. */
case class ShingleH60(child: Expression, n: Int, modP: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"${prettyName} expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleH60.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, modP)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleH60.compute($c, $n, $modP)")

  override protected def withNewChildInternal(newChild: Expression): ShingleH60 =
    copy(child = newChild)
  override def prettyName: String = if (modP) "shingle_h60p" else "shingle_h60"
}

object ShingleH60 {
  def compute(text: org.apache.spark.unsafe.types.UTF8String, n: Int,
              modP: Boolean): ArrayData = {
    // Tokenize the raw UTF-8 bytes on 0x20 — the space byte can never
    // occur inside a multi-byte UTF-8 sequence, so byte boundaries equal
    // the character boundaries `split(text, ' ')` sees, with no
    // UTF-16 decode / re-encode round-trip. split(" ", -1) semantics:
    // empty tokens (incl. trailing) kept, so #tokens = #spaces + 1.
    val bytes = text.getBytes
    var m = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') m += 1; i += 1 }
    val tokStart = new Array[Int](m)
    val tokEnd = new Array[Int](m)
    var t = 0
    var s = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        tokStart(t) = s; tokEnd(t) = i; t += 1; s = i + 1
      }
      i += 1
    }
    // Adjacent tokens are separated by EXACTLY the single space the
    // shingle join would re-insert, so every shingle is one contiguous
    // slice of the original bytes — one md.update, no string building.
    // Dedup is a primitive open-addressing long set plus an
    // insertion-order output buffer (LinkedHashSet semantics without the
    // per-hash box/node allocations this kernel exists to avoid).
    val count = math.max(m - n + 1, 1) // short docs yield one clipped shingle
    val cap = H60Array.tableCap(count)
    val mask = cap - 1
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val order = new Array[Long](count)
    var sz = 0
    val md = H60Array.digest.get()
    val d16 = H60Array.buf16.get()
    i = 0
    while (i < count) {
      md.reset()
      val last = math.min(i + n, m) - 1
      md.update(bytes, tokStart(i), tokEnd(last) - tokStart(i))
      md.digest(d16, 0, 16)
      var v = H60Array.fold60(d16)
      if (modP) v = v % MinHashFamily.P
      var idx = v.toInt & mask // md5-derived — low bits already uniform
      var done = false
      while (!done) {
        if (!used(idx)) {
          used(idx) = true; keys(idx) = v
          order(sz) = v; sz += 1
          done = true
        } else if (keys(idx) == v) done = true
        else idx = (idx + 1) & mask
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(order, sz))
  }
}

/** One-pass repetition-signal kernel: raw text → the five counts behind
  * the Gopher/C4-style intra-document repetition ratios, in a SINGLE
  * traversal with open-addressing hash tables — replacing the composed
  * `array_max(transform(array_distinct(g2), u -> size(filter(g2, …))))`
  * form whose per-row cost is O(distinct × total) in the 2-gram count:
  * quadratic in document length, which turns one pathological long web
  * document into a never-finishing task at the 100 TB design point
  * (stragglers, not throughput, are how that kills a job).
  *
  * Returns `struct<n_tokens, n_distinct_tokens, n_2grams,
  * n_distinct_2grams, max_2gram_count>` (all int); the ratio/rounding
  * arithmetic stays in Catalyst expressions with the exact shape the
  * DuckDB oracle replicates, so swapping the counting engine cannot move
  * a rounded value. Tokenization is byte-identical to [[ShingleH60]]
  * (split on 0x20, `split(text,' ',-1)` semantics, `max(m-1,1)` clipped
  * 2-grams), and distinctness keys on the FULL 128-bit md5 of each
  * token/2-gram byte slice — not a 60-bit fold — so hash-collision
  * divergence from the string-keyed oracle is ~2⁻¹²⁸ per pair. */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionStats.Schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct_tokens", IntegerType, nullable = false),
    StructField("n_2grams", IntegerType, nullable = false),
    StructField("n_distinct_2grams", IntegerType, nullable = false),
    StructField("max_2gram_count", IntegerType, nullable = false)))

  def compute(text: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    import H60Array.tableCap
    // Tokenize raw UTF-8 bytes on 0x20 — identical to ShingleH60.compute
    // (split(" ", -1) semantics: empty tokens kept, #tokens = #spaces + 1).
    val bytes = text.getBytes
    var m = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') m += 1; i += 1 }
    val tokStart = new Array[Int](m)
    val tokEnd = new Array[Int](m)
    var t = 0
    var s = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        tokStart(t) = s; tokEnd(t) = i; t += 1; s = i + 1
      }
      i += 1
    }
    val md = H60Array.digest.get()
    val d16 = H60Array.buf16.get()
    // ---- distinct tokens: open-addressing set keyed on full md5 (2 longs)
    val capT = tableCap(m)
    val maskT = capT - 1
    val tLo = new Array[Long](capT)
    val tHi = new Array[Long](capT)
    val tUsed = new Array[Boolean](capT)
    var nDistinctTok = 0
    i = 0
    while (i < m) {
      md.reset()
      md.update(bytes, tokStart(i), tokEnd(i) - tokStart(i))
      md.digest(d16, 0, 16)
      var kl = 0L; var kh = 0L; var j = 0
      while (j < 8) {
        kl = (kl << 8) | (d16(j) & 0xffL)
        kh = (kh << 8) | (d16(j + 8) & 0xffL)
        j += 1
      }
      var idx = kl.toInt & maskT // md5 is uniform — no remix needed
      var done = false
      while (!done) {
        if (!tUsed(idx)) {
          tUsed(idx) = true; tLo(idx) = kl; tHi(idx) = kh
          nDistinctTok += 1; done = true
        } else if (tLo(idx) == kl && tHi(idx) == kh) done = true
        else idx = (idx + 1) & maskT
      }
      i += 1
    }
    // ---- 2-gram counts: open-addressing map (count == 0 marks empty).
    // Adjacent tokens are separated by exactly one space, so each 2-gram
    // is one contiguous byte slice; g clips to 1 for single-token docs
    // (slice(toks, 1, 2) = the lone token), mirroring the composed form.
    val g = math.max(m - 1, 1)
    val capG = tableCap(g)
    val maskG = capG - 1
    val gLo = new Array[Long](capG)
    val gHi = new Array[Long](capG)
    val gCnt = new Array[Int](capG)
    var nDistinctG2 = 0
    var maxCnt = 0
    i = 0
    while (i < g) {
      val last = math.min(i + 1, m - 1)
      md.reset()
      md.update(bytes, tokStart(i), tokEnd(last) - tokStart(i))
      md.digest(d16, 0, 16)
      var kl = 0L; var kh = 0L; var j = 0
      while (j < 8) {
        kl = (kl << 8) | (d16(j) & 0xffL)
        kh = (kh << 8) | (d16(j + 8) & 0xffL)
        j += 1
      }
      var idx = kl.toInt & maskG
      var done = false
      while (!done) {
        if (gCnt(idx) == 0) {
          gLo(idx) = kl; gHi(idx) = kh; gCnt(idx) = 1
          nDistinctG2 += 1
          if (maxCnt < 1) maxCnt = 1
          done = true
        } else if (gLo(idx) == kl && gHi(idx) == kh) {
          gCnt(idx) += 1
          if (gCnt(idx) > maxCnt) maxCnt = gCnt(idx)
          done = true
        } else idx = (idx + 1) & maskG
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](m, nDistinctTok, g, nDistinctG2, maxCnt))
  }
}

/** One-pass 32-bit SimHash kernel: per input hash, every bit votes ±1
  * (weighted by multiplicity — the input is NOT deduped); bit j of the
  * output is set when its vote sum is positive. Replaces 32 separate
  * interpreted `aggregate(hs, 0L, (acc, h) -> acc ± 1)` higher-order
  * passes over the same array — one traversal, no lambdas, inside
  * whole-stage codegen. Bit-identical to the composed form the DuckDB
  * oracle replicates: a null element votes −1 on every bit (CASE WHEN
  * null THEN … ELSE -1), and an empty array yields 0. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects array<long>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash32.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
  override def prettyName: String = "simhash32"
}

object SimHash32 {
  def compute(hs: ArrayData): Long = SimHashVotes.compute(hs, 32)
}

/** The shared vote tally behind [[SimHash32]] and [[SimHash60]]. */
private[functions] object SimHashVotes {
  def compute(hs: ArrayData, bits: Int): Long = {
    val n = hs.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) {
        var j = 0
        while (j < bits) { votes(j) -= 1; j += 1 }
      } else {
        val h = hs.getLong(i)
        var j = 0
        while (j < bits) {
          votes(j) += (((h >>> j) & 1L).toInt << 1) - 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }
}

/** 60-bit SimHash — [[SimHash32]] widened to the full h60 hash width,
  * the scale knob the 32-bit demo's scaladoc names: with 15-bit bands
  * the hamming-LSH band join gets 4×32 768 buckets instead of 4×256,
  * cutting the candidate fan-in ~128× for a 100 TB corpus. Same vote
  * semantics (null element votes −1 everywhere, empty array → 0), same
  * one-pass codegen shape. */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects array<long>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
  override def prettyName: String = "simhash60"
}

object SimHash60 {
  def compute(hs: ArrayData): Long = SimHashVotes.compute(hs, 60)
}

case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<long>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  import MinHashFamily.{A, B, NumPerms, P}

  /** All permutation minima in one pass; null elements of `hs` are
    * skipped and an empty/all-null input yields all-null minima — exactly
    * `array_min(transform(hs, x -> (a*x + b) % P))` per permutation. */
  def compute(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    val mins = new Array[Long](NumPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        seen = true
        val x = hs.getLong(i)
        var j = 0
        while (j < NumPerms) {
          val h = (A(j) * x + B(j)) % P
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (!seen) new GenericArrayData(new Array[Any](NumPerms)) // all null
    else new GenericArrayData(mins)
  }
}

object TextHash {
  private def unary(name: String, cls: Class[_], mk: Expression => Expression) = {
    val builder = (children: Seq[Expression]) => {
      require(children.length == 1, s"$name takes exactly 1 argument")
      mk(children.head)
    }
    (new FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), builder)
  }

  /** shingle_h60(text, n) / shingle_h60p(text, n): the n argument must be
    * a positive integral COMPILE-TIME CONSTANT (any foldable expression —
    * a literal of any integral width, `2+1`, a cast — is evaluated here
    * and baked into the generated code). */
  private def shingle(name: String, modP: Boolean) = {
    val builder = (children: Seq[Expression]) => {
      require(children.length == 2, s"$name takes exactly 2 arguments")
      val ne = children(1)
      if (!ne.foldable) throw new IllegalArgumentException(
        s"$name: n must be a constant (foldable) expression, got $ne")
      val n: Long = ne.eval(null) match {
        case i: Int => i.toLong
        case l: Long => l
        case sh: Short => sh.toLong
        case b: Byte => b.toLong
        case other => throw new IllegalArgumentException(
          s"$name: n must be an integral constant, got $other")
      }
      if (n <= 0 || n > Int.MaxValue) throw new IllegalArgumentException(
        s"$name: n must be a positive int, got $n")
      ShingleH60(children.head, n.toInt, modP)
    }
    (new FunctionIdentifier(name),
      new ExpressionInfo(classOf[ShingleH60].getName, name), builder)
  }

  private def all = Seq(
    unary("h60_array", classOf[H60Array], H60Array(_)),
    unary("minhash_sig", classOf[MinHashSig], MinHashSig(_)),
    unary("repetition_stats", classOf[RepetitionStats], RepetitionStats(_)),
    unary("simhash32", classOf[SimHash32], SimHash32(_)),
    unary("simhash60", classOf[SimHash60], SimHash60(_)),
    unary("bpe_count", classOf[BpeCount], BpeCount(_)),
    unary("bpe_encode", classOf[BpeEncode], BpeEncode(_)),
    shingle("shingle_h60", modP = false),
    shingle("shingle_h60p", modP = true))

  /** Register the kernels with a session builder's extensions. */
  def install(ext: SparkSessionExtensions): Unit =
    all.foreach(ext.injectFunction)

  /** Idempotent per-session registration (sessions not built through
    * [[graft.Session.build]]). */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (id, info, b) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, b)
    }
}
