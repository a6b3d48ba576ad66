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

  /** First 60 bits of md5(s). */
  def h60(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    fold60(md.digest(bytes))
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
    val count = math.max(m - n + 1, 1) // short docs yield one clipped shingle
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val md = H60Array.digest.get()
    i = 0
    while (i < count) {
      md.reset()
      val last = math.min(i + n, m) - 1
      md.update(bytes, tokStart(i), tokEnd(last) - tokStart(i))
      var v = H60Array.fold60(md.digest())
      if (modP) v = v % MinHashFamily.P
      seen.add(v)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }
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
    * a positive integer literal — it's baked into the generated code. */
  private def shingle(name: String, modP: Boolean) = {
    val builder = (children: Seq[Expression]) => {
      require(children.length == 2, s"$name takes exactly 2 arguments")
      val n = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType)
          if v > 0 => v
        case other => throw new IllegalArgumentException(
          s"$name: n must be a positive integer literal, got $other")
      }
      ShingleH60(children.head, n, modP)
    }
    (new FunctionIdentifier(name),
      new ExpressionInfo(classOf[ShingleH60].getName, name), builder)
  }

  private def all = Seq(
    unary("h60_array", classOf[H60Array], H60Array(_)),
    unary("minhash_sig", classOf[MinHashSig], MinHashSig(_)),
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
