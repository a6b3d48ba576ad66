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
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s): 15 hex digits == first 7.5 bytes. */
  def h60(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    // big-endian first 8 bytes, then drop the low nibble (16th hex digit)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
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
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def compute(text: org.apache.spark.unsafe.types.UTF8String, n: Int,
              modP: Boolean): ArrayData = {
    // split(text, ' ') semantics: literal single-space separator, empty
    // tokens (incl. trailing) kept — java's split(regex, -1) matches.
    val toks = text.toString.split(" ", -1)
    val m = toks.length
    val tokBytes = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      tokBytes(i) = toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    val count = math.max(m - n + 1, 1) // short docs yield one clipped shingle
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val md = digest.get()
    i = 0
    while (i < count) {
      md.reset()
      val end = math.min(i + n, m)
      var k = i
      while (k < end) {
        if (k > i) md.update(' '.toByte)
        md.update(tokBytes(k))
        k += 1
      }
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      v = v >>> 4 // first 60 bits = 15 hex digits, as h60_array
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
