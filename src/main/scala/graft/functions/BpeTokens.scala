package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_count(text) -> bigint`: deterministic byte-pair-encoding token
  * count over a FIXED, rank-ordered merge table — the real unit every
  * training-data budget is denominated in, replacing the whitespace
  * stand-in (VERDICT r8 #6). Same kernel discipline as the
  * [[TextHash]] family: one native pass per document, null-safe,
  * `doGenCode` keeps it inside whole-stage codegen.
  *
  * Algorithm: split on single spaces; per word, split to code-point
  * symbols, then for each merge rank IN ORDER run ONE left-to-right
  * non-overlapping pass replacing adjacent (a, b) with the concatenated
  * symbol; the document's count is the summed final symbol counts
  * (spaces are separators, not tokens; consecutive spaces contribute
  * nothing). Because the table is WELL-FORMED — every merge's inputs
  * are single characters or outputs of strictly earlier merges — a
  * single pass per rank is exactly the classic exhaustive BPE encode:
  * a merge output `ab` can never recreate its own pair (`ab` ≠ `a`,
  * `ab` ≠ `b`) nor an earlier rank's pair, so nothing is left for a
  * re-scan to find.
  *
  * That single-pass form is what makes the DuckDB oracle exact: encode
  * each character as `[c]` and fold the merge table through
  * `replace(enc, '[a][b]', '[ab]')` — SQL `replace` is precisely a
  * left-to-right non-overlapping pass that resumes after each
  * replacement, matching the kernel's scan. The bracket encoding is
  * alignment-safe: merge patterns are letter-only, every unit is
  * `[` + symbol + `]`, and a pattern starting inside a unit dies on the
  * unit's closing bracket — so matches only ever align to unit
  * boundaries, even when the text itself contains `[` or `]`. */
case class BpeCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_count expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    BpeCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeCount.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
  override def prettyName: String = "bpe_count"
}

/** `bpe_encode(text) -> array<string>`: the token SEQUENCE the count
  * kernel summarizes — same merge table, same per-word single-pass-per-
  * rank fold ([[BpeCount]]), emitting the final symbols in document
  * order (spaces are separators and emit nothing). This is the form a
  * packing pipeline feeds a trainer: ids derive from the symbols via the
  * shared vocabulary ([[BpeCount.idCase]]). */
case class BpeEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    BpeCount.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeCount.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
  override def prettyName: String = "bpe_encode"
}

object BpeCount {
  /** Rank-ordered merges, WELL-FORMED by construction: each pair's parts
    * are single letters or the outputs of strictly earlier rows (th→the,
    * in→ing, an→and). The tiny fixed vocabulary is the demo discipline
    * ([[graft.operators.LlmQueries]] seedCentroids); production swaps in
    * a learned table of thousands — the kernel and the oracle builder
    * iterate this list, so they can never disagree on its contents. */
  val Merges: IndexedSeq[(String, String)] = IndexedSeq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "r" -> "e", "in" -> "g", "o" -> "r",
    "e" -> "n", "a" -> "t", "e" -> "s", "o" -> "u", "l" -> "l",
    "s" -> "t")

  /** Split `text[w, i)` to code-point symbols and fold the merge table —
    * the single-pass-per-rank encode both kernels share. */
  private def mergeWord(text: String, w: Int, i: Int,
      syms: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    syms.clear()
    var j = w
    while (j < i) {
      val cp = text.codePointAt(j)
      val len = Character.charCount(cp)
      syms += text.substring(j, j + len)
      j += len
    }
    var m = 0
    while (m < Merges.length) {
      val a = Merges(m)._1
      val b = Merges(m)._2
      var k = 0
      while (k < syms.length - 1) {
        if (syms(k) == a && syms(k + 1) == b) {
          syms(k) = a + b
          syms.remove(k + 1)
        }
        k += 1
      }
      m += 1
    }
  }

  def compute(s: UTF8String): Long = {
    val text = s.toString
    val n = text.length
    var total = 0L
    val syms = new scala.collection.mutable.ArrayBuffer[String](32)
    var w = 0
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > w) {
          mergeWord(text, w, i, syms)
          total += syms.length
        }
        w = i + 1
      }
      i += 1
    }
    total
  }

  /** [[BpeEncode]]'s kernel: the final symbols in document order. */
  def encode(s: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val text = s.toString
    val n = text.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](32)
    val syms = new scala.collection.mutable.ArrayBuffer[String](32)
    var w = 0
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > w) {
          mergeWord(text, w, i, syms)
          syms.foreach(t => out += UTF8String.fromString(t))
        }
        w = i + 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** The shared token-id vocabulary as a CASE expression: merge outputs
    * get their rank as the id (0..15), unmerged symbols (always single
    * code points — anything longer is a merge output) get
    * 1000 + codepoint. `uniFn` is the engine's first-codepoint function
    * (`ascii` in Spark, `unicode` in DuckDB); everything else is common
    * SQL, so the two engines' vocabularies can never drift. */
  def idCase(tokCol: String, uniFn: String): String = {
    val arms = Merges.zipWithIndex
      .map { case ((a, b), m) => s"WHEN '$a$b' THEN $m" }
      .mkString(" ")
    s"(CASE $tokCol $arms ELSE 1000 + $uniFn($tokCol) END)"
  }

  /** The DuckDB replica of [[compute]] as a SQL expression over
    * `textCol`, generated FROM [[Merges]] so kernel and oracle share one
    * table: bracket-encode every character, fold the replace chain,
    * count units, subtract the space units. */
  /** The bracket-encoded, fully merged form of `textCol` (still
    * containing the `[ ]` space units) — the common core of the count
    * and encode oracles.
    *
    * Contract: the kernel/oracle parity holds for BMP text only. The
    * Scala kernel decomposes by CODE POINT (`codePointAt`), while this
    * replica slices DuckDB characters (`text[i:i]`, grapheme-aware in
    * some DuckDB versions) — for astral-plane characters (code points
    * above U+FFFF) the two unit decompositions can diverge, so the demo
    * vocabulary and the driver corpus are BMP-only by contract. The
    * kernel itself is well-defined on any input (every code point is a
    * unit); only the cross-engine parity is BMP-scoped. */
  def duckMerged(textCol: String): String = {
    val enc = s"coalesce(list_aggregate(list_transform(" +
      s"range(1, length($textCol) + 1), " +
      s"i -> '[' || $textCol[CAST(i AS int):CAST(i AS int)] || ']'), " +
      s"'string_agg', ''), '')"
    Merges.foldLeft(enc) { case (acc, (a, b)) =>
      s"replace($acc, '[$a][$b]', '[$a$b]')"
    }
  }

  def duckExpr(textCol: String): String = {
    val merged = duckMerged(textCol)
    s"(length($merged) - length(replace($merged, '[', '')) - " +
      s"(length($textCol) - length(replace($textCol, ' ', ''))))"
  }
}
