package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types._

/** `dot_f32(a, b)` — dot product of two `array<float>` columns, accumulated
  * left-to-right in double (each float widened exactly), as a native
  * Catalyst expression with whole-stage codegen.
  *
  * Why custom: the similarity operators (cosine top-k, IVF ANN, embedding
  * near-dup) evaluate this kernel once per (row, query/centroid) pair —
  * the single hottest scalar in the engine at 100 TB. The built-in
  * composition `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,v) ->
  * acc+v)` is semantically identical but evaluates interpreted lambdas
  * per element and allocates an intermediate array per row; higher-order
  * functions are excluded from whole-stage codegen, so they also break the
  * surrounding codegen stage in two. This expression generates a tight
  * primitive loop inline in the stage (`doGenCode`), keeping the scan →
  * score → TakeOrdered pipeline in one codegen'd stage.
  *
  * Semantics match the built-in composition bit-for-bit: same pairing
  * order, same float→double widening, same accumulation order — so the
  * DuckDB oracles (`list_dot_product` at double precision) stay valid.
  * Null array, arrays of different lengths (zip_with would null-pad and
  * poison the sum), or a null ELEMENT in either array (x*null = null,
  * acc+null = null in the composition) all yield null.
  *
  * Registered as a SQL function through [[SparkSessionExtensions]]
  * ([[DotF32.install]]) — the extension-point route, not a UDF: no row
  * boxing, no closure serialization, full codegen.
  */
case class DotF32(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"dot_f32 expects (array<float>, array<float>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                newRight: Expression): DotF32 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_f32"
}

object DotF32 {
  private val builder = (children: Seq[Expression]) => {
    require(children.length == 2, "dot_f32 takes exactly 2 arguments")
    DotF32(children.head, children(1))
  }

  /** Register `dot_f32` with a session builder's extensions. */
  def install(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((new FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotF32].getName, "dot_f32"), builder))

  /** Idempotent per-session registration, for sessions not built through
    * [[graft.Session.build]] (e.g. an embedding application's own session). */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotF32].getName, "dot_f32"), builder)
}
