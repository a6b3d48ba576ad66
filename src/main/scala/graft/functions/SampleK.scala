package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `sample_k(draw, payload, k)` — grouped deterministic bottom-k sampling
  * as a native Catalyst AGGREGATE function (a `TypedImperativeAggregate`):
  * per group, keep the `k` pairs with the lexicographically smallest
  * (draw, payload), return the payloads in that order as `array<bigint>`.
  *
  * With `draw` = a deterministic per-row hash (e.g. [[graft.operators
  * .CorpusOps.hashDraw]]) this IS reservoir sampling without rand():
  * the same k rows survive on every run, partitioning, and engine —
  * row_number-over-(draw, id) semantics, exactly `q_group_sample`'s
  * window form.
  *
  * Why an aggregate and not the window: semantics are identical, but the
  * aggregate's partial state is a k-BOUNDED buffer per (mapper, group) —
  * the map-side combine folds every partition-local row into ≤ k pairs
  * before anything shuffles, so the exchange carries |mappers|·|groups|·k
  * fixed-width pairs regardless of row count, and no per-group sort ever
  * runs. At 100 TB with a handful of strata that is the difference
  * between shuffling a corpus and shuffling kilobytes. (Spark's own
  * WindowGroupLimit gets close by pre-limiting mappers, but still plans
  * a per-partition sort and a window pass after the exchange.)
  *
  * Distribution-correctness: insertion order cannot matter — the buffer
  * keeps the k global minima under a total order, and `merge` is the
  * same fold over another buffer's survivors, so (update ∪ merge) is a
  * commutative-associative semilattice and any partitioning yields the
  * same k pairs (property-tested across layouts in SampleKSuite).
  * Null draw or payload rows are skipped. `k` must be a foldable
  * positive int ≤ 1e6 (the buffer is driver/executor heap).
  *
  * Buffers serialize as (n, then n little-struct pairs) through the
  * standard `TypedImperativeAggregate` binary path — that is what rides
  * the partial→final exchange.
  */
case class SampleK(
    drawExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  require(k > 0 && k <= 1000000, s"sample_k: need 0 < k <= 1e6, got $k")

  private val ord = Ordering.Tuple2[Long, Long]

  override def children: Seq[Expression] = Seq(drawExpr, payloadExpr)
  override def checkInputDataTypes(): TypeCheckResult =
    if (drawExpr.dataType == LongType && payloadExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sample_k expects (bigint, bigint), got " +
        s"(${drawExpr.dataType.simpleString}, ${payloadExpr.dataType.simpleString})")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  // max-heap under (draw, payload): head = the worst kept pair, evicted
  // first when a smaller one arrives
  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)](ord)

  private def add(buf: mutable.PriorityQueue[(Long, Long)],
      p: (Long, Long)): Unit =
    if (buf.size < k) buf.enqueue(p)
    else if (ord.lt(p, buf.head)) { buf.dequeue(); buf.enqueue(p) }

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val d = drawExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (d != null && p != null)
      add(buf, (d.asInstanceOf[Long], p.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Long)],
      other: mutable.PriorityQueue[(Long, Long)])
      : mutable.PriorityQueue[(Long, Long)] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any =
    new GenericArrayData(buf.toArray.sorted(ord).map(_._2))

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buf.size * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (d, p) => out.writeLong(d); out.writeLong(p) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SampleK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SampleK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(drawExpr = newChildren(0), payloadExpr = newChildren(1))
  override def prettyName: String = "sample_k"
}

object SampleK {
  private val builder = (children: Seq[Expression]) => {
    require(children.length == 3,
      "sample_k takes exactly 3 arguments: draw, payload, k")
    val ke = children(2)
    require(ke.foldable, s"sample_k: k must be a constant, got $ke")
    val k: Long = ke.eval(null) match {
      case i: Int => i.toLong
      case l: Long => l
      case sh: Short => sh.toLong
      case b: Byte => b.toLong
      case other => throw new IllegalArgumentException(
        s"sample_k: k must be an integral constant, got $other")
    }
    // Bounds-check the Long BEFORE narrowing: a literal like 4294967297L
    // would wrap to 1 under toInt and silently under-sample.
    require(k > 0L && k <= 1000000L,
      s"sample_k: k must be in (0, 1000000], got $k")
    SampleK(children.head, children(1), k.toInt)
  }

  /** Register `sample_k` with a session builder's extensions. */
  def install(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((new FunctionIdentifier("sample_k"),
      new ExpressionInfo(classOf[SampleK].getName, "sample_k"), builder))

  /** Idempotent per-session registration, for sessions not built through
    * [[graft.Session.build]]. */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("sample_k"),
      new ExpressionInfo(classOf[SampleK].getName, "sample_k"), builder)
}
