package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * KLL quantile sketches (Karnin-Lang-Liberty, via the Datasketches
 * library Spark ships) — the REAGGREGATABLE percentile tier. The
 * custom t-digest answers a one-shot percentile query; KLL sketches
 * persist as KB-sized columns at fine grain (per day, per tenant) and
 * any coarser percentile rollup MERGES sketches instead of rescanning
 * raw values, with a proven normalized-rank-error bound (~1.65% at
 * k=200). Mergeable with map-side partials like the rest of the
 * sketch family.
 */

/** Aggregate DOUBLE values into a serialized KLL sketch (binary). */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"kll_sketch_agg needs DOUBLE, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(
      buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Merge serialized KLL sketches (binary) — the rollup path. */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"kll_merge_agg needs BINARY, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(
      buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Quantile estimates (INCLUSIVE search) from a serialized KLL sketch:
  * array<double>, one per requested rank; empty sketch → nulls. */
case class KllQuantiles(child: Expression, ranks: Seq[Double])
    extends UnaryExpression
    with CodegenFallback {

  require(ranks.nonEmpty && ranks.forall(r => r >= 0.0 && r <= 1.0),
    s"ranks must be in [0, 1], got $ranks")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "kll_quantiles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"kll_quantiles needs BINARY, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(input.asInstanceOf[Array[Byte]]))
    val out = new Array[Any](ranks.length)
    if (!sk.isEmpty) {
      var i = 0
      while (i < ranks.length) {
        out(i) = sk.getQuantile(ranks(i), QuantileSearchCriteria.INCLUSIVE)
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column DSL for the KLL quantile-sketch family. */
object kll {
  private def col(e: Expression): Column = GraftBridge.column(e)
  private def ex(c: Column): Expression = GraftBridge.expression(c)

  def sketchAgg(values: Column, k: Int = 200): Column =
    col(KllSketchAgg(ex(values), k).toAggregateExpression())
  def mergeAgg(sketches: Column, k: Int = 200): Column =
    col(KllMergeAgg(ex(sketches), k).toAggregateExpression())
  def quantiles(sketch: Column, ranks: Seq[Double]): Column =
    col(KllQuantiles(ex(sketch), ranks))
}
