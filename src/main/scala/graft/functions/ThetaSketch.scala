package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Union}
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types._

/**
 * Theta-sketch set algebra over the Datasketches library Spark already
 * ships for its HLL functions. Where HLL only supports union, theta
 * sketches close the full algebra — union, intersection, difference —
 * so "users who did A but NOT B" over 100 TB of events is sketch math
 * on KB-sized summaries instead of an anti-join of raw id sets.
 * Sketches are mergeable (map-side partial aggregation works) and, in
 * exact mode (distinct count below the nominal-entries threshold,
 * default 4096), estimates are EXACT — set differences of daily active
 * user sets gate against an exact DuckDB oracle at test scale.
 */

/** Aggregate raw BIGINT values into a compact theta sketch (binary). */
case class ThetaSketchAgg(
    child: Expression,
    lgNomEntries: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  require(lgNomEntries >= 4 && lgNomEntries <= 26,
    s"lgNomEntries must be in [4, 26], got $lgNomEntries")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"theta_sketch_agg needs BIGINT, got ${t.catalogString}")
  }

  // Union works as both the build and merge buffer: update(long) feeds
  // raw values, union(Memory) folds serialized partials
  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgNomEntries).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Union serialized theta sketches (binary) — the re-aggregation path:
  * fine-grain sketches persist once, every coarser rollup merges them
  * without rescanning raw data. */
case class ThetaUnionAgg(
    child: Expression,
    lgNomEntries: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_union_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"theta_union_agg needs BINARY, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgNomEntries).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Distinct-count estimate of a serialized theta sketch. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"theta_estimate needs BINARY, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Sketch.wrap(Memory.wrap(input.asInstanceOf[Array[Byte]])).getEstimate

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Set difference A \ B of two serialized theta sketches. */
case class ThetaANotB(left: Expression, right: Expression)
    extends BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_a_not_b"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"theta_a_not_b needs (BINARY, BINARY), got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildANotB().aNotB(
      Sketch.wrap(Memory.wrap(a.asInstanceOf[Array[Byte]])),
      Sketch.wrap(Memory.wrap(b.asInstanceOf[Array[Byte]]))).toByteArray

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Set intersection of two serialized theta sketches. */
case class ThetaIntersect(left: Expression, right: Expression)
    extends BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_intersect"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"theta_intersect needs (BINARY, BINARY), got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val inter = SetOperation.builder().buildIntersection()
    inter.intersect(Sketch.wrap(Memory.wrap(a.asInstanceOf[Array[Byte]])))
    inter.intersect(Sketch.wrap(Memory.wrap(b.asInstanceOf[Array[Byte]])))
    inter.getResult.toByteArray
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column DSL for the theta-sketch family. */
object theta {
  private def col(e: Expression): Column = GraftBridge.column(e)
  private def ex(c: Column): Expression = GraftBridge.expression(c)

  def sketchAgg(values: Column, lgNomEntries: Int = 12): Column =
    col(ThetaSketchAgg(ex(values), lgNomEntries).toAggregateExpression())
  def unionAgg(sketches: Column, lgNomEntries: Int = 12): Column =
    col(ThetaUnionAgg(ex(sketches), lgNomEntries).toAggregateExpression())
  def estimate(sketch: Column): Column = col(ThetaEstimate(ex(sketch)))
  def aNotB(a: Column, b: Column): Column = col(ThetaANotB(ex(a), ex(b)))
  def intersect(a: Column, b: Column): Column = col(ThetaIntersect(ex(a), ex(b)))
}
