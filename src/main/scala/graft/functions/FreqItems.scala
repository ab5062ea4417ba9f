package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Frequent-items (heavy hitters) sketch over term arrays — the
 * bounded-memory path to "top phrases over 100 TB of text". The exact
 * formulation explodes every term occurrence into a corpus-wide
 * count shuffle; here each partition folds its terms into a fixed-size
 * Misra-Gries style map (Datasketches ItemsSketch) and only KB-sized
 * sketches merge. Guarantees: estimates are within getMaximumError()
 * of truth, and while no purge has occurred (distinct terms below
 * ~0.75 x maxMapSize, preserved under merge) the error is ZERO — so a
 * right-sized sketch gates against an exact oracle while keeping the
 * bounded-memory plan shape of the approximate one.
 */

/** Aggregate arrays of terms into a serialized frequent-items sketch;
  * each element counts once per occurrence (multiset semantics). */
case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int = 65536,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"maxMapSize must be a power of 2 >= 8, got $maxMapSize")

  @transient private lazy val serde = new ArrayOfStringsSerDe()

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "freq_items_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"freq_items_agg needs array<string>, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) buffer.update(arr.getUTF8String(i).toString)
        i += 1
      }
    }
    buffer
  }

  override def merge(
      buffer: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] =
    buffer.merge(other)

  override def eval(buffer: ItemsSketch[String]): Any = buffer.toByteArray(serde)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] = buffer.toByteArray(serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/**
 * Top-k heavy hitters from a serialized frequent-items sketch:
 * array<struct<term, n, max_err>> sorted by (n DESC, term). Uses
 * NO_FALSE_POSITIVES, so every returned term's true count is >= its
 * reported lower bound; with max_err = 0 the counts are exact.
 */
case class FreqItemsTopK(child: Expression, k: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(k > 0, "k must be positive")

  override def dataType: DataType = FreqItemsTopK.resultType
  override def prettyName: String = "freq_items_topk"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"freq_items_topk needs BINARY, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val sk = ItemsSketch.getInstance(
      Memory.wrap(input.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe())
    val err = sk.getMaximumError
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_POSITIVES)
      .map(r => (r.getItem, r.getEstimate))
      .sortBy { case (term, est) => (-est, term) }
      .take(k)
      .map { case (term, est) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(term), est, err))
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FreqItemsTopK {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("max_err", LongType, nullable = false))),
    containsNull = false)
}

/** Column DSL for the frequent-items family. */
object freqitems {
  private def col(e: Expression): Column = GraftBridge.column(e)
  private def ex(c: Column): Expression = GraftBridge.expression(c)

  def agg(terms: Column, maxMapSize: Int = 65536): Column =
    col(FreqItemsAgg(ex(terms), maxMapSize).toAggregateExpression())
  def topK(sketch: Column, k: Int): Column = col(FreqItemsTopK(ex(sketch), k))
}
