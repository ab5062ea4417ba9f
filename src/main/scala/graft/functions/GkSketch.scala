package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.aggregate.ApproximatePercentile.PercentileDigest
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Greenwald-Khanna quantile-summary STATE aggregate — wraps the exact
 * digest `approx_percentile` itself uses (ApproximatePercentile's
 * PercentileDigest over catalyst's QuantileSummaries, same
 * compress-threshold and relative-error parameters, same serializer
 * for the shuffle) but evals the full compressed summary —
 * (count, values, g, delta) — instead of only extracted percentiles.
 *
 * Why: GK summaries are deterministic per-buffer but the cross-
 * partition MERGE ORDER is not, so two independent aggregations can
 * disagree — scalar-vs-scalar comparison is run-nondeterministic
 * (the same wall as randomized KLL compaction). Exposing the state
 * lets a gate run the aggregation ONCE, pin the state, derive the
 * emitted percentiles from that same state with the library's own
 * query arithmetic, and hand the state to a replay oracle
 * (graft.queries.GkReplay) — the builtHnswGraphsOf pattern.
 *
 * On a single partition (no merge) the resulting digest is identical
 * to approx_percentile's — spec-asserted (RelationalQueriesSpec).
 *
 * Reference shape: the reference's host engine ships approx_quantile
 * (t-digest); graft's bounded-memory percentile tier is the GK
 * summary Spark standardizes on, here with its state made auditable.
 */
case class GkStateAgg(
    child: Expression,
    accuracy: Int = 1000,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PercentileDigest] {

  require(accuracy > 0, s"accuracy must be positive, got $accuracy")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = GkStateAgg.Schema
  override def prettyName: String = "gk_state_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"gk_state_agg needs DOUBLE, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): PercentileDigest =
    new PercentileDigest(1.0 / accuracy)

  override def update(buffer: PercentileDigest, input: InternalRow): PercentileDigest = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: PercentileDigest, other: PercentileDigest): PercentileDigest = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: PercentileDigest): Any = {
    val s = buffer.quantileSummaries // compresses if needed
    val st = s.sampled
    new GenericInternalRow(Array[Any](
      s.count,
      new GenericArrayData(st.map(_.value)),
      new GenericArrayData(st.map(_.g)),
      new GenericArrayData(st.map(_.delta))))
  }

  override def serialize(buffer: PercentileDigest): Array[Byte] =
    ApproximatePercentile.serializer.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): PercentileDigest =
    ApproximatePercentile.serializer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): GkStateAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GkStateAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object GkStateAgg {
  /** compressed summary state: digest count + parallel sampled arrays */
  val Schema: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("value", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("g", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("delta", ArrayType(LongType, containsNull = false), nullable = false)))
}

/** Column DSL for the GK state aggregate. */
object gk {
  def stateAgg(values: Column, accuracy: Int = 1000): Column =
    GraftBridge.column(
      GkStateAgg(GraftBridge.expression(values), accuracy).toAggregateExpression())
}
