package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/**
 * Native Catalyst distance expression: one fused loop over two
 * `array<float>` columns, codegen'd via a static call into
 * [[VectorMath]] — no UDF boxing, stays inside WholeStageCodegen.
 *
 * Spark-first replacement for the reference's per-query FAISS distance
 * computations (duckdb-faiss-ext README metric table).
 */
case class VectorDistance(left: Expression, right: Expression, metric: Int, p: Double)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = s"vec_dist_$metric"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dist(
      metric,
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorMath.dist($metric, $a, $b, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * |A ∩ B| of two sorted array<bigint> columns (linear merge, codegen'd).
 * The workhorse of set-similarity joins: shingle sets are hashed,
 * sorted once per document, then every candidate pair costs O(|A|+|B|)
 * comparisons with zero allocation.
 */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.sortedIntersectCount(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorMath.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** unit-normalize an array<float> vector in one fused pass (codegen'd) */
case class VectorNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "vec_normalize"

  override protected def nullSafeEval(input: Any): Any =
    VectorMath.normalize(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorMath.normalize($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * 1-bit binary quantization: sign bits of the first ≤64 dims packed
 * into one bigint (codegen'd). Hamming search then runs on
 * `bit_count(bits ^ bits)` — 32x less data scanned than float32, the
 * memory-bounded coarse pass of a binarize-then-rerank pipeline.
 */
case class SignBits(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "vec_sign_bits"

  override protected def nullSafeEval(input: Any): Any =
    VectorMath.signBits(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorMath.signBits($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column DSL for the vector functions. */
object vec {
  import org.apache.spark.sql.functions.sqrt

  private def col(e: Expression): Column = GraftBridge.column(e)
  private def ex(c: Column): Expression = GraftBridge.expression(c)

  /** cast any numeric array column to array<float> (our canonical vector type) */
  def vector(c: Column): Column = c.cast(ArrayType(FloatType))

  def dist(metric: String, a: Column, b: Column, p: Double = 3.0): Column =
    col(VectorDistance(ex(a), ex(b), VectorMath.metricId(metric), p))

  def l2sq(a: Column, b: Column): Column = dist("l2sq", a, b)
  def l2(a: Column, b: Column): Column = dist("euclidean", a, b)
  def ip(a: Column, b: Column): Column = dist("ip", a, b)
  def cosineDist(a: Column, b: Column): Column = dist("cosine", a, b)
  def l1(a: Column, b: Column): Column = dist("l1", a, b)
  def linf(a: Column, b: Column): Column = dist("linf", a, b)
  def lp(a: Column, b: Column, p: Double): Column = dist("lp", a, b, p)
  def canberra(a: Column, b: Column): Column = dist("canberra", a, b)
  def braycurtis(a: Column, b: Column): Column = dist("braycurtis", a, b)
  def jensenshannon(a: Column, b: Column): Column = dist("jensenshannon", a, b)
  def jaccard(a: Column, b: Column): Column = dist("jaccard", a, b)

  /** L2 norm of a vector (self inner product, rooted) */
  def norm(a: Column): Column = sqrt(dist("ip", a, a))

  /** unit-normalize a vector in one fused pass (zero vectors unchanged) */
  def normalize(a: Column): Column = col(VectorNormalize(ex(a)))

  /** sign-bit binary quantization (≤64 dims -> one bigint) */
  def signBits(a: Column): Column = col(SignBits(ex(a)))

  /** |A ∩ B| over sorted array<bigint> columns; see [[SortedIntersectCount]] */
  def sortedIntersectCount(a: Column, b: Column): Column =
    col(SortedIntersectCount(ex(a), ex(b)))

  /** bounded-heap top-k aggregate; see [[TopKByDistance]] */
  def topk(k: Int, distance: Column, label: Column, ascending: Boolean = true,
      padToK: Boolean = false): Column =
    col(TopKByDistance(ex(distance), ex(label), k, ascending, padToK).toAggregateExpression())
}
