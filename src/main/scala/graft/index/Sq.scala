package graft.index

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Scalar quantization (FAISS `SQ8`, cf. duckdb-faiss-ext README: the
 * factory string goes straight to index_factory): each dimension maps
 * to one uint8 code via per-dim [min, max] trained bounds — a 4x
 * compression with far better fidelity than PQ, the usual first step
 * before vectors at 100 TB. Asymmetric search decodes per-element
 * inside the distance loop (no materialized decode column).
 */
object Sq {

  /** per-dim (vmin, vdiff) from a training sample; degenerate dims get
    * vdiff=0 and always encode/decode to the midpoint vmin */
  def train(samples: Array[Array[Float]]): (Array[Float], Array[Float]) = {
    require(samples.nonEmpty, "SQ training needs a non-empty sample")
    val dim = samples(0).length
    val mn = Array.fill(dim)(Float.MaxValue)
    val mx = Array.fill(dim)(Float.MinValue)
    var p = 0
    while (p < samples.length) {
      val v = samples(p)
      var i = 0
      while (i < dim) {
        val x = v(i)
        if (!x.isNaN) {
          if (x < mn(i)) mn(i) = x
          if (x > mx(i)) mx(i) = x
        }
        i += 1
      }
      p += 1
    }
    val diff = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      if (mn(i) > mx(i)) { mn(i) = 0f; mx(i) = 0f } // all-NaN dim
      diff(i) = mx(i) - mn(i)
      i += 1
    }
    (mn, diff)
  }

  def encodeOne(v: ArrayData, vmin: Array[Float], vdiff: Array[Float]): Array[Byte] = {
    val dim = vmin.length
    val out = new Array[Byte](dim)
    var i = 0
    while (i < dim) {
      val x = v.getFloat(i)
      val c =
        if (vdiff(i) <= 0f || x.isNaN) 0
        else {
          val t = (x - vmin(i)) / vdiff(i) * 255f + 0.5f
          if (t <= 0f) 0 else if (t >= 255f) 255 else t.toInt
        }
      out(i) = c.toByte
      i += 1
    }
    out
  }

  /** asymmetric L2^2: query float vs decoded code, fused loop */
  def l2Distance(code: Array[Byte], q: Array[Float], vmin: Array[Float], vdiff: Array[Float]): Double = {
    var d = 0.0
    var i = 0
    while (i < code.length) {
      val decoded = vmin(i) + (code(i) & 0xff).toFloat / 255f * vdiff(i)
      val t = q(i).toDouble - decoded
      d += t * t
      i += 1
    }
    d
  }
}

/** encode an array<float> vector to per-dim uint8 codes */
case class SqEncode(child: Expression, vmin: Array[Float], vdiff: Array[Float])
    extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"sq_encode needs array<float>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Sq.encodeOne(input.asInstanceOf[ArrayData], vmin, vdiff)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** asymmetric SQ distance: (code binary, qid bigint) -> L2^2 against
  * the plan-embedded query batch (same contract as PqAdcDistance) */
case class SqL2Distance(
    left: Expression, right: Expression,
    queries: Map[Long, Array[Float]], vmin: Array[Float], vdiff: Array[Float])
    extends BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_l2_distance"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sq_l2_distance needs (binary, bigint), got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(code: Any, qid: Any): Any =
    Sq.l2Distance(code.asInstanceOf[Array[Byte]], queries(qid.asInstanceOf[Long]), vmin, vdiff)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
