package graft.index

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.functions.{TopKHeap, VectorMath}

/**
 * argmin-n over a (small) centroid table embedded in the expression:
 * returns the `nprobe` nearest centroid ids for an array<float> vector.
 * The centroid matrix rides along with the serialized plan to every
 * executor — the Spark-native analog of FAISS's in-RAM coarse
 * quantizer (IVF probing, cf. duckdb-faiss-ext README index_factory
 * "IVFn,Flat").
 */
case class NearestCentroids(
    child: Expression,
    centroids: Array[Array[Float]],
    nprobe: Int,
    metric: Int)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nearest_centroids needs array<float>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val asc = VectorMath.smallerIsCloser(metric)
    val heap = new TopKHeap(math.min(nprobe, centroids.length), asc)
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      var d = 0.0
      metric match {
        case VectorMath.IP =>
          var i = 0
          while (i < dim) { d += v.getFloat(i).toDouble * cen(i); i += 1 }
        case _ => // coarse quantization probes by L2 for all other metrics
          var i = 0
          while (i < dim) { val t = v.getFloat(i).toDouble - cen(i); d += t * t; i += 1 }
      }
      heap.insert(d, c.toLong)
      c += 1
    }
    new GenericArrayData(heap.sorted.map(_._2.toInt))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
