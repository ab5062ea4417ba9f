package graft.index

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Graph-accelerated coarse quantizer: the `IVF<n>_HNSW<m>` factory's
 * assignment step (FAISS composition, cf. duckdb-faiss-ext
 * faiss_extension.cpp:155 delegating to faiss::index_factory). At
 * nlist ≳ 10^5 a flat argmin over the centroid table is itself a
 * full scan per vector — the HNSW walk over the (bounded, driver-built)
 * centroid graph makes assignment O(log nlist) probes instead. The
 * graph rides along with the serialized plan to every executor exactly
 * like the flat centroid matrix does in [[NearestCentroids]].
 *
 * Assignment is approximate by construction (same as FAISS's
 * IVF_HNSW): a vector may land in the second-nearest list. Search
 * correctness is unaffected at exhaustive probe — every vector lives
 * in exactly one list and all lists are scanned — which is what the
 * `knn_ivf_hnsw_exh` exact gate pins.
 */
case class HnswNearestCentroids(
    child: Expression,
    graph: Nsw.Graph,
    nprobe: Int,
    efSearch: Int,
    metric: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hnsw_nearest_centroids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hnsw_nearest_centroids needs array<float>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HnswNearestCentroids.nearest(input.asInstanceOf[ArrayData], graph, nprobe, efSearch, metric)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = ctx.addReferenceObj("coarseGraph", graph, classOf[Nsw.Graph].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.index.HnswNearestCentroids.nearest($c, $g, $nprobe, $efSearch, $metric);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HnswNearestCentroids {

  /** static entry shared by interpreted eval and generated code (same
    * forwarder convention as [[NearestCentroids.nearest]]). NaN parity
    * with the flat quantizer: a vector with any NaN component has NaN
    * distance to every centroid there and probes nothing — here it
    * skips the walk entirely (graph comparisons are NaN-unsafe). */
  def nearest(v: ArrayData, graph: Nsw.Graph, nprobe: Int, efSearch: Int, metric: Int): ArrayData = {
    val dim = v.numElements()
    val q = new Array[Float](dim)
    var i = 0
    var hasNaN = false
    while (i < dim) {
      val f = v.getFloat(i)
      if (java.lang.Float.isNaN(f)) hasNaN = true
      q(i) = f
      i += 1
    }
    if (hasNaN || graph.labels.isEmpty) new GenericArrayData(Array.emptyIntArray)
    else new GenericArrayData(
      Nsw.search(graph, q, nprobe, math.max(efSearch, nprobe), metric).map(_._2.toInt))
  }
}
