package graft.search

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.functions._

import graft.functions.{vec, VectorMath}
import graft.index.{KMeansTrainer, NearestCentroids}

/**
 * Distributed approximate k-NN JOIN: every left row finds its top-k
 * right rows WITHOUT collecting either side to the driver — the 100 TB
 * complement to IndexCatalog.search (which, like a FAISS query batch,
 * collects a bounded query set).
 *
 * Plan: train a coarse quantizer on a bounded right-side sample; both
 * sides shuffle ONCE on their assigned list ids (right rows to 1 list,
 * left rows to their nprobe nearest lists); the equi-join on list_id
 * co-partitions candidates, a fused codegen distance scores them, and
 * the map-side top-k heap bounds the final shuffle to
 * partitions x |left| x k rows. Hot lists are AQE skew-join territory;
 * recall follows the usual IVF nprobe/nlist tradeoff.
 */
object AnnJoin {

  def ivfJoin(
      left: DataFrame, // (qid bigint, qvec array<float>)
      right: DataFrame, // (label bigint, vec array<float>)
      k: Int,
      nlist: Int,
      nprobe: Int,
      metric: String = "l2sq",
      seed: Long = 42L,
      trainSample: Int = 16384,
      excludeSelf: Boolean = false): DataFrame = {
    val metricId = VectorMath.metricId(metric)
    val asc = VectorMath.smallerIsCloser(metricId)
    val centroids = KMeansTrainer.train(
      Knn.widen(right).select(vec.vector(col("vec")).as("vec")).limit(trainSample),
      nlist, seed, maxIter = 10)

    val assignOne = GraftBridge.column(
      NearestCentroids(GraftBridge.expression(vec.vector(col("vec"))), centroids, 1, metricId))
    val rightListed = Knn.widen(right).select(
      when(size(assignOne) > 0, element_at(assignOne, 1)).otherwise(lit(-1)).as("list_id"),
      col("label"), vec.vector(col("vec")).as("vec"))

    val probeLists = GraftBridge.column(
      NearestCentroids(GraftBridge.expression(vec.vector(col("qvec"))), centroids,
        math.max(1, nprobe), metricId))
    val leftProbed = Knn.widen(left).select(
      col("qid"), vec.vector(col("qvec")).as("qvec"), explode(probeLists).as("list_id"))

    val d = vec.dist(metric, col("vec"), col("qvec"))
    val joined = leftProbed.join(rightListed, "list_id")
    val filtered = if (excludeSelf) joined.where(col("label") =!= col("qid")) else joined
    Knn.rankResults(
      filtered.select(col("qid"), col("label"), d.as("_dist")),
      k, asc)
  }
}
