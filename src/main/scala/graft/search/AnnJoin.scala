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

  /**
   * @param maxListRows skew guard: any IVF list holding more right rows
   *   than this is split into ceil(n/maxListRows) salted sublists —
   *   right rows land in a deterministic hash(label) sublist, left
   *   probes of that list replicate to every sublist, and the join key
   *   becomes (list_id, salt). Output is IDENTICAL to the unsalted join
   *   (same candidate pairs, different partitioning), but the hottest
   *   partition is bounded, which AQE alone cannot guarantee for a
   *   degenerate list (all vectors in one cluster). Costs one
   *   nlist-bounded count aggregate over the assigned right side.
   */
  def ivfJoin(
      left: DataFrame, // (qid bigint, qvec array<float>)
      right: DataFrame, // (label bigint, vec array<float>)
      k: Int,
      nlist: Int,
      nprobe: Int,
      metric: String = "l2sq",
      seed: Long = 42L,
      trainSample: Int = 16384,
      excludeSelf: Boolean = false,
      maxListRows: Long = 4000000L): DataFrame = {
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

    // hot-list split factors: an nlist-bounded aggregate (collect is
    // O(nlist), never O(rows)). splits=1 everywhere -> salting is a
    // no-op and the join stays exactly the round-2 single-key plan.
    val spark = right.sparkSession
    import spark.implicits._
    val splitRows = rightListed.groupBy("list_id").count().collect()
      .map(r => (r.getInt(0), math.min(64L, (r.getLong(1) + maxListRows - 1) / maxListRows).toInt))
    val anyHot = splitRows.exists(_._2 > 1)

    val d = vec.dist(metric, col("vec"), col("qvec"))
    val joined =
      if (!anyHot) leftProbed.join(rightListed, "list_id")
      else {
        val splitsDf = broadcast(splitRows.toSeq.toDF("list_id", "splits"))
        val rightSalted = rightListed.join(splitsDf, "list_id")
          .withColumn("salt", pmod(xxhash64(col("label")), col("splits").cast("long")).cast("int"))
        val leftSalted = leftProbed.join(splitsDf, "list_id")
          .withColumn("salt", explode(sequence(lit(0), col("splits") - 1)))
        leftSalted.join(rightSalted, Seq("list_id", "salt"))
      }
    val filtered = if (excludeSelf) joined.where(col("label") =!= col("qid")) else joined
    Knn.rankResults(
      filtered.select(col("qid"), col("label"), d.as("_dist")),
      k, asc)
  }
}
