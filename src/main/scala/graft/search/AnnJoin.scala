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
   * @param maxListRows skew guard: any IVF list ESTIMATED to hold more
   *   right rows than this is split into salted sublists — right rows
   *   land in a deterministic hash(label) sublist, left probes of that
   *   list replicate to every sublist, and the join key becomes
   *   (list_id, salt). Output is IDENTICAL to the unsalted join (same
   *   candidate pairs, different partitioning), but the hottest
   *   partition is bounded, which AQE alone cannot guarantee for a
   *   degenerate list (all vectors in one cluster). List sizes are
   *   estimated driver-side from a bounded PARTITION-SPREAD sample
   *   (a few rows from every partition, one small collect) scaled by
   *   one column-pruned count(), with a 2x margin. The estimate
   *   weights partitions equally — accurate for file-based scans
   *   (maxPartitionBytes keeps splits near-uniform); a corpus with
   *   wildly uneven CUSTOM partitioning should lower maxListRows to
   *   compensate. Long.MaxValue disables the guard and both jobs.
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
    val asc = VectorMath.smallerIsCloser(VectorMath.metricId(metric))
    Knn.rankResults(
      candidatePairs(left, right, nlist, nprobe, metric, seed, trainSample,
        excludeSelf, maxListRows),
      k, asc)
  }

  /**
   * Distributed radius JOIN (similarity join): every (left, right) pair
   * within `radius` — the unbounded-both-sides complement of
   * `IndexCatalog.searchRadius`, and the 100 TB shape of embedding
   * near-dup detection (dedup_embedding's exact pair scan becomes this
   * the moment neither side fits a broadcast). Same one-shuffle-per-
   * side co-partitioned plan as [[ivfJoin]]; the radius predicate
   * replaces the top-k aggregate, so candidates stream straight from
   * the co-partitioned join — no aggregate at all. Recall follows
   * nprobe/nlist (pairs split across unprobed lists are missed).
   */
  def ivfRadiusJoin(
      left: DataFrame, // (qid bigint, qvec array<float>)
      right: DataFrame, // (label bigint, vec array<float>)
      radius: Double,
      nlist: Int,
      nprobe: Int,
      metric: String = "l2sq",
      seed: Long = 42L,
      trainSample: Int = 16384,
      excludeSelf: Boolean = false,
      maxListRows: Long = 4000000L): DataFrame = {
    val cands = candidatePairs(left, right, nlist, nprobe, metric, seed,
      trainSample, excludeSelf, maxListRows)
    val cmp =
      if (VectorMath.smallerIsCloser(VectorMath.metricId(metric))) col("_dist") < lit(radius)
      else col("_dist") > lit(radius)
    // pairs are already unique: a right row lives in exactly one
    // (list, salt), so no dedup aggregate is needed — hits stream
    // straight out of the co-partitioned join
    cands.where(cmp).select(col("qid"), col("label"), col("_dist").as("distance"))
  }

  private def candidatePairs(
      left: DataFrame,
      right: DataFrame,
      nlist: Int,
      nprobe: Int,
      metric: String,
      seed: Long,
      trainSample: Int,
      excludeSelf: Boolean,
      maxListRows: Long): DataFrame = {
    val metricId = VectorMath.metricId(metric)
    // one bounded collect feeds both quantizer training and the skew
    // estimate (same points the old KMeansTrainer.train path pulled)
    val spark = right.sparkSession
    import spark.implicits._
    val samplePts: Array[Array[Float]] = Knn.widen(right)
      .select(vec.vector(col("vec")).as("vec")).limit(trainSample)
      .as[Seq[Float]].collect().map(_.toArray)
    val centroids = KMeansTrainer.trainLocal(samplePts, nlist, seed, maxIter = 10)

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

    // estimated hot-list split factors, driver-side arithmetic over a
    // PARTITION-SPREAD sample: the training prefix (limit) can be blind
    // to clusters living past the first partitions of a sorted/clustered
    // corpus, which is exactly where a degenerate hot list hides. ONE
    // job returns each partition's exact row count alongside its
    // bounded sample — no separate right.count() job (a full second
    // pass on non-parquet inputs), and each partition's sample is
    // weighted by ITS row count, so wildly uneven custom partitioning
    // can't skew the estimate toward small partitions.
    val splitRows: Seq[(Int, Int)] =
      if (maxListRows == Long.MaxValue || samplePts.isEmpty) Seq.empty
      else {
        val spreadRdd = Knn.widen(right).select(vec.vector(col("vec")).as("vec")).rdd
        val perPart = math.max(1, trainSample / math.max(1, spreadRdd.getNumPartitions))
        val partStats: Array[(Long, Array[Array[Float]])] =
          spreadRdd.mapPartitions { it =>
            val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
            var n = 0L
            it.foreach { row =>
              if (n < perPart) buf += row.getSeq[Float](0).toArray
              n += 1
            }
            Iterator.single((n, buf.toArray))
          }.collect()
        val estRows = new Array[Double](centroids.length)
        partStats.foreach { case (nPart, rows) =>
          if (rows.nonEmpty) {
            val w = nPart.toDouble / rows.length // rows each sampled point represents
            rows.foreach { p =>
              val ids = NearestCentroids.nearestIds(p, centroids, 1, metricId)
              if (ids.nonEmpty) estRows(ids.head) += w
            }
          }
        }
        estRows.indices.map { i =>
          val est = estRows(i) * 2.0 // safety margin
          (i, math.min(64L, (est / maxListRows).toLong + 1L).toInt)
        }.filter(_._2 > 1)
      }

    val d = vec.dist(metric, col("vec"), col("qvec"))
    val joined =
      if (splitRows.isEmpty) leftProbed.join(rightListed, "list_id")
      else {
        // lists not in splitsDf keep salt 0 on both sides (coalesce),
        // so cold lists join on the single (list_id, 0) key unchanged
        val splitsDf = broadcast(splitRows.toDF("list_id", "splits"))
        val rightSalted = rightListed.join(splitsDf, Seq("list_id"), "left")
          .withColumn("salt",
            coalesce(pmod(xxhash64(col("label")), col("splits").cast("long")).cast("int"), lit(0)))
        val leftSalted = leftProbed.join(splitsDf, Seq("list_id"), "left")
          .withColumn("salt", explode(sequence(lit(0), coalesce(col("splits"), lit(1)) - 1)))
        leftSalted.join(rightSalted, Seq("list_id", "salt"))
      }
    val filtered = if (excludeSelf) joined.where(col("label") =!= col("qid")) else joined
    filtered.select(col("qid"), col("label"), d.as("_dist"))
  }
}
