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

  /** auto-nlist target list size: lists stay near this many rows so
    * per-query candidate work is constant in corpus size */
  private val AutoListRows = 2048L
  /** centroid count beyond which assignment/probing walk an HNSW graph
    * over the centroids instead of a flat argmin. The graph walk costs
    * a few hundred distance evals regardless of nlist, so the
    * break-even sits near 1k centroids — at the 100x rung (2M vectors,
    * ~1k auto lists) flat assignment was the superlinear term of the
    * whole join (N x nlist x d), not the candidate scan. */
  private val GraphCoarseThreshold = 1024

  /**
   * @param maxListRows skew guard: any IVF list ESTIMATED to hold more
   *   right rows than this is split into salted sublists — right rows
   *   land in a deterministic hash(label) sublist, left probes of that
   *   list replicate to every sublist, and the join key becomes
   *   (list_id, salt). Output is IDENTICAL to the unsalted join (same
   *   candidate pairs, different partitioning), but the hottest
   *   partition is bounded, which AQE alone cannot guarantee for a
   *   degenerate list (all vectors in one cluster). List sizes are
   *   estimated driver-side from the same single PARTITION-SPREAD
   *   stats job that feeds training (each partition's sample weighted
   *   by its exact row count), with a 2x margin. Long.MaxValue
   *   disables the guard.
   * @param nlist number of IVF lists; <= 0 picks it AUTOMATICALLY from
   *   the measured corpus size (~[[AutoListRows]] rows per list,
   *   clamped to [16, 65536]) so the join stays linear as the corpus
   *   grows — pass an explicit value only to pin recall geometry (and
   *   always for exhaustive-probe exactness, where nprobe must equal
   *   it). Past [[GraphCoarseThreshold]] centroids, assignment and
   *   probing walk an HNSW graph over the centroid table.
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
    val spark = right.sparkSession
    import spark.implicits._
    // ONE spread-stats job feeds quantizer training, the auto-nlist
    // choice, and the skew estimate: every partition returns its EXACT
    // row count plus a bounded sample. A prefix limit() would be blind
    // to clusters past the first partitions of a sorted corpus, and a
    // separate count() would be a second full pass on non-parquet
    // inputs — the spread pass replaces both.
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
    val totalRows = partStats.map(_._1).sum
    val samplePts: Array[Array[Float]] = partStats.flatMap(_._2)
    // nlist <= 0 -> AUTO: size the list count to the corpus so the
    // expected list stays near AutoListRows and per-query candidate
    // work is CONSTANT as the corpus grows. A fixed nlist makes the
    // join quadratic in N — the 100x rung measured knn_join_ann at
    // 479 s with 16 lists of 12.5k rows each before this.
    val nlistEff =
      if (nlist > 0) nlist
      else math.max(16L, math.min(65536L, (totalRows + AutoListRows - 1) / AutoListRows)).toInt
    val centroids = KMeansTrainer.trainLocal(samplePts, nlistEff, seed, maxIter = 10)

    // past a few thousand centroids, flat argmin assignment is itself a
    // scan per vector — walk an HNSW graph over the centroid table
    // instead (the same IVF<n>_HNSW<m> machinery IndexCatalog uses;
    // never at exhaustive probe, where all lists must be returned)
    val coarseMet = graft.index.IndexCatalog.coarseMetricId(metricId)
    val coarseGraph: Option[graft.index.Nsw.Graph] =
      if (centroids.length >= GraphCoarseThreshold && math.max(1, nprobe) < centroids.length)
        Some(graft.index.Nsw.build(
          centroids.zipWithIndex.map { case (c, i) => (i.toLong, c) },
          m = 16, efConstruction = 64, metricId = coarseMet))
      else None
    def nearestExpr(c: org.apache.spark.sql.Column, n: Int) = coarseGraph match {
      case Some(g) => GraftBridge.column(graft.index.HnswNearestCentroids(
        GraftBridge.expression(vec.vector(c)), g, n, math.max(64, n), coarseMet))
      case None => GraftBridge.column(NearestCentroids(
        GraftBridge.expression(vec.vector(c)), centroids, n, metricId))
    }

    val assignOne = nearestExpr(col("vec"), 1)
    val rightListed = Knn.widen(right).select(
      when(size(assignOne) > 0, element_at(assignOne, 1)).otherwise(lit(-1)).as("list_id"),
      col("label"), vec.vector(col("vec")).as("vec"))

    val probeLists = nearestExpr(col("qvec"), math.max(1, nprobe))
    val leftProbed = Knn.widen(left).select(
      col("qid"), vec.vector(col("qvec")).as("qvec"), explode(probeLists).as("list_id"))

    // estimated hot-list split factors from the SAME spread stats: each
    // partition's sample is weighted by its actual row count, so
    // wildly uneven custom partitioning can't skew the estimate.
    val assignIdOf: Array[Float] => Option[Int] = coarseGraph match {
      case Some(g) =>
        p => graft.index.Nsw.search(g, p, 1, 64, coarseMet).headOption.map(_._2.toInt)
      case None =>
        p => NearestCentroids.nearestIds(p, centroids, 1, metricId).headOption
    }
    val splitRows: Seq[(Int, Int)] =
      if (maxListRows == Long.MaxValue || samplePts.isEmpty) Seq.empty
      else {
        val estRows = new Array[Double](centroids.length)
        partStats.foreach { case (nPart, rows) =>
          if (rows.nonEmpty) {
            val w = nPart.toDouble / rows.length // rows each sampled point represents
            rows.foreach(p => assignIdOf(p).foreach(estRows(_) += w))
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
