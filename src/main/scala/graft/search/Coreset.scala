package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.vec

/**
 * Greedy k-center coreset selection (Gonzalez '85 2-approximation):
 * pick the vector farthest from everything chosen so far, k times —
 * the diversity-maximizing subset a curation pipeline uses to seed
 * clusters, pick eval probes, or cap a domain to its most
 * spread-out exemplars (the complement of the density signal
 * `embed_centrality` gives).
 *
 * Distributed shape: the corpus stays put; each of the k rounds is
 * one scan of the cached (label, vec, mind) frame — an argmax row
 * (`orderBy.limit(1)`, a bounded 1-row collect) plus a running
 * `least(mind, dist-to-new-center)` projection. Cost is the honest
 * greedy k-center bound, O(k·N·d) work in k passes, no shuffle at
 * all beyond each pass's top-1 reduce (partial top-1 per partition →
 * driver). The mind column re-materializes each round (cache swap),
 * so the plan stays one projection deep instead of k `least` chains.
 * Deterministic: seed = lowest label, every argmax tie-breaks
 * (distance DESC, label ASC).
 */
object Coreset {

  /** inputs at or under this row count collect once and run the greedy
    * loop locally (65536 × 64-dim floats ≈ 16 MB — the same bounded-
    * collect convention the quantizer trainers use); larger corpora
    * take the distributed k-pass loop */
  val LocalCap = 65536L

  /**
   * @param data (label: Long, vec: array<float>) — any extra columns are ignored
   * @return (center_rank, label, radius) — radius is the max-min
   *         distance the pick covered (non-increasing over ranks;
   *         rank 0 seeds with radius 0)
   */
  def kCenterGreedy(data: DataFrame, k: Int, metric: String = "l2sq"): Seq[(Int, Long, Double)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = Knn.widen(data.select(col("label").cast("long").as("label"),
      vec.vector(col("vec")).as("vec"))).cache()
    val n = base.count()
    require(n > 0, "k-center needs a non-empty input")
    val out =
      if (n <= LocalCap) kCenterLocal(base, k, metric)
      else kCenterDistributed(base, k, metric)
    base.unpersist(blocking = false)
    out
  }

  /** one bounded collect, then the O(k·n·d) greedy loop on the driver —
    * identical math and tie-breaks to the distributed path */
  private def kCenterLocal(base: DataFrame, k: Int, metric: String): Seq[(Int, Long, Double)] = {
    val mid = graft.functions.VectorMath.metricId(metric)
    val rows = base.select(col("label"), col("vec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    def d(a: Array[Float], b: Array[Float]) =
      graft.functions.VectorMath.distArr(mid, a, b, 3.0)
    var centers = Vector((0, rows.head._1, 0.0))
    val mind = rows.map(r => d(r._2, rows.head._2))
    for (rank <- 1 until math.min(k, rows.length)) {
      var best = 0
      var i = 1
      while (i < rows.length) {
        if (mind(i) > mind(best)) best = i // label order breaks dist ties
        i += 1
      }
      centers :+= ((rank, rows(best)._1, mind(best)))
      val cv = rows(best)._2
      i = 0
      while (i < rows.length) {
        val nd = d(rows(i)._2, cv)
        if (nd < mind(i)) mind(i) = nd
        i += 1
      }
    }
    centers
  }

  /** k passes over the cached corpus: each round is one per-partition
    * top-1 reduce plus a `least(mind, dist-to-new-center)` cache swap —
    * no shuffle, O(k·N·d) total. The k-round dependency is inherent to
    * EXACT greedy k-center; a 100 TB corpus that can't afford k passes
    * swaps in the standard two-round variant (per-partition local
    * k-center, then greedy over the k·P candidates) at the cost of
    * exactness. */
  private def kCenterDistributed(base: DataFrame, k: Int, metric: String): Seq[(Int, Long, Double)] = {
    def distTo(center: Array[Float]): Column =
      vec.dist(metric, col("vec"), lit(center))
    val seedRow = base.orderBy(col("label")).limit(1)
      .select(col("label"), col("vec")).collect()
    var centers = Vector((0, seedRow(0).getLong(0), 0.0))
    var cur = base
      .select(col("label"), col("vec"),
        distTo(seedRow(0).getSeq[Float](1).toArray).as("mind"))
      .cache()
    cur.count() // materialize before the loop swaps caches
    for (rank <- 1 until k) {
      val far = cur.orderBy(col("mind").desc, col("label")).limit(1)
        .select(col("label"), col("vec"), col("mind")).collect()(0)
      centers :+= ((rank, far.getLong(0), far.getDouble(2)))
      val next = cur
        .select(col("label"), col("vec"),
          least(col("mind"), distTo(far.getSeq[Float](1).toArray)).as("mind"))
        .cache()
      next.count()
      cur.unpersist(blocking = false)
      cur = next
    }
    cur.unpersist(blocking = false)
    centers
  }
}
