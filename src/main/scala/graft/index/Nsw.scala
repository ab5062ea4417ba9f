package graft.index

import scala.collection.mutable

/**
 * Single-layer navigable-small-world graph (HNSW's layer 0 — the part
 * that does the work at these shard sizes), built and searched inside
 * one partition. Distribution model: each partition owns an
 * independent graph over its shard; a query greedily searches every
 * shard graph in parallel and the per-shard top-k merge globally —
 * the standard sharded-HNSW architecture (and the only one that
 * scales: graph edges can't cross executors cheaply).
 *
 * Mirrors the reference's `IDMap,HNSW32` factory surface with
 * `efConstruction` / `efSearch` parameters (duckdb-faiss-ext README
 * "faiss_create_params").
 */
object Nsw {

  final case class Graph(
      labels: Array[Long],
      vecs: Array[Array[Float]],
      adj: Array[Array[Int]])

  @inline private def l2sq(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { val t = a(i).toDouble - b(i).toDouble; d += t * t; i += 1 }
    d
  }

  /**
   * greedy best-first search; returns up to k (dist, idx) best-first.
   * `labelOf` breaks distance ties (matching exact search's
   * deterministic (dist, label) ordering) so shard results merge
   * consistently.
   */
  private def searchInternal(
      vecs: Array[Array[Float]], adj: Int => scala.collection.Seq[Int],
      labelOf: Int => Long,
      nNodes: Int, q: Array[Float], k: Int, ef: Int): Array[(Double, Int)] = {
    if (nNodes == 0) return Array.empty
    val visited = new java.util.BitSet(nNodes)
    // candidates: min-heap by distance; results: bounded max-heap on (dist, label)
    val cand = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(-_._1))
    val resOrd: Ordering[(Double, Int)] =
      Ordering.by { case (d, idx) => (d, labelOf(idx)) }
    val res = mutable.PriorityQueue.empty[(Double, Int)](resOrd)
    val entry = 0
    val d0 = l2sq(q, vecs(entry))
    cand.enqueue((d0, entry)); res.enqueue((d0, entry)); visited.set(entry)
    val width = math.max(ef, k)
    while (cand.nonEmpty) {
      val (d, node) = cand.dequeue()
      if (d > res.head._1 && res.size >= width) {
        cand.clear() // frontier strictly worse than the worst retained result
      } else {
        val neighbors = adj(node)
        var i = 0
        while (i < neighbors.length) {
          val nb = neighbors(i)
          if (!visited.get(nb)) {
            visited.set(nb)
            val dn = l2sq(q, vecs(nb))
            if (res.size < width || resOrd.lt((dn, nb), res.head)) {
              cand.enqueue((dn, nb))
              res.enqueue((dn, nb))
              if (res.size > width) res.dequeue()
            }
          }
          i += 1
        }
      }
    }
    res.dequeueAll.reverse.take(k).toArray
  }

  /** incremental insert-based construction */
  def build(items: Array[(Long, Array[Float])], m: Int, efConstruction: Int): Graph = {
    val n = items.length
    val labels = items.map(_._1)
    val vecs = items.map(_._2)
    val adj = Array.fill(n)(mutable.ArrayBuffer.empty[Int])
    val maxDegree = 2 * m
    var i = 1
    while (i < n) {
      val near = searchInternal(vecs, adj(_), labels(_), i, vecs(i), m, efConstruction)
      near.foreach { case (_, nb) =>
        adj(i) += nb
        adj(nb) += i
        if (adj(nb).length > maxDegree) {
          // prune to the m closest neighbors (simple heuristic)
          val pruned = adj(nb).map(x => (l2sq(vecs(nb), vecs(x)), x)).sortBy(_._1).take(m).map(_._2)
          adj(nb).clear(); adj(nb) ++= pruned
        }
      }
      i += 1
    }
    Graph(labels, vecs, adj.map(_.toArray))
  }

  /** top-k labels for a query against one shard graph */
  def search(g: Graph, q: Array[Float], k: Int, efSearch: Int): Array[(Double, Long)] =
    searchInternal(
      g.vecs, i => scala.collection.immutable.ArraySeq.unsafeWrapArray(g.adj(i)),
      g.labels(_), g.labels.length, q, k, math.max(efSearch, k))
      .map { case (d, idx) => (d, g.labels(idx)) }
}
