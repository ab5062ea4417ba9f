package graft.index

import org.scalatest.funsuite.AnyFunSuite

/** Direct tests of the layered (hierarchical) NSW graph — no Spark. */
class NswSpec extends AnyFunSuite {

  private def randomPoints(n: Int, dim: Int, seed: Long): Array[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(n)(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 10f)))
  }

  private def l2sq(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { val t = a(i).toDouble - b(i).toDouble; d += t * t; i += 1 }
    d
  }

  private def bruteTopK(pts: Array[(Long, Array[Float])], q: Array[Float], k: Int): Seq[Long] =
    pts.map { case (l, v) => (l2sq(q, v), l) }.sortBy(identity).take(k).map(_._2).toSeq

  test("layered graph materializes upper layers on a non-trivial corpus") {
    val pts = randomPoints(4000, 8, seed = 7L)
    val g = Nsw.build(pts, m = 16, efConstruction = 96)
    assert(g.maxLevel >= 1, "4000 points should produce at least one upper layer")
    // geometric thinning: each upper layer is much smaller than layer 0
    val perLevel = g.levels.groupBy(identity).view.mapValues(_.length).toMap
    assert(perLevel.getOrElse(0, 0) > perLevel.getOrElse(1, 0))
    // the entry point lives on the top layer
    assert(g.levels(g.entry) === g.maxLevel)
  }

  test("recall@10 stays tight on a 4k random corpus (layered descent + beam)") {
    val pts = randomPoints(4000, 8, seed = 11L)
    val g = Nsw.build(pts, m = 16, efConstruction = 128)
    val rnd = new scala.util.Random(99L)
    val queries = Array.fill(50)(Array.fill(8)(rnd.nextFloat() * 10f))
    val recall = queries.map { q =>
      val want = bruteTopK(pts, q, 10).toSet
      val got = Nsw.search(g, q, 10, efSearch = 128).map(_._2).toSet
      got.intersect(want).size.toDouble / want.size
    }.sum / queries.length
    assert(recall >= 0.9, s"recall $recall")
  }

  test("duplicate collapse: 100x-replicated corpus keeps recall@5 (walk can't stall in zero-distance clusters)") {
    // 40 distinct points replicated 100x with distinct labels — before
    // the collapse, greedy descent stalled inside a duplicate cluster
    // and recall collapsed (the 1M-vector baseline finding)
    val base = randomPoints(40, 8, seed = 31L)
    val pts = (0 until 100).flatMap(c =>
      base.map { case (l, v) => (c * 1000L + l, v) }).toArray
    val g = Nsw.build(pts, m = 16, efConstruction = 96)
    // one node per DISTINCT vector; every label retained across dups
    assert(g.labels.length === 40)
    assert(g.dups.map(_.length).sum === 4000)
    val rnd = new scala.util.Random(37L)
    val recall = (0 until 20).map { _ =>
      val q = Array.fill(8)(rnd.nextFloat() * 10f)
      val want = bruteTopK(pts, q, 5).toSet
      val got = Nsw.search(g, q, 5, efSearch = 64).map(_._2).toSet
      assert(got.size === 5, "k results even through collapsed nodes")
      got.intersect(want).size.toDouble / want.size
    }.sum / 20
    assert(recall >= 0.9, s"recall $recall on the replicated corpus")
    // tie-break parity: expansion orders (dist, label) exactly like brute force
    val q0 = base(0)._2
    assert(Nsw.search(g, q0, 5, 64).map(_._2).toSeq === bruteTopK(pts, q0, 5))
  }

  test("selector search through collapsed duplicates filters per-label, not per-node") {
    val base = randomPoints(30, 4, seed = 41L)
    val pts = (0 until 10).flatMap(c =>
      base.map { case (l, v) => (c * 100L + l, v) }).toArray
    val g = Nsw.build(pts, m = 8, efConstruction = 64)
    val L2SQ = graft.functions.VectorMath.L2SQ
    val res = Nsw.searchSel(g, Array.fill(4)(5.0f), 6, 64, L2SQ, _ % 2 == 0)
    assert(res.forall(_._2 % 2 == 0), "odd label leaked from a collapsed node")
    assert(res.length === 6)
  }

  test("graph construction is deterministic (hash-derived levels, no RNG)") {
    val pts = randomPoints(1000, 4, seed = 3L)
    val g1 = Nsw.build(pts, m = 8, efConstruction = 64)
    val g2 = Nsw.build(pts, m = 8, efConstruction = 64)
    assert(g1.maxLevel === g2.maxLevel)
    assert(g1.entry === g2.entry)
    assert(g1.levels.toSeq === g2.levels.toSeq)
    assert(g1.adj.map(_.map(_.toSeq).toSeq).toSeq === g2.adj.map(_.map(_.toSeq).toSeq).toSeq)
    val q = Array.fill(4)(5.0f)
    assert(Nsw.search(g1, q, 5, 64).toSeq === Nsw.search(g2, q, 5, 64).toSeq)
  }

  test("empty and single-point graphs search safely") {
    assert(Nsw.search(Nsw.build(Array.empty, 8, 64), Array(1f, 2f), 3, 32).isEmpty)
    val g1 = Nsw.build(Array((42L, Array(1f, 2f))), 8, 64)
    val r = Nsw.search(g1, Array(0f, 0f), 3, 32)
    assert(r.map(_._2).toSeq === Seq(42L))
  }

  test("selector search: only allowed labels surface, traversal keeps connectivity") {
    val pts = randomPoints(2000, 8, seed = 17L)
    val g = Nsw.build(pts, m = 16, efConstruction = 96)
    val L2SQ = graft.functions.VectorMath.L2SQ
    val rnd = new scala.util.Random(23L)
    var hits = 0; var total = 0
    for (_ <- 0 until 20) {
      val q = Array.fill(8)(rnd.nextFloat() * 10f)
      val res = Nsw.searchSel(g, q, 10, 128, L2SQ, _ % 2 == 0)
      assert(res.forall(_._2 % 2 == 0), "odd label leaked through the selector")
      assert(res.length === 10, "half the corpus is allowed; k must fill")
      // distances ascend (best first)
      assert(res.map(_._1).toSeq === res.map(_._1).sorted.toSeq)
      val truth = bruteTopK(pts.filter(_._1 % 2 == 0), q, 10).toSet
      hits += res.count(r => truth(r._2)); total += 10
    }
    assert(hits.toDouble / total >= 0.85,
      s"filtered recall@10 degraded to ${hits.toDouble / total}")
  }

  test("selector search with a singleton selector finds the one allowed point") {
    val pts = randomPoints(500, 4, seed = 5L)
    val g = Nsw.build(pts, m = 8, efConstruction = 64)
    val L2SQ = graft.functions.VectorMath.L2SQ
    // the sole allowed node is FAR from the query — only a traversal
    // that keeps full connectivity while collecting every visited
    // allowed node can still surface it at high ef
    val res = Nsw.searchSel(g, Array(0f, 0f, 0f, 0f), 3, 500, L2SQ, _ == 499L)
    assert(res.map(_._2).toSeq === Seq(499L))
  }

  test("selector allowing everything equals the plain search") {
    val pts = randomPoints(1000, 8, seed = 29L)
    val g = Nsw.build(pts, m = 16, efConstruction = 96)
    val L2SQ = graft.functions.VectorMath.L2SQ
    val q = Array.fill(8)(3.3f)
    val plain = Nsw.search(g, q, 10, 96, L2SQ).toSeq
    val sel = Nsw.searchSel(g, q, 10, 96, L2SQ, _ => true).toSeq
    assert(sel === plain)
  }
}
