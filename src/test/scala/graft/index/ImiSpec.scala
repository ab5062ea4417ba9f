package graft.index

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorMath

/**
 * Unit properties of the inverted multi-index kernels (Imi.scala):
 * the product argmin/enumeration must agree with brute force over the
 * materialized product-centroid table, because that equivalence is
 * what lets IMI reuse the whole IVF list machinery unchanged.
 */
class ImiSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260815L)
  private def vec(n: Int): Array[Float] = Array.fill(n)(rnd.nextFloat() * 4f - 2f)

  private def trainBooks(dim: Int, k: Int): Array[Array[Array[Float]]] = {
    val pts = Array.fill(400)(vec(dim))
    Imi.train(pts, k, seed = 7L)
  }

  test("assignCell equals flat argmin over the product-centroid table") {
    val dim = 8
    val books = trainBooks(dim, 4)
    val product = Imi.productCentroids(books)
    assert(product.length === books(0).length * books(1).length)
    for (_ <- 1 to 200) {
      val q = vec(dim)
      val viaProduct = NearestCentroids
        .nearestIds(q, product, 1, VectorMath.L2SQ).head
      assert(Imi.assignCell(q, books) === viaProduct)
    }
  }

  test("probeCells enumerates cells in exact ascending d1+d2 order; full probe covers every cell") {
    val dim = 8
    val books = trainBooks(dim, 4)
    val product = Imi.productCentroids(books)
    val nlist = product.length
    for (_ <- 1 to 50) {
      val q = vec(dim)
      val all = Imi.probeCells(q, books, nlist)
      assert(all.length === nlist)
      assert(all.toSet === (0 until nlist).toSet) // complete enumeration
      // distances non-decreasing along the emitted order
      def distTo(cell: Int): Double = {
        var d = 0.0; var i = 0
        while (i < dim) { val t = q(i).toDouble - product(cell)(i); d += t * t; i += 1 }
        d
      }
      val ds = all.map(distTo)
      ds.sliding(2).foreach { case Seq(a, b) => assert(a <= b + 1e-12) }
      // a prefix IS the top-nprobe set of the brute-force ranking
      val brute = NearestCentroids.nearestIds(q, product, 5, VectorMath.L2SQ)
      assert(all.take(5).map(distTo).max <= distTo(brute.last) + 1e-12)
    }
  }

  test("product centroid layout: cell id = i*K + j with first half high") {
    val books = trainBooks(6, 2)
    val product = Imi.productCentroids(books)
    val k = books(1).length
    for (i <- books(0).indices; j <- books(1).indices) {
      assert(product(i * k + j).toSeq === (books(0)(i) ++ books(1)(j)).toSeq)
    }
  }

  test("training is deterministic in (sample, k, seed) and splits dims evenly") {
    val pts = Array.fill(300)(vec(10))
    val a = Imi.train(pts, 4, 13L)
    val b = Imi.train(pts.map(_.clone()), 4, 13L)
    assert(a.length === 2)
    assert(a(0)(0).length === 5)
    assert(a(1)(0).length === 5)
    assert(a.map(_.map(_.toSeq).toSeq).toSeq === b.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("odd dim fails loudly at train") {
    intercept[IllegalArgumentException](Imi.train(Array.fill(10)(vec(7)), 4, 1L))
  }
}
