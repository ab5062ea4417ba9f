package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  test("ascending keeps k smallest, sorted best-first") {
    val h = new TopKHeap(3, ascending = true)
    Seq(5.0 -> 50L, 1.0 -> 10L, 3.0 -> 30L, 2.0 -> 20L, 4.0 -> 40L)
      .foreach { case (d, l) => h.insert(d, l) }
    assert(h.sorted.toSeq === Seq((1.0, 10L), (2.0, 20L), (3.0, 30L)))
  }
  test("descending keeps k largest (inner-product style)") {
    val h = new TopKHeap(2, ascending = false)
    Seq(5.0 -> 50L, 1.0 -> 10L, 3.0 -> 30L).foreach { case (d, l) => h.insert(d, l) }
    assert(h.sorted.toSeq === Seq((5.0, 50L), (3.0, 30L)))
  }
  test("ties break toward smaller label") {
    val h = new TopKHeap(2, ascending = true)
    Seq(1.0 -> 7L, 1.0 -> 3L, 1.0 -> 5L).foreach { case (d, l) => h.insert(d, l) }
    assert(h.sorted.toSeq === Seq((1.0, 3L), (1.0, 5L)))
  }
  test("fewer than k entries returns all") {
    val h = new TopKHeap(5, ascending = true)
    h.insert(2.0, 2L); h.insert(1.0, 1L)
    assert(h.sorted.toSeq === Seq((1.0, 1L), (2.0, 2L)))
  }
  test("NaN distances are rejected, not retained") {
    val h = new TopKHeap(2, ascending = true)
    h.insert(Double.NaN, 1L); h.insert(2.0, 2L); h.insert(Double.NaN, 3L); h.insert(1.0, 4L)
    assert(h.sorted.toSeq === Seq((1.0, 4L), (2.0, 2L)))
  }

  test("merge equals single-heap result") {
    val h1 = new TopKHeap(3, ascending = true)
    val h2 = new TopKHeap(3, ascending = true)
    val all = new TopKHeap(3, ascending = true)
    val xs = (1 to 20).map(i => (((i * 37) % 19).toDouble, i.toLong))
    xs.take(10).foreach { case (d, l) => h1.insert(d, l); all.insert(d, l) }
    xs.drop(10).foreach { case (d, l) => h2.insert(d, l); all.insert(d, l) }
    assert(h1.merge(h2).sorted.toSeq === all.sorted.toSeq)
  }
}
