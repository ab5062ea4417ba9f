package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.index.{NearestCentroids, Sq}

/**
 * Randomized property checks (seeded, deterministic) for the
 * driver/executor-side kernels every search path leans on — pure JVM,
 * no SparkSession.
 */
class KernelPropertySpec extends AnyFunSuite {

  private def rng = new scala.util.Random(20260812L)

  test("TopKHeap equals sort-take under both orderings, with NaN dropped") {
    val r = rng
    for (_ <- 0 until 300) {
      val n = r.nextInt(40)
      val k = 1 + r.nextInt(8)
      val asc = r.nextBoolean()
      val pairs = List.fill(n)((math.floor(r.nextDouble() * 20) / 2.0, r.nextInt(50).toLong))
      val heap = new TopKHeap(k, asc)
      (pairs :+ ((Double.NaN, 999L))).foreach { case (d, l) => heap.insert(d, l) }
      val expect = pairs.sortBy { case (d, l) => (if (asc) d else -d, l) }.take(k)
      assert(heap.sorted.toList === expect, s"n=$n k=$k asc=$asc pairs=$pairs")
    }
  }

  test("sortedIntersectCount equals set intersection size") {
    val r = rng
    for (_ <- 0 until 300) {
      val a = Array.fill(r.nextInt(60))(r.nextInt(80).toLong - 40).distinct.sorted
      val b = Array.fill(r.nextInt(60))(r.nextInt(80).toLong - 40).distinct.sorted
      val got = VectorMath.sortedIntersectCount(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(a),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(b))
      assert(got === a.toSet.intersect(b.toSet).size)
    }
  }

  test("text gram kernels equal brute-force multiset stats on random docs") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val r = rng
    for (_ <- 0 until 300) {
      val nTok = r.nextInt(30)
      val n = 1 + r.nextInt(3)
      // tiny alphabet so repeats are common
      val toks = Array.fill(nTok)(("abc" (r.nextInt(3))).toString)
      val arr = new GenericArrayData(toks.map(t => UTF8String.fromString(t)))
      val grams = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
      val top = graft.text.TextKernels.topShingleRatio(arr, n)
      val dup = graft.text.TextKernels.dupShingleFraction(arr, n)
      if (grams.isEmpty) {
        assert(top.isNaN && dup.isNaN)
      } else {
        val counts = grams.groupBy(identity).view.mapValues(_.size)
        assert(top === counts.values.max.toDouble / grams.size)
        assert(dup === counts.values.filter(_ >= 2).sum.toDouble / grams.size)
        // cross-kernel invariant: a repeated top gram is itself a dup
        if (counts.values.max >= 2) assert(dup >= top)
      }
    }
  }

  test("SQ8 round-trip error is bounded by one quantization step") {
    val r = rng
    for (_ <- 0 until 50) {
      val dim = 1 + r.nextInt(16)
      val vs = Array.fill(2 + r.nextInt(30))(Array.fill(dim)(r.nextFloat() * 200f - 100f))
      val (vmin, vdiff) = Sq.train(vs)
      vs.foreach { v =>
        val code = Sq.encodeOne(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(v), vmin, vdiff)
        v.indices.foreach { i =>
          val decoded = vmin(i) + (code(i) & 0xff).toFloat / 255f * vdiff(i)
          assert(math.abs(v(i) - decoded) <= vdiff(i) / 255f / 2f + 1e-3f + vdiff(i) * 1e-5f,
            s"dim $i v=${v(i)} decoded=$decoded vdiff=${vdiff(i)}")
        }
      }
    }
  }

  test("nearestIds(1) agrees with brute-force argmin (L2) / argmax (IP)") {
    val cents = Array(Array(0f, 0f), Array(10f, 0f), Array(0f, 10f), Array(5f, 5f))
    val r = rng
    for (_ <- 0 until 300) {
      val q = Array(r.nextFloat() * 40f - 20f, r.nextFloat() * 40f - 20f)
      val l2 = NearestCentroids.nearestIds(q, cents, 1, VectorMath.L2SQ).head
      val bruteL2 = cents.indices.minBy(c =>
        cents(c).zip(q).map { case (a, b) => (a - b).toDouble * (a - b) }.sum)
      assert(l2 === bruteL2)
      val scores = cents.indices.map(c =>
        cents(c).zip(q).map { case (a, b) => a.toDouble * b }.sum)
      if (scores.count(_ == scores.max) == 1) {
        val ip = NearestCentroids.nearestIds(q, cents, 1, VectorMath.IP).head
        assert(ip === scores.indexOf(scores.max))
      }
    }
  }
}
