package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

class VectorMathSpec extends AnyFunSuite {
  private def arr(xs: Double*) = new GenericArrayData(xs.map(_.toFloat).toArray)
  private def d(metric: String, a: Seq[Double], b: Seq[Double], p: Double = 3.0): Double =
    VectorMath.dist(VectorMath.metricId(metric), arr(a: _*), arr(b: _*), p)

  private val a = Seq(1.0, 2.0, 3.0)
  private val b = Seq(4.0, 6.0, 3.0)

  test("l2sq matches hand computation (FAISS squared-L2 convention)") {
    assert(d("l2sq", a, b) === 9.0 + 16.0)
  }
  test("euclidean is sqrt of l2sq") {
    assert(d("euclidean", a, b) === math.sqrt(25.0))
  }
  test("inner product") { assert(d("ip", a, b) === 4.0 + 12.0 + 9.0) }
  test("l1") { assert(d("l1", a, b) === 7.0) }
  test("linf") { assert(d("linf", a, b) === 4.0) }
  test("lp(3)") { assert(math.abs(d("lp", a, b) - (27.0 + 64.0)) < 1e-9) }
  test("cosine of identical vectors is 0, orthogonal is 1") {
    assert(math.abs(d("cosine", a, a)) < 1e-7)
    assert(math.abs(d("cosine", Seq(1, 0), Seq(0, 1)) - 1.0) < 1e-12)
  }
  test("canberra") {
    assert(math.abs(d("canberra", a, b) - (3.0 / 5 + 4.0 / 8 + 0.0)) < 1e-7)
  }
  test("braycurtis") {
    assert(math.abs(d("braycurtis", a, b) - 7.0 / 19.0) < 1e-7)
  }
  test("jensenshannon is 0 on identical distributions, bounded by ln(2)") {
    assert(d("jensenshannon", a, a) === 0.0)
    val js = d("jensenshannon", Seq(1.0, 0.0), Seq(0.0, 1.0))
    assert(js > 0 && js <= math.log(2.0) * 2 + 1e-9)
  }
  test("weighted jaccard: identical=0, disjoint=1") {
    assert(d("jaccard", a, a) === 0.0)
    assert(d("jaccard", Seq(1.0, 0.0), Seq(0.0, 1.0)) === 1.0)
  }
  test("all metrics are symmetric (up to float addition order)") {
    for (m <- Seq("l2sq", "l1", "linf", "canberra", "braycurtis", "jensenshannon", "jaccard", "cosine", "ip"))
      assert(math.abs(d(m, a, b) - d(m, b, a)) < 1e-12, m)
  }
  test("dimension mismatch throws") {
    intercept[IllegalArgumentException](d("l2sq", Seq(1.0), Seq(1.0, 2.0)))
  }
}

class VecColumnSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions.col

  test("vec_norm and vec_normalize") {
    import spark.implicits._
    val df = Seq(Tuple1(Array(3.0f, 4.0f)), Tuple1(Array(0.0f, 0.0f))).toDF("v")
    val rows = df.select(
      vec.norm(col("v")).as("n"),
      vec.norm(vec.normalize(col("v"))).as("un")).collect()
    assert(rows(0).getDouble(0) === 5.0)
    assert(math.abs(rows(0).getDouble(1) - 1.0) < 1e-6)
    assert(rows(1).getDouble(0) === 0.0) // zero vector passes through
  }
}
