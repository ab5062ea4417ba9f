package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/**
 * Parity spec for the opt-in Panama SIMD kernels: per-dimension terms
 * are exact-in-double by construction (see SimdKernels' numeric
 * contract), so the ONLY allowed divergence from the scalar path is
 * the sum's association order — bounded here at 1e-12 relative, and
 * measured ~1e-15 in practice. Also pins the routing: the Simd gate is
 * OFF by default (oracle gates hash raw sequential-sum doubles) and
 * toggling it swaps distArr's implementation without changing top-k
 * membership on tie-free data.
 */
class SimdSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260815L)
  private def vec(n: Int): Array[Float] = Array.fill(n)(rnd.nextFloat() * 10f - 5f)

  private def scalar(metric: Int, a: Array[Float], b: Array[Float]): Double = {
    val was = VectorMath.Simd.enabled
    VectorMath.Simd.enabled = false
    try VectorMath.distArr(metric, a, b, 3.0) finally VectorMath.Simd.enabled = was
  }

  test("SIMD kernels are available in this JVM (build ships --add-modules)") {
    assert(VectorMath.Simd.available, "jdk.incubator.vector missing from the forked test JVM")
    assert(SimdKernels.species().startsWith("Species[float"))
  }

  test("default is OFF: the canonical oracle-gated path stays scalar") {
    assert(!java.lang.Boolean.getBoolean(VectorMath.Simd.EnabledProp))
  }

  test("l2sq/ip/cosine: SIMD within 1e-12 relative of scalar across dims straddling lane widths") {
    // dims cover: below one lane, exactly 1/2/4 lanes (512-bit = 16
    // floats), the unrolled 2x stride, odd tails, and large
    for (dim <- Seq(1, 3, 7, 15, 16, 17, 31, 32, 33, 48, 64, 65, 96, 127, 128, 300, 768)) {
      for (_ <- 1 to 20) {
        val a = vec(dim); val b = vec(dim)
        val pairs = Seq(
          VectorMath.L2SQ -> SimdKernels.l2sq(a, b),
          VectorMath.IP -> SimdKernels.ip(a, b),
          VectorMath.COSINE -> SimdKernels.cosine(a, b))
        for ((metric, simd) <- pairs) {
          val sc = scalar(metric, a, b)
          val tol = 1e-12 * math.max(1.0, math.abs(sc))
          assert(math.abs(simd - sc) <= tol,
            s"metric=$metric dim=$dim simd=$simd scalar=$sc")
        }
      }
    }
  }

  test("cosine zero-vector convention matches scalar (1.0)") {
    val z = new Array[Float](64)
    val v = vec(64)
    assert(SimdKernels.cosine(z, v) === 1.0)
    assert(SimdKernels.cosine(v, z) === 1.0)
    assert(SimdKernels.cosine(z, z) === 1.0)
  }

  test("toggling the gate swaps distArr's implementation; top-k membership is unchanged") {
    val corpus = Array.tabulate(2000)(i => i.toLong -> vec(64))
    val q = vec(64)
    def topk(enabled: Boolean): Seq[(Double, Long)] = {
      val was = VectorMath.Simd.enabled
      VectorMath.Simd.enabled = enabled
      try {
        val h = new TopKHeap(10, ascending = true)
        corpus.foreach { case (l, v) => h.insert(VectorMath.distArr(VectorMath.L2SQ, v, q, 3.0), l) }
        h.sorted.toSeq
      } finally VectorMath.Simd.enabled = was
    }
    val off = topk(false)
    val on = topk(true)
    assert(on.map(_._2) === off.map(_._2)) // same labels, same order (random data: tie-free)
    on.zip(off).foreach { case ((dOn, _), (dOff, _)) =>
      assert(math.abs(dOn - dOff) <= 1e-12 * math.max(1.0, dOff))
    }
  }

  private def gated[A](enabled: Boolean)(body: => A): A = {
    val was = VectorMath.Simd.enabled
    VectorMath.Simd.enabled = enabled
    try body finally VectorMath.Simd.enabled = was
  }

  test("sqL2u8: SIMD within 1e-12 of the scalar SQ8 decode-distance across dims straddling the byte-block width") {
    import graft.index.Sq
    // 512-bit species processes 64 codes per block: cover sub-block
    // (pure scalar tail), exact blocks, and odd tails past 1-2 blocks
    for (dim <- Seq(1, 7, 16, 33, 63, 64, 65, 127, 128, 130, 300)) {
      for (_ <- 1 to 10) {
        val vmin = vec(dim)
        val vdiff = Array.fill(dim)(rnd.nextFloat() * 4f)
        val q = vec(dim)
        val pad = rnd.nextInt(4) // exercise non-zero packed-buffer offsets
        val code = Array.fill(pad + dim)(rnd.nextInt(256).toByte)
        val sc = gated(false)(Sq.l2DistanceAt(code, pad, dim, q, vmin, vdiff, Sq.V8))
        val simd = SimdKernels.sqL2u8(code, pad, dim, q, vmin, vdiff)
        val tol = 1e-12 * math.max(1.0, math.abs(sc))
        assert(math.abs(simd - sc) <= tol, s"dim=$dim pad=$pad simd=$simd scalar=$sc")
        // and the Scala entry point routes through it when gated on
        assert(gated(true)(Sq.l2DistanceAt(code, pad, dim, q, vmin, vdiff, Sq.V8)) === simd)
      }
    }
  }

  test("sqL2u8: degenerate dims (vdiff=0) decode exactly to vmin — BIT-equal sums") {
    import graft.index.Sq
    // with vdiff=0 the decode is exact in both paths (x*0f=0f, vmin+0f=vmin
    // for vmin!=-0) and power-of-two vmin/q make every term and partial sum
    // exact in double: any association order yields identical bits
    val dim = 128
    val vmin = Array.tabulate(dim)(i => math.pow(2.0, (i % 6) - 3).toFloat)
    val vdiff = new Array[Float](dim)
    val q = Array.tabulate(dim)(i => math.pow(2.0, ((i + 2) % 6) - 3).toFloat)
    val code = Array.tabulate(dim)(i => (i * 37 % 256).toByte)
    val sc = gated(false)(Sq.l2DistanceAt(code, 0, dim, q, vmin, vdiff, Sq.V8))
    assert(SimdKernels.sqL2u8(code, 0, dim, q, vmin, vdiff) === sc)
  }

  test("rqL2: SIMD within 1e-12 of the scalar additive decode-distance across dims and stage counts") {
    import graft.index.Rq
    for (dim <- Seq(1, 7, 16, 31, 64, 65, 130); m <- Seq(1, 4, 8)) {
      val books = Array.fill(m)(Array.fill(256)(vec(dim)))
      for (_ <- 1 to 5) {
        val q = vec(dim)
        val pad = rnd.nextInt(3)
        val code = Array.fill(pad + m)(rnd.nextInt(256).toByte)
        val sc = gated(false)(Rq.l2DistanceAt(code, pad, m, q, books))
        val simd = SimdKernels.rqL2(code, pad, m, q, books)
        val tol = 1e-12 * math.max(1.0, math.abs(sc))
        assert(math.abs(simd - sc) <= tol, s"dim=$dim m=$m simd=$simd scalar=$sc")
        assert(gated(true)(Rq.l2DistanceAt(code, pad, m, q, books)) === simd)
      }
    }
  }

  test("rqL2: dyadic codebooks give BIT-equal sums (decode and terms exact in both paths)") {
    import graft.index.Rq
    // centroid values in {0.25..4}: any sum of 8 such terms is exact in
    // float, diffs/squares exact in double — association-order-proof
    val dim = 96; val m = 8
    val books = Array.fill(m)(Array.tabulate(256)(c =>
      Array.tabulate(dim)(i => math.pow(2.0, ((c + i) % 5) - 2).toFloat)))
    val q = Array.tabulate(dim)(i => math.pow(2.0, (i % 5) - 2).toFloat)
    val code = Array.tabulate(m)(i => (i * 53 % 256).toByte)
    val sc = gated(false)(Rq.l2DistanceAt(code, 0, m, q, books))
    assert(SimdKernels.rqL2(code, 0, m, q, books) === sc)
  }

  test("nearestL2 argmin matches the scalar early-abandon argmin (random data is tie-free)") {
    for (dim <- Seq(7, 16, 64, 130); _ <- 1 to 10) {
      val book = Array.fill(256)(vec(dim))
      val v = vec(dim)
      var best = 0; var bestD = Double.MaxValue
      for (c <- book.indices) { // the scalar rule, abandon-free reference
        val d = scalar(VectorMath.L2SQ, v, book(c))
        if (d < bestD) { bestD = d; best = c }
      }
      assert(SimdKernels.nearestL2(book, v) === best, s"dim=$dim")
    }
  }

  test("gated RQ encode and IVF assignment produce identical results on random data") {
    import graft.index.{NearestCentroids, Rq}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val dim = 64
    val books = Array.fill(4)(Array.fill(256)(vec(dim)))
    val cents = Array.fill(512)(vec(dim))
    for (_ <- 1 to 20) {
      val v = new GenericArrayData(vec(dim))
      val codesOff = gated(false)(Rq.encodeOne(v, books)).toSeq
      val codesOn = gated(true)(Rq.encodeOne(v, books)).toSeq
      assert(codesOn === codesOff)
      val aOff = gated(false)(NearestCentroids.nearest(v, cents, 1, VectorMath.L2SQ)).getInt(0)
      val aOn = gated(true)(NearestCentroids.nearest(v, cents, 1, VectorMath.L2SQ)).getInt(0)
      assert(aOn === aOff)
    }
  }

  test("l2sqOff: offset-slice kernel within 1e-12 of the scalar slice loop (IMI halves)") {
    for (half <- Seq(3, 8, 16, 32, 33, 65); _ <- 1 to 10) {
      val q = vec(2 * half)
      val cen = vec(half)
      for (off <- Seq(0, half)) {
        var sc = 0.0
        for (i <- 0 until half) { val t = q(off + i).toDouble - cen(i); sc += t * t }
        val simd = SimdKernels.l2sqOff(q, off, cen)
        assert(math.abs(simd - sc) <= 1e-12 * math.max(1.0, sc), s"half=$half off=$off")
      }
    }
  }

  test("l2sqF: float-rounded-term kernel matches the k-means scalar arithmetic within 1e-12") {
    for (dim <- Seq(5, 16, 31, 64, 130); _ <- 1 to 10) {
      val a = vec(dim); val b = vec(dim)
      var sc = 0.0
      for (i <- 0 until dim) { val t = a(i) - b(i); sc += (t * t).toDouble }
      val simd = SimdKernels.l2sqF(a, b)
      assert(math.abs(simd - sc) <= 1e-12 * math.max(1.0, sc), s"dim=$dim")
      // dyadic inputs: terms exact, any association order bit-equal
      val da = Array.tabulate(dim)(i => math.pow(2.0, (i % 5) - 2).toFloat)
      val db = Array.tabulate(dim)(i => math.pow(2.0, ((i + 1) % 5) - 2).toFloat)
      var dsc = 0.0
      for (i <- 0 until dim) { val t = da(i) - db(i); dsc += (t * t).toDouble }
      assert(SimdKernels.l2sqF(da, db) === dsc)
    }
  }

  test("gated IMI assignment and RQ training (k-means + argmin) are identical on random data") {
    import graft.index.{Imi, Rq}
    val dim = 32
    val books = Array.fill(2)(Array.fill(64)(vec(dim / 2)))
    for (_ <- 1 to 20) {
      val q = vec(dim)
      assert(gated(true)(Imi.assignCell(q, books)) === gated(false)(Imi.assignCell(q, books)))
    }
    // Rq.train runs localKMeans per stage + nearestIn residual subtraction:
    // identical codebooks on tie-free data pins the whole gated train path
    val pts = Array.fill(2000)(vec(16))
    val off = gated(false)(Rq.train(pts.map(_.clone()), 2, 42L, 4))
    val on = gated(true)(Rq.train(pts.map(_.clone()), 2, 42L, 4))
    assert(on.map(_.map(_.toSeq).toSeq).toSeq === off.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("pcaTerm: SIMD within 1e-12 of the scalar PCA/OPQ transform term; dyadic inputs BIT-equal") {
    for (dim <- Seq(3, 16, 31, 64, 130); _ <- 1 to 10) {
      val c = vec(dim); val v = vec(dim); val mean = vec(dim)
      var sc = 0.0
      for (i <- 0 until dim) sc += c(i) * (v(i) - mean(i))
      val simd = SimdKernels.pcaTerm(c, v, mean)
      assert(math.abs(simd - sc) <= 1e-12 * math.max(1.0, math.abs(sc)), s"dim=$dim")
    }
    val dim = 96
    val dc = Array.tabulate(dim)(i => math.pow(2.0, (i % 5) - 2).toFloat)
    val dv = Array.tabulate(dim)(i => math.pow(2.0, ((i + 1) % 5) - 2).toFloat)
    val dm = Array.tabulate(dim)(i => math.pow(2.0, ((i + 2) % 5) - 2).toFloat)
    var dsc = 0.0
    for (i <- 0 until dim) dsc += dc(i) * (dv(i) - dm(i))
    assert(SimdKernels.pcaTerm(dc, dv, dm) === dsc)
  }

  test("gated PCA projection agrees with scalar within one float ULP per output dim") {
    import graft.index.Pca
    val dim = 64
    val mean = vec(dim)
    val comps = Array.fill(16)(vec(dim))
    for (_ <- 1 to 20) {
      val v = vec(dim)
      val off = gated(false)(Pca.projectArr(v, mean, comps))
      val on = gated(true)(Pca.projectArr(v, mean, comps))
      off.zip(on).foreach { case (a, b) =>
        // the double dot differs only in association order (~1e-15
        // relative); after toFloat that is at most one ULP on a
        // rounding-boundary hit
        assert(math.abs(a - b) <= math.ulp(a), s"$a vs $b")
      }
    }
  }

  test("exactness of terms: lane-pure inputs give BIT-equal sums (power-of-two values)") {
    // values whose squares/products and partial sums are all exact in
    // double: any summation order yields the identical bit pattern, so
    // this catches a kernel that mangles terms (e.g. rounds the
    // subtraction through float) rather than merely reassociating
    val a = Array.tabulate(64)(i => math.pow(2.0, (i % 8) - 4).toFloat)
    val b = Array.tabulate(64)(i => math.pow(2.0, ((i + 3) % 8) - 4).toFloat)
    assert(SimdKernels.l2sq(a, b) === scalar(VectorMath.L2SQ, a, b))
    assert(SimdKernels.ip(a, b) === scalar(VectorMath.IP, a, b))
  }
}
