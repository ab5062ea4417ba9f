package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/**
 * Tight scalar loops over float-vector [[ArrayData]], computing in double.
 *
 * The 9 metrics mirror the reference's metric surface
 * (duckdb-faiss-ext README "metric_type": INNER_PRODUCT, L2, L1, Linf,
 * Lp, Canberra, BrayCurtis, JensenShannon, Jaccard; cf.
 * reference src/faiss_extension.cpp:58-68 metric table) with FAISS
 * conventions: L2 is the *squared* euclidean distance, Lp is
 * sum(|a-b|^p) without the 1/p root, Jaccard is the weighted
 * 1 - sum(min)/sum(max).
 *
 * These are called from generated code (static forwarders), so the loop
 * body JITs without boxing and the calling expression stays inside
 * WholeStageCodegen.
 */
object VectorMath {
  final val L2SQ = 0
  final val IP = 1
  final val COSINE = 2
  final val L1 = 3
  final val LINF = 4
  final val LP = 5
  final val CANBERRA = 6
  final val BRAYCURTIS = 7
  final val JENSENSHANNON = 8
  final val JACCARD = 9
  final val L2 = 10 // true euclidean (sqrt), for user convenience

  def metricId(name: String): Int = name.toLowerCase match {
    case "l2" | "l2sq" | "euclidean_sq" => L2SQ
    case "ip" | "inner_product"         => IP
    case "cosine" | "cosine_dist"       => COSINE
    case "l1" | "manhattan"             => L1
    case "linf" | "chebyshev"           => LINF
    case "lp"                           => LP
    case "canberra"                     => CANBERRA
    case "braycurtis"                   => BRAYCURTIS
    case "jensenshannon" | "js"         => JENSENSHANNON
    case "jaccard"                      => JACCARD
    case "euclidean"                    => L2
    case other => throw new IllegalArgumentException(s"unknown metric: $other")
  }

  /** true iff smaller values mean "closer" for this metric */
  def smallerIsCloser(metric: Int): Boolean = metric != IP

  def dist(metric: Int, a: ArrayData, b: ArrayData, p: Double): Double = {
    val n = a.numElements()
    require(b.numElements() == n, s"vector dims differ: $n vs ${b.numElements()}")
    (a, b) match {
      // statically-typed UnsafeArrayData receivers: ArrayData.getFloat
      // through the abstract type is a MEGAMORPHIC virtual call (several
      // ArrayData subclasses are live in any Spark job), which blocks
      // inlining and costs ~1 us per 64-d pair — measured as 931 s of
      // the 100x rung's 8e8-pair ANN join. On the final concrete class
      // the same loop inlines and runs at memory speed. Loop order is
      // identical to the generic path, so results are bit-equal.
      case (x: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData,
            y: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData) =>
        metric match {
          case L2SQ   => l2sqU(x, y, n)
          case IP     => ipU(x, y, n)
          case COSINE => cosineU(x, y, n)
          case L2     => math.sqrt(l2sqU(x, y, n))
          case _      => distGeneric(metric, a, b, n, p)
        }
      case _ => distGeneric(metric, a, b, n, p)
    }
  }

  private def distGeneric(metric: Int, a: ArrayData, b: ArrayData, n: Int, p: Double): Double =
    metric match {
      case L2SQ          => l2sq(a, b, n)
      case IP            => ip(a, b, n)
      case COSINE        => cosine(a, b, n)
      case L1            => l1(a, b, n)
      case LINF          => linf(a, b, n)
      case LP            => lp(a, b, n, p)
      case CANBERRA      => canberra(a, b, n)
      case BRAYCURTIS    => braycurtis(a, b, n)
      case JENSENSHANNON => jensenshannon(a, b, n)
      case JACCARD       => jaccard(a, b, n)
      case L2            => math.sqrt(l2sq(a, b, n))
    }

  private def l2sqU(
      a: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData,
      b: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble; s += d * d; i += 1 }
    s
  }

  private def ipU(
      a: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData,
      b: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  private def cosineU(
      a: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData,
      b: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData, n: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / math.sqrt(na * nb)
  }

  private def l2sq(a: ArrayData, b: ArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble; s += d * d; i += 1 }
    s
  }

  private def ip(a: ArrayData, b: ArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  private def cosine(a: ArrayData, b: ArrayData, n: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / math.sqrt(na * nb)
  }

  private def l1(a: ArrayData, b: ArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += math.abs(a.getFloat(i).toDouble - b.getFloat(i).toDouble); i += 1 }
    s
  }

  private def linf(a: ArrayData, b: ArrayData, n: Int): Double = {
    var m = 0.0; var i = 0
    while (i < n) {
      val d = math.abs(a.getFloat(i).toDouble - b.getFloat(i).toDouble)
      if (d > m) m = d
      i += 1
    }
    m
  }

  private def lp(a: ArrayData, b: ArrayData, n: Int, p: Double): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += math.pow(math.abs(a.getFloat(i).toDouble - b.getFloat(i).toDouble), p); i += 1 }
    s
  }

  private def canberra(a: ArrayData, b: ArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      val den = math.abs(x) + math.abs(y)
      if (den > 0.0) s += math.abs(x - y) / den
      i += 1
    }
    s
  }

  private def braycurtis(a: ArrayData, b: ArrayData, n: Int): Double = {
    var num = 0.0; var den = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      num += math.abs(x - y); den += math.abs(x + y); i += 1
    }
    if (den == 0.0) 0.0 else num / den
  }

  private def jensenshannon(a: ArrayData, b: ArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      val m = x + y
      if (x > 0.0 && m > 0.0) s += x * math.log(2.0 * x / m)
      if (y > 0.0 && m > 0.0) s += y * math.log(2.0 * y / m)
      i += 1
    }
    0.5 * s
  }

  private def jaccard(a: ArrayData, b: ArrayData, n: Int): Double = {
    var mn = 0.0; var mx = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      mn += math.min(x, y); mx += math.max(x, y); i += 1
    }
    if (mx == 0.0) 0.0 else 1.0 - mn / mx
  }

  /** dense double dot-product against a primitive query array (used by
    * broadcast-query search); same UnsafeArrayData devirtualization as
    * [[dist]] — this is the flat-scan inner loop */
  def dotF(a: ArrayData, q: Array[Double]): Double = a match {
    case u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData =>
      var s = 0.0; var i = 0; val n = q.length
      while (i < n) { s += u.getFloat(i).toDouble * q(i); i += 1 }
      s
    case _ =>
      var s = 0.0; var i = 0; val n = q.length
      while (i < n) { s += a.getFloat(i).toDouble * q(i); i += 1 }
      s
  }

  /**
   * SIMD (Panama, jdk.incubator.vector) gate for the primitive hot
   * kernels. ON by default since the r14 optimization round: the SIMD
   * sums are lane-reassociated (~1e-15 relative drift vs the
   * sequential scalar sum), but the full 249-query gate suite was
   * A/B-measured ROW-SET BIT-EQUAL scalar-vs-SIMD (tools/simd_ab.py,
   * SURVEY §23.5 — quant4 rounding and deterministic tie-breaks absorb
   * the drift; the one historical diff, events_kll_rollup, was
   * run-order KLL randomness since pinned by its sorted-view replay),
   * and re-verified 251/251 PASS at sf0.001 + sf0.01 with SIMD on
   * before the default flip. Trained-state oracles (PQ/RQ/LSQ/SQ/IVF
   * injection) follow the engine's own state, so mode cannot desync
   * them. Disable per JVM with -Dgraft.simd.enabled=false; the module
   * (--add-modules=jdk.incubator.vector) is supplied by build.sbt for
   * every forked run. If the module is absent the kernels fail to
   * classload and `available` latches false — scalar fallback, never
   * an error.
   */
  object Simd {
    final val EnabledProp = "graft.simd.enabled"
    @volatile var enabled: Boolean =
      sys.props.get(EnabledProp).forall(_.trim.equalsIgnoreCase("true"))
    lazy val available: Boolean =
      try { SimdKernels.l2sq(new Array[Float](4), new Array[Float](4)); true }
      catch { case _: Throwable => false } // NoClassDefFoundError without --add-modules
    @inline def active: Boolean = enabled && available
  }

  /** same metrics over primitive float arrays (partition-local search
    * path); loop order matches dist() exactly so results are bit-equal.
    * Hot metrics get dedicated primitive loops — and, when [[Simd]] is
    * opted in, Panama vector kernels (term-exact, sum-reassociated) —
    * the rest wrap (cold). */
  def distArr(metric: Int, a: Array[Float], b: Array[Float], p: Double): Double = {
    val n = a.length
    require(b.length == n, s"vector dims differ: $n vs ${b.length}")
    metric match {
      case L2SQ =>
        if (Simd.active) SimdKernels.l2sq(a, b)
        else {
          var s = 0.0; var i = 0
          while (i < n) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
          s
        }
      case IP =>
        if (Simd.active) SimdKernels.ip(a, b)
        else {
          var s = 0.0; var i = 0
          while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
          s
        }
      case COSINE =>
        if (Simd.active) SimdKernels.cosine(a, b)
        else {
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < n) {
            val x = a(i).toDouble; val y = b(i).toDouble
            dot += x * y; na += x * x; nb += y * y; i += 1
          }
          if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / math.sqrt(na * nb)
        }
      case _ =>
        dist(metric, new GenericArrayData(a), new GenericArrayData(b), p)
    }
  }

  /** unit-normalize into a fresh float array (zero vectors unchanged) */
  def normalize(a: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = a.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; ss += x * x; i += 1 }
    val out = new Array[Float](n)
    val inv = if (ss > 0.0) 1.0 / math.sqrt(ss) else 1.0
    i = 0
    while (i < n) { out(i) = (a.getFloat(i) * inv).toFloat; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** pack the sign bits of up to the first 64 dims into one long
    * (bit i set ⇔ a(i) >= 0) — 1-bit binary quantization: 32x smaller
    * than float32, Hamming distance via one XOR + POPCNT per pair */
  def signBits(a: ArrayData): Long = {
    val n = math.min(a.numElements(), 64)
    var bits = 0L
    var i = 0
    while (i < n) { if (a.getFloat(i) >= 0f) bits |= (1L << i); i += 1 }
    bits
  }

  /** |A ∩ B| of two SORTED long arrays by linear merge — no per-call
    * hash set, the cheap inner loop of set-similarity joins */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
