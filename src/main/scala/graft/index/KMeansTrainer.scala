package graft.index

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.DataFrame

import graft.functions.Hash64

/**
 * IVF coarse-quantizer training = KMeans (the `faiss_manual_train`
 * analog; cf. duckdb-faiss-ext README "faiss_manual_train"). Trains on
 * whatever sample DataFrame is handed in — at 100 TB you pass
 * `data.sample(...)`, exactly like FAISS trains on a subset.
 *
 * Small samples (<= LOCAL_LIMIT) run Lloyd's iterations driver-local:
 * a coarse quantizer needs thousands of points, and a few MB of floats
 * iterates in milliseconds on one core, whereas each MLlib iteration
 * costs several distributed-job round trips. Samples above the limit
 * go through MLlib KMeans unchanged.
 */
object KMeansTrainer {
  val LocalLimit = 200000L

  def train(vecs: DataFrame, k: Int, seed: Long, maxIter: Int): Array[Array[Float]] = {
    val n = vecs.count()
    val effK = math.min(k.toLong, n).toInt
    if (n <= LocalLimit) trainLocal(vecs, effK, seed, maxIter)
    else trainMllib(vecs, effK, seed, maxIter)
  }

  private def trainMllib(vecs: DataFrame, k: Int, seed: Long, maxIter: Int): Array[Array[Float]] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val features = vecs
      .select(vecs.columns.head)
      .as[Seq[Float]]
      .map(s => Tuple1(Vectors.dense(s.map(_.toDouble).toArray)))
      .toDF("features")
    val model = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features")
      .fit(features)
    model.clusterCenters.map((v: Vector) => v.toArray.map(_.toFloat))
  }

  /** deterministic driver-side Lloyd's with splitmix-seeded init */
  private def trainLocal(vecs: DataFrame, k: Int, seed: Long, maxIter: Int): Array[Array[Float]] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val pts: Array[Array[Float]] =
      vecs.select(vecs.columns.head).as[Seq[Float]].collect().map(_.toArray)
    if (pts.isEmpty) return Array.empty
    val dim = pts(0).length
    // init: k distinct pseudo-random points (seeded, order-independent picks)
    val centers = Array.tabulate(k) { i =>
      pts(((Hash64.mix(seed + i) >>> 1) % pts.length).toInt).clone()
    }
    val assign = new Array[Int](pts.length)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      moved = false
      // assignment
      var p = 0
      while (p < pts.length) {
        val v = pts(p)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val cen = centers(c)
          var d = 0.0; var i = 0
          while (i < dim) { val t = v(i) - cen(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        if (assign(p) != best) { assign(p) = best; moved = true }
        p += 1
      }
      // update
      val sums = Array.ofDim[Double](k, dim)
      val counts = new Array[Int](k)
      p = 0
      while (p < pts.length) {
        val c = assign(p); counts(c) += 1
        val v = pts(p); var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
        p += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var i = 0
          while (i < dim) { centers(c)(i) = (sums(c)(i) / counts(c)).toFloat; i += 1 }
        }
        c += 1
      }
      iter += 1
    }
    centers
  }
}
