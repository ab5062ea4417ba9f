package graft.index

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.DataFrame

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
    val spark = vecs.sparkSession
    import spark.implicits._
    // a BOUNDED count decides the path (stops scanning at LocalLimit+1
    // rows, moves no data): collecting the sample first would haul
    // ~LocalLimit wide vectors to the driver only to discard them
    // whenever the input is big enough to need the distributed path
    val n = vecs.limit((LocalLimit + 1).toInt).count()
    if (n <= LocalLimit) {
      val pts: Array[Array[Float]] = vecs
        .select(vecs.columns.head)
        .as[Seq[Float]]
        .collect()
        .map(_.toArray)
      if (pts.isEmpty) Array.empty
      else Pq.localKMeans(pts, math.min(k, pts.length), seed, maxIter)
    } else trainMllib(vecs, k, seed, maxIter)
  }

  /** driver-side Lloyd's on an already-collected sample — the bounded-
    * sample path of [[train]], exposed for callers that also need the
    * sample points themselves (e.g. AnnJoin's skew estimation) */
  def trainLocal(pts: Array[Array[Float]], k: Int, seed: Long, maxIter: Int): Array[Array[Float]] =
    if (pts.isEmpty) Array.empty
    else Pq.localKMeans(pts, math.min(k, pts.length), seed, maxIter)

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
}
