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

  /** deterministic driver-side Lloyd's (shared with PQ codebook training) */
  private def trainLocal(vecs: DataFrame, k: Int, seed: Long, maxIter: Int): Array[Array[Float]] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val pts: Array[Array[Float]] =
      vecs.select(vecs.columns.head).as[Seq[Float]].collect().map(_.toArray)
    if (pts.isEmpty) Array.empty else Pq.localKMeans(pts, k, seed, maxIter)
  }
}
