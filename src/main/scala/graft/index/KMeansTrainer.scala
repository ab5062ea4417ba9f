package graft.index

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.DataFrame

/**
 * IVF coarse-quantizer training = MLlib KMeans (the `faiss_manual_train`
 * analog; cf. duckdb-faiss-ext README "faiss_manual_train"). Trains on
 * whatever sample DataFrame is handed in — at 100 TB you pass
 * `data.sample(...)`, exactly like FAISS trains on a subset.
 */
object KMeansTrainer {
  def train(vecs: DataFrame, k: Int, seed: Long, maxIter: Int): Array[Array[Float]] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val features = vecs
      .select(vecs.columns.head)
      .as[Seq[Float]]
      .map(s => Tuple1(Vectors.dense(s.map(_.toDouble).toArray)))
      .toDF("features")
    val effK = math.min(k.toLong, features.count()).toInt
    val model = new KMeans()
      .setK(effK).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features")
      .fit(features)
    model.clusterCenters.map((v: Vector) => v.toArray.map(_.toFloat))
  }
}
