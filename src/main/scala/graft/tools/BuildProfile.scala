package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Measurement harness (guide §1) for the *_big index BUILD phases:
 * times each stage of the knn_ivfpq_big / knn_ivf_big builds (corpus
 * generation, training-sample collect, driver k-means / PQ training,
 * assignment + cache fill) so the build-time budget is measured, not
 * guessed. Diagnostics only — never part of the bench contract.
 *
 * Usage: runMain graft.tools.BuildProfile <sfDir>
 */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.index.{IndexCatalog, Pq}
    import graft.functions.vec

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    val copies = spark.range(0, 50).select(col("id").as("copy"))
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def big = copies.join(broadcast(embs))
      .select((col("vec_id") + col("copy") * 1000000L).as("label"),
        vec.vector(col("embedding")).as("vec"))

    (1 to 2).foreach { round =>
      println(s"== round $round (round 1 is warmup)")
      t("corpus gen count")(big.count())
      val sample = t("sample limit+collect")(
        big.select(col("vec")).limit(16384).collect().map(_.getSeq[Float](0).toArray))
      t("pq train (8 books)")(Pq.train(sample, 8, 42L))
      t("kmeans trainer 64")(graft.index.KMeansTrainer.trainLocal(sample, 64, 42L, 10))
      if (IndexCatalog.exists("prof_ivfpq")) IndexCatalog.destroy("prof_ivfpq")
      IndexCatalog.create("prof_ivfpq", 64, "IDMap,IVF16,PQ8", "l2sq",
        Map("nprobe" -> "4", "refine" -> "8"))
      IndexCatalog.add(big, "prof_ivfpq")
      t("ivfpq full build+fill")(IndexCatalog.build("prof_ivfpq").data.count())
      if (IndexCatalog.exists("prof_ivf")) IndexCatalog.destroy("prof_ivf")
      IndexCatalog.create("prof_ivf", 64, "IDMap,IVF64,Flat", "l2sq", Map("nprobe" -> "4"))
      IndexCatalog.add(big, "prof_ivf")
      t("ivf full build+fill")(IndexCatalog.build("prof_ivf").data.count())
    }
    spark.stop()
  }
}
