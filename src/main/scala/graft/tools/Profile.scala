package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Dev profiler: times one query (arg 1) from SparkEntry at a given sf
 * dir (arg 2, default sf0.1), printing per-run wall times after a
 * warmup. Usage: runMain graft.tools.Profile knn_ivf_big /root/testdata/sf0.1
 */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (name == "ivfbig-breakdown") { ivfBigBreakdown(spark, sfDir); spark.stop(); return }
    if (name == "curate-breakdown") { curateBreakdown(spark, sfDir); spark.stop(); return }
    if (name == "saveload-breakdown") { saveLoadBreakdown(spark, sfDir); spark.stop(); return }
    if (name == "pqbig-breakdown") { pqBigBreakdown(spark, sfDir); spark.stop(); return }
    val fn = graft.SparkEntry.queries(name)
    val warmDir = {
      val w = "/root/testdata/sf0.001"
      if (new java.io.File(w).isDirectory) w else sfDir
    }
    fn(spark, warmDir).count() // warmup
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      System.err.println(f"[profile] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }

  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[profile]   $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  /** stage-level decomposition of the pipeline_curate chain */
  private def curateBreakdown(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.text.TextFunctions
    (1 to 2).foreach { round =>
      System.err.println(s"[profile] -- round $round --")
      val d = graft.queries.Tables.wide(spark, dir, "documents")
      t("scan.count") { d.count() }
      t("md5-groupBy only") {
        d.groupBy(md5(col("text")).as("_h"))
          .agg(min(struct(col("doc_id"), col("lang"))).as("c")).count()
      }
      t("gate only") {
        d.where(TextFunctions.qualityScore(col("text")) >= 0.6).count()
      }
      t("gate+dedup") {
        d.where(TextFunctions.qualityScore(col("text")) >= 0.6)
          .groupBy(md5(col("text")).as("_h"))
          .agg(min(struct(col("doc_id"), col("lang"))).as("c")).count()
      }
      t("full query") {
        graft.SparkEntry.queries("pipeline_curate")(spark, dir).count()
      }
    }
  }

  /** stage-level timing of the vs_index_saveload lifecycle */
  private def saveLoadBreakdown(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.vec
    import graft.index.IndexCatalog
    (1 to 2).foreach { round =>
      System.err.println(s"[profile] -- round $round --")
      if (IndexCatalog.exists("prof_svl")) IndexCatalog.destroy("prof_svl")
      val data = graft.queries.Tables(spark, dir, "embeddings")
        .select(col("vec_id").as("label"), vec.vector(col("embedding")).as("vec"))
      val qs = graft.queries.Tables(spark, dir, "embeddings").where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), vec.vector(col("embedding")).as("qvec"))
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_prof_svl").getAbsolutePath
      t("create+add") {
        IndexCatalog.create("prof_svl", 64, "IDMap,IVF16,Flat", "l2sq", Map("nprobe" -> "16"))
        IndexCatalog.add(data, "prof_svl")
      }
      t("build") { IndexCatalog.build("prof_svl") }
      t("save") { IndexCatalog.save("prof_svl", path) }
      t("destroy") { IndexCatalog.destroy("prof_svl") }
      t("load") { IndexCatalog.load("prof_svl", path, spark) }
      t("search") { IndexCatalog.search("prof_svl", 5, qs).count() }
    }
  }

  /** stage-level timing of the knn_ivfpq_big lifecycle */
  private def pqBigBreakdown(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.vec
    import graft.index.IndexCatalog
    (1 to 2).foreach { round =>
      System.err.println(s"[profile] -- round $round --")
      if (IndexCatalog.exists("prof_pq")) IndexCatalog.destroy("prof_pq")
      val copies = spark.range(0, 50).select(col("id").as("copy"))
      val data = copies
        .join(broadcast(graft.queries.Tables(spark, dir, "embeddings")))
        .select((col("vec_id") + col("copy") * 1000000L).as("label"),
          vec.vector(col("embedding")).as("vec"))
      val qs = graft.queries.Tables(spark, dir, "embeddings").where(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), vec.vector(col("embedding")).as("qvec"))
      t("create+add") {
        IndexCatalog.create("prof_pq", 64, "IDMap,IVF16,PQ8", "l2sq",
          Map("nprobe" -> "4", "refine" -> "16"))
        IndexCatalog.add(data, "prof_pq")
      }
      t("build(train+encode+cache)") { IndexCatalog.build("prof_pq") }
      t("search") { IndexCatalog.search("prof_pq", 5, qs).count() }
      t("search2") { IndexCatalog.search("prof_pq", 5, qs).count() }
    }
  }

  /** stage-level timing of the knn_ivf_big lifecycle */
  private def ivfBigBreakdown(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.vec
    import graft.index.IndexCatalog
    (1 to 2).foreach { round =>
      System.err.println(s"[profile] -- round $round --")
      if (IndexCatalog.exists("prof_ivf")) IndexCatalog.destroy("prof_ivf")
      val copies = spark.range(0, 50).select(col("id").as("copy"))
      val data = graft.queries.Tables(spark, dir, "embeddings")
        .crossJoin(copies)
        .select((col("vec_id") + col("copy") * 1000000L).as("label"),
          vec.vector(col("embedding")).as("vec"))
      val qs = graft.queries.Tables(spark, dir, "embeddings").where(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), vec.vector(col("embedding")).as("qvec"))
      t("create+add") {
        IndexCatalog.create("prof_ivf", 64, "IDMap,IVF64,Flat", "l2sq", Map("nprobe" -> "4"))
        IndexCatalog.add(data, "prof_ivf")
      }
      t("train") { IndexCatalog.manualTrain(data.select(col("vec")).limit(16384), "prof_ivf") }
      t("build(assign+cache)") { IndexCatalog.build("prof_ivf") }
      t("search") { IndexCatalog.search("prof_ivf", 5, qs).count() }
      t("search2") { IndexCatalog.search("prof_ivf", 5, qs).count() }
    }
  }
}
