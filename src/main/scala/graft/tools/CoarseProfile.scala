package graft.tools

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{vec, VectorMath}
import graft.index.{HnswNearestCentroids, NearestCentroids, Nsw}

/**
 * Measures the graph-coarse claim at the nlist that MOTIVATES it
 * (~65k centroids, the 100 TB serving shape): corpus assignment and
 * query probing, flat argmin vs HNSW walk, at a centroid table too
 * big for cache-resident flat scans. The r9 gates exercise the graph
 * at toy nlist where flat wins; this is the other end. Not part of
 * the driver contract.
 */
object CoarseProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.get("GRAFT_PROFILE_SIMD").contains("1")) {
      VectorMath.Simd.enabled = true
      System.err.println(s"[coarse] SIMD gate ON (available=${VectorMath.Simd.available})")
    }

    val N = sys.env.getOrElse("GRAFT_CP_ROWS", "1000000").toLong
    val NLIST = sys.env.getOrElse("GRAFT_CP_NLIST", "65536").toInt
    val Q = sys.env.getOrElse("GRAFT_CP_QUERIES", "10000").toInt
    val NPROBE = 16
    val DIM = 64

    def vecOf(idCol: org.apache.spark.sql.Column) = vec.vector(array(
      (0 until DIM).map(i => (pmod(xxhash64(idCol + lit(i * 131)), lit(1000)).cast("float")
        / lit(1000.0f))): _*))

    // explicit quantizer, FAISS-style: 65k injected centroids
    def centAt(id: Long): Array[Float] = {
      val a = new Array[Float](DIM)
      var i = 0
      while (i < DIM) {
        var h = (id + i * 131) * 0x9e3779b97f4a7c15L
        h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
        h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
        a(i) = java.lang.Math.floorMod(h ^ (h >>> 31), 1000L) / 1000.0f
        i += 1
      }
      a
    }
    val cents = Array.tabulate(NLIST)(i => centAt(i * 7919L + 3))

    val corpus = spark.range(N)
      .select(col("id").as("label"), vecOf(col("id")).as("vec"))
      .cache()
    corpus.count()

    def timeIt[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[coarse] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val graph = timeIt(s"Nsw.build over $NLIST centroids") {
      Nsw.build(cents.zipWithIndex.map { case (c, i) => (i.toLong, c) },
        m = 32, efConstruction = 64, metricId = VectorMath.L2SQ)
    }

    def assignWith(c: org.apache.spark.sql.Column): Long =
      corpus.select(c.as("ls"))
        .select(element_at(col("ls"), 1).as("l"))
        .agg(sum(col("l"))).collect()(0).getLong(0)

    val graphSum = timeIt(s"assign ${N / 1000}k rows, GRAPH walk") {
      assignWith(GraftBridge.column(HnswNearestCentroids(
        GraftBridge.expression(col("vec")), graph, 1, 64, VectorMath.L2SQ)))
    }
    val flatSum = timeIt(s"assign ${N / 1000}k rows, FLAT argmin") {
      assignWith(GraftBridge.column(NearestCentroids(
        GraftBridge.expression(col("vec")), cents, 1, VectorMath.L2SQ)))
    }
    println(s"[coarse] assignment agreement is approximate by design " +
      s"(graph recall); sums graph=$graphSum flat=$flatSum")

    // driver-side probing, the serving path's query-batch shape
    val queries = Array.tabulate(Q)(i => centAt(i * 104729L + 11))
    timeIt(s"probe $Q queries x nprobe=$NPROBE, GRAPH") {
      var acc = 0L
      queries.foreach { q =>
        acc += Nsw.search(graph, q, NPROBE, math.max(64, NPROBE), VectorMath.L2SQ).length
      }
      acc
    }
    timeIt(s"probe $Q queries x nprobe=$NPROBE, FLAT") {
      var acc = 0L
      queries.foreach { q =>
        acc += NearestCentroids.nearestIds(q, cents, NPROBE, VectorMath.L2SQ).length
      }
      acc
    }

    // save/load A/B at the motivating nlist (round 11, VERDICT #4):
    // load with the persisted adjacency vs load forced to rebuild the
    // graph (coarse_graph_meta removed → key miss → Nsw.build)
    if (sys.env.get("GRAFT_CP_SAVELOAD").contains("1")) {
      val cat = graft.index.IndexCatalog
      val dir = java.nio.file.Files.createTempDirectory("graft_cp_saveload").toString
      val small = corpus.limit(100000)
      cat.create("cp_sl", DIM, s"IDMap,IVF${NLIST}_HNSW32,Flat", "l2sq", Map("nprobe" -> "16"))
      cat.manualTrainCentroids(cents, "cp_sl")
      cat.add(small, "cp_sl")
      timeIt("save (100k rows, graph persisted)") { cat.save("cp_sl", dir) }
      timeIt("load WITH persisted graph") { cat.load("cp_sl_a", dir, spark) }
      // drop the key layout: load must rebuild the 65k-node graph
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val v1 = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getPath.getName).find(_.startsWith("v1-")).get
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$v1/coarse_graph_meta"), true)
      timeIt("load WITHOUT (rebuild Nsw.build)") { cat.load("cp_sl_b", dir, spark) }
    }
    spark.stop()
  }
}
