package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.vec

/**
 * Phase-level profiler for the distributed ANN join: times centroid
 * training, right-side assignment, left-side probing, and the full
 * join SEPARATELY so rung-scale regressions can be attributed to a
 * phase instead of guessed at. Not part of the driver contract; a
 * local diagnosis tool (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in
 * Bench).
 */
object JoinProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2097152")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.annjoin.debug", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      val taskDurs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.ArrayList[Double]]()
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        taskDurs.computeIfAbsent(te.stageId, _ => new java.util.ArrayList[Double]())
          .add(te.taskInfo.duration / 1000.0)
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for (s <- si.submissionTime; c <- si.completionTime) yield (c - s) / 1000.0
        val ds = Option(taskDurs.get(si.stageId))
          .map(l => { val a = l.toArray(new Array[java.lang.Double](0)).map(_.doubleValue); a.sorted.reverse })
          .getOrElse(Array.empty[Double])
        val top = ds.take(6).map(d => f"$d%.1f").mkString(",")
        System.err.println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
          f"dur=${dur.getOrElse(-1.0)}%.1fs sumTask=${ds.sum}%.1fs top=[$top] name=${si.name.take(50)}")
      }
    })

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val left = e.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val right = e.select(col("vec_id").as("label"), col("embedding").as("vec"))

    // mirror AnnJoin's internals phase by phase
    val spreadRdd = graft.search.Knn.widen(right)
      .select(vec.vector(col("vec")).as("vec")).rdd
    val (partStats, totalRows) = timed("spread-stats") {
      val perPart = math.max(1, 16384 / math.max(1, spreadRdd.getNumPartitions))
      val ps = spreadRdd.mapPartitions { it =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
        var n = 0L
        it.foreach { row =>
          if (n < perPart) buf += row.getSeq[Float](0).toArray
          n += 1
        }
        Iterator.single((n, buf.toArray))
      }.collect()
      (ps, ps.map(_._1).sum)
    }
    val samplePts = partStats.flatMap(_._2)
    val nlist = math.max(16L, math.min(65536L, (totalRows + 1023) / 1024)).toInt
    System.err.println(s"[profile] totalRows=$totalRows nlist=$nlist sample=${samplePts.length}")
    val centroids = timed(s"kmeans(nlist=$nlist)") {
      graft.index.KMeansTrainer.trainLocal(samplePts, nlist, 42L, maxIter = 10)
    }

    import org.apache.spark.sql.GraftBridge
    def nearestExpr(c: org.apache.spark.sql.Column, n: Int) =
      GraftBridge.column(graft.index.NearestCentroids(
        GraftBridge.expression(vec.vector(c)), centroids, n, graft.functions.VectorMath.L2SQ))

    val rightListed = graft.search.Knn.widen(right).select(
      coalesce(get(nearestExpr(col("vec"), 1), lit(0)), lit(-1)).as("list_id"),
      col("label"), vec.vector(col("vec")).as("vec"))
    // timed("assign-right(get-form)")(rightListed.count())
    val rightListed2 = graft.search.Knn.widen(right).select(
      nearestExpr(col("vec"), 1).as("_l"), col("label"), vec.vector(col("vec")).as("vec"))
    // timed("assign-right(array-only)")(rightListed2.count())

    val leftProbed = graft.search.Knn.widen(left).select(
      col("qid"), vec.vector(col("qvec")).as("qvec"),
      explode(nearestExpr(col("qvec"), 4)).as("list_id"))
    // timed("probe-left")(leftProbed.count())

    // ground truth on workload shape: rows/list, probes/list, true pairs
    val rowsPerList = rightListed.groupBy("list_id").count()
      .select(col("list_id"), col("count").as("rows"))
    val probesPerList = leftProbed.groupBy("list_id").count()
      .select(col("list_id"), col("count").as("probes"))
    val shape = rowsPerList.join(probesPerList, "list_id")
      .select(col("list_id"), col("rows"), col("probes"),
        (col("rows") * col("probes")).as("pairs"))
      .orderBy(col("pairs").desc)
    val top = shape.limit(10).collect()
    val totals = shape.agg(sum("pairs"), sum("rows"), sum("probes")).collect()(0)
    System.err.println(s"[shape] totalPairs=${totals.get(0)} rows=${totals.get(1)} probes=${totals.get(2)}")
    top.foreach(r => System.err.println(
      s"[shape] list=${r.get(0)} rows=${r.get(1)} probes=${r.get(2)} pairs=${r.get(3)}"))

    val full = graft.search.AnnJoin.ivfJoin(left, right, k = 3, nlist = 0, nprobe = 4,
      excludeSelf = true)
    // execute the dataset's OWN plan (not a derived count) so its
    // executedPlan metrics populate
    timed("full-ivfJoin")(full.queryExecution.toRdd.count())
    def metrics(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p.foreach { node =>
        val ms = node.metrics.map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
        System.err.println(s"[metric] ${node.nodeName}: $ms")
      }
    }
    full.queryExecution.executedPlan.foreach {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        metrics(a.executedPlan)
      case _ => ()
    }
    metrics(full.queryExecution.executedPlan)
    spark.stop()
  }
}
