package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Micro-profiler for the top-k aggregate's per-row cost: generates a
 * synthetic candidate stream (qid, label, _dist) of a given size
 * in-memory and times count() vs the vec_topk groupBy — isolating the
 * ObjectHashAggregate path cost from joins, shuffles, and IO. Local
 * diagnosis tool, not part of the driver contract.
 */
object AggProfile {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("AGG_ROWS", "100000000").toLong
    val keys = sys.env.getOrElse("AGG_KEYS", "25000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2097152")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[agg] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val df = spark.range(rows).select(
      (col("id") % keys).as("qid"),
      (col("id") % 1000000).as("label"),
      (col("id") % 97).cast("double").as("_dist"))

    timed(s"count($rows rows)")(df.count())
    timed(s"topk($rows rows, $keys keys)") {
      graft.search.Knn.rankResults(df, 3, ascending = true).count()
    }
    timed(s"topk-again") {
      graft.search.Knn.rankResults(df, 3, ascending = true).count()
    }
    spark.stop()
  }
}
