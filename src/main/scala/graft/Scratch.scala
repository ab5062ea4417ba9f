package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling harness — not part of the library surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      System.err.println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.3fs (n=$n)")
    }
    val d = graft.queries.Tables(spark, dir, "documents")
    // warm
    (1 to 2).foreach { _ =>
      graft.queries.DedupQueries.queries("dedup_incremental_near")(spark, dir).count()
    }
    time("full")(graft.queries.DedupQueries.queries("dedup_incremental_near")(spark, dir).count())
    val corpus = d.where(col("doc_id") < 250).select(col("doc_id"), col("text"))
    val batch = d.where(col("doc_id") >= 250).select(col("doc_id"), col("text"))
    time("batch sigs")(graft.dedup.Dedup.minhashSignatures(batch, "doc_id", "text", 128, 3, 42L).count())
    time("batch sigs again")(graft.dedup.Dedup.minhashSignatures(batch, "doc_id", "text", 128, 3, 42L).count())
    time("corpus sigs")(graft.dedup.Dedup.minhashSignatures(corpus, "doc_id", "text", 128, 3, 42L).count())
    val toks = graft.search.Knn.widen(batch)
      .select(col("doc_id"), graft.text.TextFunctions.tokens(col("text")).as("t"))
    time("tokens only")(toks.count())
    val sh = toks.select(col("doc_id"),
      array_sort(transform(graft.text.TextFunctions.shingles(col("t"), 3), s => xxhash64(s))).as("sh"))
    time("shingle-hash")(sh.count())
    spark.stop()
  }
}
