package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.index.IndexCatalog

/** Real-time ANN serving: streamed query vectors answered micro-batch
  * by micro-batch against a catalog index. */
class ServeAnnSpec extends SparkSpec {

  test("streamed queries are served against a built index") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val data = (for (x <- 0 until 10; y <- 0 until 10)
      yield (y * 10L + x, Array(x.toFloat, y.toFloat))).toDF("label", "vec")
    if (IndexCatalog.exists("serve_idx")) IndexCatalog.destroy("serve_idx")
    IndexCatalog.create("serve_idx", 2, "IDMap,Flat")
    IndexCatalog.add(data, "serve_idx")
    IndexCatalog.build("serve_idx")

    val mem = MemoryStream[(Long, Array[Float])]
    val qdf = mem.toDF.toDF("qid", "qvec")
    val answered = mutable.Map.empty[Long, Seq[Long]]
    val q = Streaming.serveAnn(qdf, "serve_idx", 2) { (res, _) =>
      res.collect().groupBy(_.getLong(0)).foreach { case (qid, rows) =>
        answered.synchronized {
          answered(qid) = rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
        }
      }
    }
    try {
      mem.addData((100L, Array(0.1f, 0.0f)))
      q.processAllAvailable()
      mem.addData((101L, Array(8.9f, 9.0f)))
      q.processAllAvailable()
      assert(answered(100L) === Seq(0L, 1L))
      assert(answered(101L) === Seq(99L, 98L))
    } finally {
      q.stop()
      IndexCatalog.destroy("serve_idx")
    }
  }

  test("streamed vectors ingest into a catalog index and are searchable") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    if (IndexCatalog.exists("ingest_idx")) IndexCatalog.destroy("ingest_idx")
    IndexCatalog.create("ingest_idx", 2, "IDMap,Flat")

    val mem = MemoryStream[(Long, Array[Float])]
    val q = Streaming.indexIngest(mem.toDF.toDF("id", "vec"), "ingest_idx")
    def top1(x: Float, y: Float): Long = {
      val qdf = Seq((0L, Array(x, y))).toDF("qid", "qvec")
      IndexCatalog.search("ingest_idx", 1, qdf).collect()(0).getLong(2)
    }
    try {
      mem.addData((10L, Array(0f, 0f)), (11L, Array(5f, 5f)))
      q.processAllAvailable()
      assert(top1(0.1f, 0f) === 10L)
      // a later micro-batch is visible to the next search (lazy rebuild,
      // consecutive-faiss_add semantics)
      mem.addData((12L, Array(0.2f, 0f)))
      q.processAllAvailable()
      assert(top1(0.15f, 0f) === 12L)
    } finally {
      q.stop()
      IndexCatalog.destroy("ingest_idx")
    }
  }
}
