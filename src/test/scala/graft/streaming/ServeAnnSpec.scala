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
}
