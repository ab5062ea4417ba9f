package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.search.Knn

/**
 * Source coverage: the reference's tests feed indexes from CSV
 * ('test/sql/training.csv' in faiss.test); graft operators are
 * source-agnostic DataFrames, so CSV/JSON/parquet all flow through the
 * same search path.
 */
class SourcesSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("kNN over a CSV-sourced table matches the in-memory result") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_csv").toString
    val rows = (0 until 50).map(i => (i.toLong, i.toFloat, (i % 7).toFloat))
    rows.toDF("id", "x", "y").write.mode("overwrite").option("header", "true").csv(dir)

    val fromCsv = spark.read.option("header", "true")
      .schema("id long, x float, y float").csv(dir)
      .select(col("id").as("label"), array(col("x"), col("y")).as("vec"))
    val inMem = rows.toDF("label", "x", "y")
      .select(col("label"), array(col("x"), col("y")).as("vec"))
    val qs = Seq((0L, Array(10.2f, 3.0f))).toDF("qid", "qvec")

    val a = Knn.searchFlat(fromCsv, qs, 3, "l2sq").collect().map(_.getLong(2)).toSeq
    val b = Knn.searchFlat(inMem, qs, 3, "l2sq").collect().map(_.getLong(2)).toSeq
    assert(a === b && a.nonEmpty)
  }

  test("ORC round-trips vectors and predicate pushdown reaches the ORC scan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_orc").toString
    val rows = (0 until 50).map(i => (i.toLong, Array(i.toFloat, (i % 7).toFloat)))
    rows.toDF("label", "vec").write.mode("overwrite").orc(dir)

    val fromOrc = spark.read.orc(dir)
    val qs = Seq((0L, Array(10.2f, 3.0f))).toDF("qid", "qvec")
    val a = Knn.searchFlat(fromOrc, qs, 3, "l2sq").collect().map(_.getLong(2)).toSeq
    val b = Knn.searchFlat(rows.toDF("label", "vec"), qs, 3, "l2sq").collect().map(_.getLong(2)).toSeq
    assert(a === b && a.nonEmpty)

    // filters reach the ORC reader just like parquet (PushedFilters)
    val plan = fromOrc.where(col("label") > 25L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(label), GreaterThan(label,25)]"), plan.take(1500))
  }

  test("jsonl round-trips document operators") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_json").toString
    Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"))
      .toDF("doc_id", "text").write.mode("overwrite").json(dir)
    val docs = spark.read.schema("doc_id long, text string").json(dir)
    val dd = graft.dedup.Dedup.exact(docs, "doc_id", "text").collect()
    assert(dd.length === 1 && dd(0).getLong(2) === 2L)
  }
}
