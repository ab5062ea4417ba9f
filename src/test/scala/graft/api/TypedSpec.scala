package graft.api

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.index.IndexCatalog

class TypedSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(5f, 5f)))
      .toDF("id", "vec")
  }
  private def queries = {
    import spark.implicits._
    Seq((100L, Seq(0.1f, 0f))).toDF("qid", "qvec")
  }

  test("typed search returns the same rows as the DataFrame plan, with typed fields") {
    val name = "typed_spec_idx"
    if (IndexCatalog.exists(name)) IndexCatalog.destroy(name)
    IndexCatalog.create(name, 2, "IDMap,Flat", "l2sq")
    IndexCatalog.add(corpus, name)
    val ds = Typed.search(name, 2, queries)
    val got = ds.collect().sortBy(_.rank)
    assert(got.map(_.label).toSeq === Seq(0L, 1L))
    assert(got.forall(_.qid === 100L))
    assert(math.abs(got.head.distance - 0.1 * 0.1) < 1e-9)
    // nested shape: one row per query, best-first neighbor list
    val nested = Typed.searchNested(name, 2, queries).collect()
    assert(nested.length === 1)
    assert(nested.head.results.map(_.label) === Seq(0L, 1L))
    // range shape: variable-length, within-radius only
    val range = Typed.searchRadius(name, 1.5, queries).collect()
    assert(range.map(_.label).sorted.toSeq === Seq(0L, 1L, 2L))
    IndexCatalog.destroy(name)
  }

  test("typed facade adds no extra stage: same physical plan as the DataFrame API") {
    val name = "typed_spec_idx2"
    if (IndexCatalog.exists(name)) IndexCatalog.destroy(name)
    IndexCatalog.create(name, 2, "IDMap,Flat", "l2sq")
    IndexCatalog.add(corpus, name)
    def shufflesOf(plan: String): Int = "Exchange".r.findAllIn(plan).length
    val typedPlan = Typed.search(name, 2, queries).queryExecution.executedPlan.toString
    val framePlan = IndexCatalog.search(name, 2, queries).queryExecution.executedPlan.toString
    assert(shufflesOf(typedPlan) === shufflesOf(framePlan), typedPlan.take(2000))
    IndexCatalog.destroy(name)
  }
}
