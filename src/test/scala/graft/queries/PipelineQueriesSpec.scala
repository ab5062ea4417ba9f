package graft.queries

import graft.SparkSpec

/** Sanity specs for the query-level pipeline ops whose full correctness
  * gate is the DuckDB oracle (Verify + tools/check.py). */
class PipelineQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("embed_quantize: scale bounds the error envelope") {
    val rows = PipelineQueries.queries("embed_quantize")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (scale, err) = (r.getDouble(1), r.getDouble(2))
      assert(scale > 0.0)
      // int8 max quantization error is scale/254 per the symmetric grid
      // (half a step of 2*scale/254), plus quant4's 1e-4 rounding slack
      assert(err <= scale / 254.0 + 1e-4, s"err $err vs scale $scale")
    }
  }

  test("events_range_join: one row per order, non-negative attribution") {
    val rows = PipelineQueries.queries("events_range_join")(spark, dir).collect()
    val orders = Tables(spark, dir, "orders").count()
    assert(rows.length.toLong === orders)
    assert(rows.forall(_.getLong(1) >= 0L))
  }

  test("q4_priority: priorities partition the qualifying orders") {
    val rows = PipelineQueries.queries("q4_priority")(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).distinct.length === rows.length)
    assert(rows.forall(_.getLong(1) > 0L))
  }
}
