package graft.queries

import graft.SparkSpec

/**
 * Plan-shape regression guards: the scale properties SURVEY §5 claims
 * (pushdown to the scan, broadcast dims, shuffle-free projections) are
 * asserted here so a refactor can't silently regress them.
 */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def physical(q: String): String =
    graft.SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q6: selective predicates are pushed to the parquet scan") {
    val plan = physical("q6_forecast")
    val pushed = plan.split("PushedFilters: \\[").drop(1)
    assert(pushed.nonEmpty && pushed.exists(seg => !seg.startsWith("]")), plan.take(2000))
    assert(plan.contains("l_shipdate"), "shipdate range should reach the reader")
  }

  test("q6: scan reads only the referenced columns") {
    val plan = physical("q6_forecast")
    val readSchema = plan.split("ReadSchema: ").drop(1).headOption.getOrElse("")
    assert(readSchema.contains("l_extendedprice") && !readSchema.contains("l_returnflag"),
      readSchema.take(300))
  }

  test("q5: dimension joins broadcast") {
    val plan = physical("q5_multijoin")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("embed_quantize: pure projection, no exchange") {
    val plan = physical("embed_quantize")
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("knn_flat_l2: map-side partial top-k before the single shuffle") {
    val plan = physical("knn_flat_l2")
    assert(plan.contains("partial_vec_topk"), plan.take(3000))
    assert(plan.split("Exchange hashpartitioning").length <= 2, // exactly one agg shuffle
      plan.take(3000))
  }

  test("pack_sequences: the only shuffle is keyed by the packing group") {
    val plan = physical("pack_sequences")
    assert(plan.contains("hashpartitioning(lang"), plan.take(2000))
  }
}
