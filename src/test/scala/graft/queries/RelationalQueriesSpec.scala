package graft.queries

import graft.SparkSpec

/** Shape/semantics checks for the round-3 relational additions (their
  * value-level correctness is DuckDB-oracle-gated; these pin the
  * invariants a refactor could silently break). */
class RelationalQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def run(q: String) = graft.SparkEntry.queries(q)(spark, dir)

  test("q18_large_orders: every row exceeds the quantity threshold, top-10 by value") {
    val rows = run("q18_large_orders").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.forall(_.getDouble(3) > 150.0))
    val prices = rows.map(_.getDouble(2)).toSeq
    assert(prices === prices.sorted.reverse, "must be ordered by order value desc")
  }

  test("q19_disjunct: single aggregate row with positive revenue and count") {
    val r = run("q19_disjunct").collect()
    assert(r.length === 1)
    assert(r(0).getDouble(0) > 0.0 && r(0).getLong(1) > 0L)
  }

  test("events_funnel: depths partition the user base") {
    val rows = run("events_funnel").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.keySet.subsetOf(Set(0, 1, 2, 3)))
    assert(rows.values.sum > 0)
    // total users across depths equals distinct users in events
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(rows.values.sum === users)
  }

  test("events_props_extract: one row per event type, means within the k range") {
    val rows = run("events_props_extract").collect()
    val types = Tables.events(spark, dir).select("event_type").distinct().count()
    assert(rows.length === types)
    assert(rows.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 100.0))
    assert(rows.map(_.getLong(2)).sum === Tables.events(spark, dir).count())
  }
}
