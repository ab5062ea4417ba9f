package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariant checks for the round-4 analytics additions (value-level
  * correctness is DuckDB-oracle-gated; these pin semantics a refactor
  * could silently break). */
class AnalyticsQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def run(q: String) = graft.SparkEntry.queries(q)(spark, dir)

  test("q2_mincost: one-or-more argmin parts per brand, price equals the brand min") {
    val rows = run("q2_mincost").collect()
    val mins = Tables(spark, dir, "part").groupBy("p_brand")
      .agg(min("p_retailprice").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(3) === mins(r.getString(0))))
    assert(rows.map(_.getString(0)).toSet === mins.keySet, "every brand represented")
  }

  test("q8_share: share is nation_revenue/total_revenue and bounded") {
    val rows = run("q8_share").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (share, nat, tot) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(share >= 0.0 && share <= 100.0)
      assert(math.abs(share - nat * 100.0 / tot) < 1e-9)
    }
  }

  test("q13_custdist: distribution covers every customer exactly once") {
    val rows = run("q13_custdist").collect()
    val nCust = Tables(spark, dir, "customer").count()
    assert(rows.map(_.getLong(1)).sum === nCust)
    // weighted count equals total urgent orders
    val urgent = Tables(spark, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT").count()
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum === urgent)
  }

  test("q15_top_supplier: returned revenue is the global max") {
    val rows = run("q15_top_supplier").collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).toSet
    assert(revs.size === 1, "all returned suppliers tie on the max revenue")
  }

  test("q17_small_qty: avg_yearly is small_revenue / 7") {
    val r = run("q17_small_qty").collect()
    assert(r.length === 1)
    assert(math.abs(r(0).getDouble(0) - r(0).getDouble(1) / 7.0) < 1e-3)
  }

  test("q22_idle_rich: only above-average balances, none with recent orders") {
    val total = run("q22_idle_rich").agg(sum("numcust")).collect()(0).getLong(0)
    // re-derive the population with a plain filter + anti join
    val c = Tables(spark, dir, "customer")
    val avgBal = c.where(col("c_acctbal") > 0.0)
      .agg((Tables.moneySum(col("c_acctbal")) / count(lit(1))).as("a"))
      .collect()(0).getDouble(0)
    val recent = Tables(spark, dir, "orders")
      .where(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp"))
      .select("o_custkey")
    val expect = c.where(col("c_acctbal") > avgBal)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(total === expect)
  }

  test("sales_rollup: lattice levels are consistent (grand total = sum of leaves)") {
    val rows = run("sales_rollup").collect()
    val leaves = rows.filter(_.getLong(2) === 0L)
    val flagSubtotals = rows.filter(_.getLong(2) === 1L)
    val grand = rows.filter(_.getLong(2) === 3L)
    assert(grand.length === 1)
    assert(grand(0).getLong(5) === leaves.map(_.getLong(5)).sum)
    assert(grand(0).getLong(5) === flagSubtotals.map(_.getLong(5)).sum)
    assert(rows.length === leaves.length + flagSubtotals.length + 1)
  }

  test("sales_pivot: pivot cells match conditional sums") {
    val rows = run("sales_pivot").collect()
    val expect = Tables(spark, dir, "lineitem")
      .groupBy("l_linestatus")
      .agg(sum(when(col("l_returnflag") === "A", col("l_quantity"))).as("a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach(r => assert(r.getDouble(1) === expect(r.getString(0))))
  }

  test("events_retention: offset-0 cohort sizes cover every user once") {
    val rows = run("events_retention").collect()
    assert(rows.forall(_.getInt(1) >= 0))
    val offset0 = rows.filter(_.getInt(1) == 0).map(_.getLong(2)).sum
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(offset0 === users, "every user lands in exactly one cohort at offset 0")
  }

  test("window_ranks: quartiles bounded, pct_rank/cume in [0,1] and monotone per customer") {
    val rows = run("window_ranks").collect()
    assert(rows.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 4))
    assert(rows.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    assert(rows.forall(r => r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0))
    assert(rows.length === Tables(spark, dir, "orders").count())
  }

  test("nest_lineitems: every lineitem lands in exactly one order's sorted signature") {
    val rows = run("nest_lineitems").collect()
    val total = Tables(spark, dir, "lineitem").count()
    assert(rows.map(_.getLong(2)).sum === total)
    rows.foreach { r =>
      val parts = r.getString(1).split('|')
      assert(parts.length.toLong === r.getLong(2))
      assert(parts.toSeq === parts.toSeq.sorted, "signature must be canonically sorted")
    }
  }

  test("events_sliding: 1h/30m windows count every event exactly twice") {
    val rows = run("events_sliding").collect()
    val total = Tables.events(spark, dir).count()
    assert(rows.map(_.getLong(2)).sum === 2L * total)
  }

  test("events_zscore: flagged rows really sit beyond 3 sigma of their type") {
    val rows = run("events_zscore").collect()
    assert(rows.forall(r => math.abs(r.getDouble(2)) > 3.0))
    // re-derive per-type stats independently and cross-check the flag count
    val e = Tables.events(spark, dir).select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    val byType = e.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expect = byType.map { case (_, vs) =>
      val cents = vs.map(v => math.round(v * 100))
      val n = vs.length.toDouble
      val mean = cents.map(_.toDouble).sum / 100.0 / n
      val std = math.sqrt(cents.map(c => c.toDouble * c).sum / 10000.0 / n - mean * mean)
      if (std > 0) vs.count(v => math.abs(v - mean) > 3 * std) else 0
    }.sum
    assert(rows.length === expect)
  }

  test("knn_radius: hits are exactly the pairs within the radius") {
    val hits = run("knn_radius").collect()
    assert(hits.forall(_.getDouble(2) < VectorQueries.RADIUS))
    // completeness vs an independent brute-force count
    import graft.functions.vec
    val e = Tables(spark, dir, "embeddings")
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), vec.vector(col("embedding")).as("qvec"))
    val d = e.select(col("vec_id").as("label"), vec.vector(col("embedding")).as("vec"))
    val expect = d.crossJoin(q)
      .where(vec.l2sq(col("qvec"), col("vec")) < lit(VectorQueries.RADIUS))
      .count()
    assert(hits.length.toLong === expect && expect > 0)
  }
}
