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

  test("events_window_approx: regime measured in-gate; HLL++ replica is bit-exact") {
    import org.apache.spark.sql.functions._
    val rows = run("events_window_approx").collect()
    assert(rows.nonEmpty)
    // gate scale sits in the linear-counting regime and the replica
    // matched every actual estimate — the oracle-emission precondition
    assert(RelationalQueries.windowApproxLinear,
      "every hourly bucket must be in the linear regime with a bit-exact replica")
    // the replica hash IS Spark's xxhash64(long) (seed 42) — the same
    // function the aggregate applies internally
    val probe = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue,
      0x123456789abcdefL) ++ (1 to 40).map(i => i * 2654435761L)
    import spark.implicits._
    val sparkHashes = probe.toDF("v")
      .select(xxhash64(col("v")).as("h")).collect().map(_.getLong(0))
    probe.zip(sparkHashes).foreach { case (v, h) =>
      assert(HllppReplay.hashLong(v) === h, s"hashLong($v)")
    }
    // the replica estimate equals approx_count_distinct end-to-end on
    // adversarial key sets spanning the small-V ladder
    for (n <- Seq(1, 7, 166, 1500)) {
      val keys = (0 until n).map(i => i * 906260474297L + 13L)
      val actual = keys.toDF("v")
        .agg(approx_count_distinct(col("v"), HllppReplay.Rsd).as("e"))
        .collect()(0).getLong(0)
      val vZeros = HllppReplay.M - keys.map(HllppReplay.slot).distinct.size
      assert(HllppReplay.linearRegime(vZeros), s"n=$n must sit in linear regime")
      assert(HllppReplay.linearEstimate(vZeros) === actual, s"n=$n replica")
    }
    // the regime guard REJECTS a dense key set (V driven to the
    // threshold): past ~11.5k distinct the linear path is left and the
    // oracle must be withheld
    val dense = (0 until 60000).map(i => i * 2654435761L + 7L)
    val vDense = HllppReplay.M - dense.map(HllppReplay.slot).distinct.size
    assert(!HllppReplay.linearRegime(vDense),
      "a 60k-distinct key set must leave the linear-counting regime")
  }

  test("events_percentiles_approx: pinned GK state; replica matches the library; single-partition digest equals approx_percentile") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.util.QuantileSummaries
    val rows = run("events_percentiles_approx").collect()
    assert(rows.nonEmpty)
    assert(RelationalQueries.gkApproxPins.nonEmpty,
      "the gate must pin its GK summary state")
    val pins = RelationalQueries.gkApproxPins.get
    // emitted percentiles ARE the pinned-state extraction, via replica
    // AND via the library (three-way bit agreement)
    rows.foreach { r =>
      val p = pins.find(_.eventType == r.getString(0)).get
      val rep = GkReplay.queryReplica(p.values, p.gs, p.deltas, p.digestN, GkReplay.Ranks)
      val stats = p.values.indices.map(i =>
        QuantileSummaries.Stats(p.values(i), p.gs(i), p.deltas(i))).toArray
      val lib = new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
        GkReplay.RelativeError, stats, p.digestN, true).query(GkReplay.Ranks).get
      for ((idx, k) <- Seq(1, 2).zipWithIndex) {
        assert(java.lang.Double.doubleToLongBits(r.getDouble(idx)) ===
          java.lang.Double.doubleToLongBits(lib(k)), s"${p.eventType} lib q${GkReplay.Ranks(k)}")
        assert(java.lang.Double.doubleToLongBits(r.getDouble(idx)) ===
          java.lang.Double.doubleToLongBits(rep(k)), s"${p.eventType} replica q${GkReplay.Ranks(k)}")
      }
      // oracle-side invariants: weights, membership
      assert(p.gs.sum === p.digestN && p.digestN === p.n)
      val src = Tables.events(spark, dir).where(col("event_type") === p.eventType)
        .select("value").collect().map(_.getDouble(0)).toSet
      assert(p.values.forall(src.contains),
        s"${p.eventType}: every pinned value must occur in the source")
      assert(p.values.sameElements(p.values.sorted),
        s"${p.eventType}: pinned values must be non-decreasing")
    }
    // GkStateAgg is approx_percentile's digest: on ONE partition (no
    // merge nondeterminism) the derived percentiles equal
    // approx_percentile's output bit-for-bit
    import spark.implicits._
    val vals = {
      val rng = new scala.util.Random(11)
      Seq.fill(5000)(math.floor(rng.nextDouble() * 4000) / 8.0)
    }
    val one = vals.toDF("v").coalesce(1)
    val ap = one.agg(expr("approx_percentile(v, array(0.5, 0.95), 1000)"))
      .collect()(0).getSeq[Double](0)
    val st = one.agg(graft.functions.gk.stateAgg(col("v"), 1000).as("st"))
      .collect()(0).getStruct(0)
    val stats = st.getSeq[Double](1).indices.map(i => QuantileSummaries.Stats(
      st.getSeq[Double](1)(i), st.getSeq[Long](2)(i), st.getSeq[Long](3)(i))).toArray
    val mine = new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      0.001, stats, st.getLong(0), true).query(Seq(0.5, 0.95)).get
    assert(ap === mine, "single-partition GkStateAgg must reproduce approx_percentile")
  }

  test("GkReplay: query replica matches QuantileSummaries across merge shapes and rank ladders") {
    import org.apache.spark.sql.catalyst.util.QuantileSummaries
    import org.apache.spark.sql.catalyst.expressions.aggregate.ApproximatePercentile.PercentileDigest
    val ranksLadder = Seq(
      GkReplay.Ranks,
      Seq(0.01, 0.25, 0.5, 0.75, 0.99),
      Seq(0.1, 0.9),
      (1 to 99).map(_ / 100.0))
    for (seed <- 1 to 4) {
      val rng = new java.util.Random(seed)
      val n = 2000 + rng.nextInt(40000)
      // gate shape: per-partition digests merged in arbitrary order
      val parts = Array.fill(8)(new PercentileDigest(GkReplay.RelativeError))
      (0 until n).foreach { i =>
        val v = if (rng.nextBoolean()) math.floor(rng.nextDouble() * 1000) / 4.0
                else rng.nextDouble() * 500
        parts(rng.nextInt(8)).add(v)
      }
      val merged = parts.reduce { (a, b) => a.merge(b); a }
      val s = merged.quantileSummaries
      val (vs, gs, ds) = (s.sampled.map(_.value), s.sampled.map(_.g), s.sampled.map(_.delta))
      for (ranks <- ranksLadder) {
        val lib = s.query(ranks).get
        val rep = GkReplay.queryReplica(vs, gs, ds, s.count, ranks)
        assert(lib.map(java.lang.Double.doubleToLongBits) ===
          rep.map(java.lang.Double.doubleToLongBits),
          s"seed=$seed n=$n ranks=${ranks.take(5)}...")
      }
    }
  }
}
