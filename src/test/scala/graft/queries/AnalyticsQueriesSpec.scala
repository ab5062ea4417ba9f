package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariant checks for the round-4 analytics additions (value-level
  * correctness is DuckDB-oracle-gated; these pin semantics a refactor
  * could silently break). */
class AnalyticsQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def run(q: String) = graft.SparkEntry.queries(q)(spark, dir)

  test("events_ab_test: corpus-derived threshold keeps the 2x2 margins non-degenerate") {
    val r = run("events_ab_test").collect()(0)
    val users = r.getAs[Long]("users_a") + r.getAs[Long]("users_b")
    val conv = r.getAs[Long]("conv_a") + r.getAs[Long]("conv_b")
    assert(conv > 0, "nobody converted — the chi2=0 branch would pass vacuously")
    assert(conv < users, "everyone converted — degenerate 2x2 margin")
  }

  test("events_pattern: counts match a driver-side replay of the regex over ordered symbols") {
    val rows = run("events_pattern").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(rows.nonEmpty)
    val replay = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))
      .groupBy(_._1).view.mapValues { es =>
        val seq = es.sortBy(e => (e._3.getTime, e._2)).map(_._4 match {
          case "view" => 'v'; case "click" => 'c'; case "purchase" => 'p'; case _ => 'x'
        }).mkString
        (seq.length, "v[^p]{0,2}p".r.findAllIn(seq).length)
      }.toMap
    val expected = replay.filter(_._2._2 > 0)
    assert(rows === expected,
      s"mismatch: ${rows.toSet.diff(expected.toSet)} / ${expected.toSet.diff(rows.toSet)}")
  }

  test("events_gap_fill: dense hourly spine per type, fills carry the last observed sum") {
    val rows = run("events_gap_fill").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getBoolean(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (tpe, rs) =>
      val sorted = rs.sortBy(_._2)
      // contiguous hourly spine from first to last observed bucket
      val hours = sorted.map(_._2)
      assert(hours.zip(hours.tail).forall { case (a, b) => b - a == 3600000L },
        s"$tpe spine not dense")
      assert(rows.length === rows.map(x => (x._1, x._2)).distinct.length)
      // fills are zero-count and carry forward the last real sum
      var lastReal = Double.NaN
      sorted.foreach { case (_, _, n, filled, vs, carry) =>
        if (filled) {
          assert(n === 0L && vs === 0.0)
          assert(carry === lastReal, s"$tpe fill must carry $lastReal, got $carry")
        } else { lastReal = vs; assert(carry === vs) }
      }
      // first bucket of each type is always a real observation
      assert(!sorted.head._4)
    }
  }

  test("events_markov: rows partition transitions, probabilities sum to 1 per from_type") {
    val rows = run("events_markov").collect()
    assert(rows.nonEmpty)
    // total transitions = events - distinct users (each user's last event has no successor)
    val ev = Tables.events(spark, dir)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum === nEvents - nUsers)
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val p = rs.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 1e-9, s"p_trans for $from sums to $p")
    }
  }

  test("q2_mincost: one-or-more argmin parts per brand, price equals the brand min") {
    val rows = run("q2_mincost").collect()
    val mins = Tables(spark, dir, "part").groupBy("p_brand")
      .agg(min("p_retailprice").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(3) === mins(r.getString(0))))
    assert(rows.map(_.getString(0)).toSet === mins.keySet, "every brand represented")
  }

  test("events_hll_rollup: sketch-union rollup tracks exact distinct within HLL error") {
    val rows = run("events_hll_rollup").collect()
    assert(rows.nonEmpty)
    val exact = Tables.events(spark, dir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (tpe, est) = (r.getString(0), r.getLong(2))
      val ex = exact(tpe)
      // lgConfigK=12 -> rse ~1.6%; allow 10% slack for small cardinalities
      assert(math.abs(est - ex) <= math.max(3.0, 0.10 * ex),
        s"$tpe: est=$est exact=$ex")
    }
    // merged rollup must equal a direct single-level sketch of the same
    // keys: register-wise union at equal lgConfigK is lossless
    val direct = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).cast("long").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(2) === direct(r.getString(0))))
  }

  test("events_kll_rollup: merged percentile estimates land within KLL rank error") {
    val rows = run("events_kll_rollup").collect()
    assert(rows.nonEmpty)
    val byType = Tables.events(spark, dir)
      .select(col("event_type"), col("value"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    // k=200 -> normalized rank error ~1.65%; assert the estimate's true
    // rank is within 5% of the target rank (slack for small days)
    def rankOf(sorted: Array[Double], v: Double): Double =
      sorted.count(_ <= v).toDouble / sorted.length
    rows.foreach { r =>
      val vals = byType(r.getString(0))
      for ((target, idx) <- Seq(0.5 -> 2, 0.95 -> 3, 0.99 -> 4)) {
        val est = r.getDouble(idx)
        assert(math.abs(rankOf(vals, est) - target) <= 0.05,
          s"${r.getString(0)} p$target: est=$est rank=${rankOf(vals, est)}")
      }
    }
    // pinned-replay invariants (driver r14 promotion): the gate pinned
    // the sorted views it emitted from, and every oracle-side check
    // holds — emitted quantiles ARE the pinned INCLUSIVE extraction,
    // pinned weights sum to the true per-type row count, and every
    // pinned item occurs in the source slice
    assert(AnalyticsQueries.kllRollupPins.nonEmpty,
      "the rollup gate must pin its sorted views")
    val pins = AnalyticsQueries.kllRollupPins.get
    assert(pins.map(_.eventType).sorted === rows.map(_.getString(0)).sorted.toSeq)
    rows.foreach { r =>
      val p = pins.find(_.eventType == r.getString(0)).get
      for ((q, idx) <- KllReplay.Ranks.zip(Seq(2, 3, 4)))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(idx)) ===
          java.lang.Double.doubleToLongBits(
            KllReplay.inclusiveQuantile(p.items, p.cumWeights, p.n, q)),
          s"${p.eventType} q=$q: emitted quantile must equal the pinned replay")
    }
    pins.foreach { p =>
      val vals = byType(p.eventType)
      assert(p.cumWeights.last === vals.length.toLong,
        s"${p.eventType}: pinned total weight must equal the true row count")
      val set = vals.toSet
      assert(p.items.forall(set.contains),
        s"${p.eventType}: every pinned item must occur in the source")
    }
  }

  test("KllReplay: INCLUSIVE extraction rule matches datasketches bit-exact across merge shapes") {
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
    // the natural rank must TAIL-ROUND to 7 decimals before ceil — a
    // plain ceil(q*N) mis-ranks 0.561*20000 = 11220.000000000002
    assert(KllReplay.naturalRank(0.561, 20000) === 11220L)
    val testQs = (0 to 2000).map(_ / 2000.0) ++ Seq(1e-12, 1 - 1e-12) ++ KllReplay.Ranks
    def check(sk: KllDoublesSketch): Unit = {
      val sv = sk.getSortedView
      val (items, cw) = (sv.getQuantiles, sv.getCumulativeWeights)
      testQs.foreach { q =>
        assert(java.lang.Double.doubleToLongBits(
            sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE)) ===
          java.lang.Double.doubleToLongBits(
            KllReplay.inclusiveQuantile(items, cw, sk.getN, q)),
          s"q=$q n=${sk.getN}")
      }
    }
    for (seed <- 1 to 4) {
      val rng = new java.util.Random(seed)
      val n = 1000 + rng.nextInt(30000)
      // the gate shape: ~30 daily partial sketches merged via bytes
      val merged = KllDoublesSketch.newHeapInstance(200)
      var part = KllDoublesSketch.newHeapInstance(200)
      val perDay = n / 30 + 1
      var c = 0
      (0 until n).foreach { _ =>
        val v = if (rng.nextBoolean()) math.floor(rng.nextDouble() * 1000) / 4.0
                else rng.nextDouble() * 500
        part.update(v); c += 1
        if (c == perDay) {
          merged.merge(KllDoublesSketch.heapify(Memory.wrap(part.toByteArray)))
          part = KllDoublesSketch.newHeapInstance(200); c = 0
        }
      }
      if (c > 0) merged.merge(KllDoublesSketch.heapify(Memory.wrap(part.toByteArray)))
      assert(merged.getN > merged.getNumRetained, "probe sketches must have compacted")
      check(merged)
    }
    // tie-heavy small-n edges around the k=200 compaction boundary
    for (n <- Seq(1, 2, 3, 199, 200, 201)) {
      val sk = KllDoublesSketch.newHeapInstance(200)
      (0 until n).foreach(i => sk.update((i % 3).toDouble))
      check(sk)
    }
  }

  test("events_hll_exact: coupon-mode guard fires and the estimate is the exact count") {
    val rows = run("events_hll_exact").collect()
    assert(rows.nonEmpty)
    assert(AnalyticsQueries.hllExactCoupon,
      "gate-scale union sketches must stay in coupon mode")
    val exact = Tables.events(spark, dir).where(col("user_id") < 300)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(2) === exact(r.getString(0)),
      s"${r.getString(0)}: coupon-mode estimate must truncate exact"))
    // the guard's byte check REJECTS a dense sketch: drive one past the
    // ~384-coupon union boundary and read its mode bits
    import spark.implicits._
    val dense = (0L until 5000L).toDF("id")
      .agg(hll_sketch_agg(col("id"), lit(12)).as("sk"))
      .select(hll_union_agg(col("sk")).as("usk"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(dense.length > 7 && dense(2) == 7 && (dense(7) & 3) == 2,
      "a 5000-distinct union sketch must read as dense HLL mode")
  }

  test("events_hll_rollup: regime measured in-gate; dense replica matches the library bit-exact") {
    val rows = run("events_hll_rollup").collect()
    assert(rows.nonEmpty)
    // sf0.001: 15 users/type — every union sketch stays in coupon mode
    // and the collision scan runs; the regime must never be unverified
    // at gate scale
    assert(AnalyticsQueries.hllRollupRegime !== "unverified")
    // dense path: the driver replica (murmur -> registers -> kxq ->
    // composite/bitmap) is DOUBLE-BIT-identical to the library on
    // 30-daily dense unions — the same algorithm the SQL oracle spells
    import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1200, 1500, 2000)) {
      val ids = Array.fill(n)(rnd.nextLong())
      val un = new Union(12)
      (0 until 30).foreach { _ =>
        val sk = new HllSketch(12, TgtHllType.HLL_8)
        ids.foreach(v => if (rnd.nextInt(3) != 0) sk.update(v))
        un.update(sk)
      }
      val out = un.getResult(TgtHllType.HLL_8)
      val b = out.toCompactByteArray()
      assert((b(7) & 3) == 2 && (b(5) & 16) != 0,
        "probe unions must land in the dense out-of-order regime")
      assert(java.lang.Double.doubleToLongBits(out.getEstimate) ===
        java.lang.Double.doubleToLongBits(HllReplay.replicaEstimate(ids.toSeq)),
        s"n=$n: replica must match the composite estimate bit-exact")
    }
    // the coupon-regime precondition instrument: full-coupon
    // distinctness over a gate-scale key set
    val ids2 = (0L until 1500L).map(HllReplay.coupon)
    assert(ids2.distinct.length === 1500)
  }

  test("events_kll_exact: all-retained guard fires and quantiles are order statistics") {
    val rows = run("events_kll_exact").collect()
    assert(rows.nonEmpty)
    assert(AnalyticsQueries.kllExactAllRetained,
      "gate-scale merged sketches must never compact")
    val byType = Tables.events(spark, dir)
      .where(col("user_id") < 12)
      .select(col("event_type"), col("value"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    rows.foreach { r =>
      val vals = byType(r.getString(0))
      for ((q, idx) <- Seq(0.5 -> 2, 0.95 -> 3, 0.99 -> 4)) {
        val want = vals(math.max(1, math.ceil(q * vals.length).toInt) - 1)
        assert(r.getDouble(idx) === want,
          s"${r.getString(0)} p$q: uncompacted quantile must be sorted[ceil(q*n)]")
      }
    }
    // the guard DETECTS compaction: overflow a k=200 sketch and observe
    // retained < N (the condition under which the oracle is withheld)
    val sk = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200)
    (0 until 1000).foreach(i => sk.update(i.toDouble))
    assert(sk.getN > sk.getNumRetained,
      "a 1000-item k=200 sketch must have compacted")
  }

  test("events_theta_churn: exact-mode sketch algebra equals set arithmetic") {
    val rows = run("events_theta_churn").collect()
    assert(rows.nonEmpty)
    val act = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .collect().groupBy(_.getDate(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    rows.foreach { r =>
      val day = r.getDate(0)
      val nextDay = java.sql.Date.valueOf(day.toLocalDate.plusDays(1))
      val (a, b) = (act(day), act(nextDay))
      assert(r.getLong(1) === (a -- b).size.toLong, s"churned@$day")
      assert(r.getLong(2) === (b -- a).size.toLong, s"added@$day")
      assert(r.getLong(3) === (a & b).size.toLong, s"retained@$day")
    }
  }

  test("theta sketches: union-agg rollup of partials equals direct sketch") {
    import graft.functions.theta
    val df = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"))
    val direct = df.groupBy("event_type")
      .agg(theta.estimate(theta.sketchAgg(col("user_id"))).cast("long").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rolled = df
      .groupBy(col("event_type"), (col("user_id") % 7).as("shard"))
      .agg(theta.sketchAgg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(theta.estimate(theta.unionAgg(col("sk"))).cast("long").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled === direct)
    val exact = df.groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(direct === exact) // exact mode below nominal entries
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

  test("q9_profit: item count matches the filtered join; profit formula holds") {
    val rows = run("q9_profit").collect()
    assert(rows.nonEmpty)
    val expect = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "part").where(col("p_name").contains("widget")),
        col("l_partkey") === col("p_partkey")).count()
    assert(rows.map(_.getLong(3)).sum === expect)
  }

  test("q11_part_value: every survivor exceeds the global threshold") {
    val rows = run("q11_part_value").collect()
    assert(rows.nonEmpty)
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val byPart = Tables(spark, dir, "lineitem")
      .groupBy("l_partkey").agg(Tables.moneySum(rev).as("v"))
    val total = byPart.agg(Tables.moneySum(col("v"))).collect()(0).getDouble(0)
    rows.foreach(r => assert(r.getDouble(1) > total * 0.001))
    val expect = byPart.where(col("v") > total * 0.001).count()
    assert(rows.length.toLong === expect)
  }

  test("q12_late_priority: class counts partition the late lineitems") {
    val rows = run("q12_late_priority").collect()
    val late = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === late.count())
    val high = late.where(col("o_orderpriority").isin("1-URGENT", "2-HIGH")).count()
    assert(rows.map(_.getLong(1)).sum === high)
  }

  test("q16_variety: negative-balance suppliers never counted") {
    val rows = run("q16_variety").collect()
    assert(rows.nonEmpty)
    val bad = Tables(spark, dir, "supplier")
      .where(col("s_acctbal") < 0.0).select("s_suppkey").collect()
      .map(_.getLong(0)).toSet
    // re-derive one group's distinct suppliers and compare
    val r0 = rows.head
    val suppliers = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .where(col("p_brand") === r0.getString(0) && col("p_size") === r0.getInt(1) &&
        col("p_type") =!= "PROMO")
      .select("l_suppkey").distinct().collect().map(_.getLong(0)).toSet
    assert((suppliers -- bad).size.toLong === r0.getLong(2))
  }

  test("q20_heavy_suppliers: survivors are exactly the qualifying supplier set") {
    val rows = run("q20_heavy_suppliers").collect()
    val expect = Tables(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .join(Tables(spark, dir, "part").where(col("p_name").startsWith("red")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey").agg(sum("l_quantity").as("q"))
      .where(col("q") > 50.0)
      .select("l_suppkey").distinct().collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet === expect)
  }

  test("q21_waiting: waits recount through an independent formulation") {
    val rows = run("q21_waiting").collect()
    assert(rows.length <= 10)
    // independent recount: late lineitems per (order, supplier), orders
    // with >=2 suppliers where exactly one is late
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")
    val j = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders").where(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"), late.as("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byOrder = j.groupBy(_._1)
    val waits = scala.collection.mutable.Map.empty[Long, Long]
    byOrder.foreach { case (_, ls) =>
      val supps = ls.map(_._2).toSet
      val lateSupps = ls.filter(_._3).map(_._2).toSet
      if (supps.size >= 2 && lateSupps.size == 1)
        waits(lateSupps.head) = waits.getOrElse(lateSupps.head, 0L) + 1
    }
    val names = Tables(spark, dir, "supplier").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expectTop = waits.toSeq.map { case (sk, n) => (names(sk), n) }
      .sortBy { case (name, n) => (-n, name) }.take(10)
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq === expectTop)
  }

  test("text_gopher: signals bounded and consistent with text_repetition") {
    val rows = run("text_gopher").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (1 to 4).foreach(i => assert(r.getDouble(i) >= 0.0 && r.getDouble(i) <= 1.0))
      // if the top bigram repeats, every one of its occurrences is a dup
      if (r.getDouble(1) > r.getDouble(4)) assert(r.getDouble(4) === 0.0)
    }
    val rep = run("text_repetition").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach(r => assert(rep(r.getLong(0)) === r.getDouble(1),
      "top2_ratio must equal the text_repetition signal"))
  }

  test("embed_cluster: every vector assigned once, seeds land in their own cluster") {
    val rows = run("embed_cluster").collect()
    val n = Tables(spark, dir, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum === n, "partition of the corpus")
    assert(rows.map(_.getLong(0)).toSet.subsetOf((0L until 8L).toSet))
    assert(rows.forall(_.getDouble(2) >= 0.0))
    // independent argmin for one vector: the seed itself -> dist 0
    import graft.functions.vec
    val e = Tables(spark, dir, "embeddings")
    val seeds = e.where(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), vec.vector(col("embedding")).as("cvec"))
    val self = e.where(col("vec_id") < 8)
      .select(col("vec_id"), vec.vector(col("embedding")).as("v"))
      .crossJoin(seeds)
      .select(col("vec_id"), col("cid"), vec.l2sq(col("v"), col("cvec")).as("d"))
      .groupBy("vec_id").agg(min(struct(col("d"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid"))
      .collect()
    self.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("events_active_users: WAU bounds DAU and matches a direct recount") {
    val rows = run("events_active_users").collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, dau, wau) => wau >= dau })
    // independent recount of one day's WAU via a direct range filter
    val (day, _, wau) = rows.maxBy(_._2)
    val expect = Tables.events(spark, dir)
      .where(to_date(col("ts")).between(date_sub(lit(day), 6), lit(day)))
      .select(col("user_id")).distinct().count()
    assert(wau === expect)
  }

  test("events_anomaly matches a driver-side median/MAD replay") {
    val rows = run("events_anomaly").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.nonEmpty)
    def med(xs: Array[Double]): Double = {
      val s = xs.sorted; val n = s.length
      // interpolated percentile at p=0.5: pos = 0.5*(n-1)
      val pos = 0.5 * (n - 1); val lo = pos.toInt
      if (lo == pos) s(lo) else s(lo) + (s(lo + 1) - s(lo)) * (pos - lo)
    }
    val expected = Tables.events(spark, dir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, vs) =>
        val x = vs.map(_._2)
        val m = med(x)
        val mad = med(x.map(v => math.abs(v - m)))
        t -> (x.length.toLong, x.count(v => math.abs(v - m) > 3.0 * mad).toLong)
      }
    assert(rows === expected)
    // anomalies must be a strict minority under a 3-MAD fence
    rows.foreach { case (t, (n, a)) => assert(a < n / 4, s"$t: $a of $n flagged") }
  }

  test("events_attribution matches a driver-side last-touch replay; revenue conserved") {
    val rows = run("events_attribution").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, dir)
      .select("user_id", "event_id", "ts", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
        r.getString(3), r.getDouble(4)))
    val touch = Set("click", "view", "signup")
    val credited = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      var last: String = null
      sorted.flatMap { e =>
        val out = if (e._4 == "purchase")
          Some((if (last == null) "direct" else last) -> e._5) else None
        if (touch(e._4)) last = e._4
        out
      }
    }
    val expected = credited.groupBy(_._1).map { case (ch, vs) =>
      ch -> (vs.length.toLong,
        vs.map(v => math.round(v._2 * 100)).sum.toDouble / 100.0)
    }
    assert(rows === expected)
    // attribution never invents or loses revenue
    val totalPurchases = ev.count(_._4 == "purchase").toLong
    assert(rows.values.map(_._1).sum === totalPurchases)
  }

  test("sales_cube: all four grouping combinations, consistent totals") {
    val rows = run("sales_cube").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)),
        Option(r.getString(1)), r.getLong(2), r.getLong(3)))
    val gids = rows.map(_._3).toSet
    assert(gids === Set(0L, 1L, 2L, 3L))
    val total = Tables(spark, dir, "orders").count()
    // grand total row counts everything; each slice partitions the corpus
    assert(rows.filter(_._3 == 3L).map(_._4).sum === total)
    assert(rows.filter(_._3 == 0L).map(_._4).sum === total)
    assert(rows.filter(_._3 == 1L).map(_._4).sum === total) // year subtotals
    assert(rows.filter(_._3 == 2L).map(_._4).sum === total) // priority subtotals
    // gid bit semantics: bit set <=> that dimension is rolled up (NULL)
    rows.foreach { case (y, p, gid, _) =>
      assert(((gid & 2L) != 0) === y.isEmpty, s"gid=$gid year=$y")
      assert(((gid & 1L) != 0) === p.isEmpty, s"gid=$gid prio=$p")
    }
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

  test("events_seasonality: hods in range, counts and shares reconcile per type") {
    val rows = graft.SparkEntry.queries("events_seasonality")(spark, dir).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    val rawByType = Tables.events(spark, dir).groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byType.foreach { case (t, rs) =>
      val hods = rs.map(_.getInt(1))
      assert(hods.forall(h => h >= 0 && h <= 23) && hods.distinct.length === hods.length)
      assert(rs.map(_.getLong(2)).sum === rawByType(t), s"counts for $t")
      val shares = rs.map(_.getLong(4)).sum
      // integer-floor share rounding loses < 1bp per populated hour
      assert(shares <= 10000L && shares > 10000L - hods.length, s"share sum $shares for $t")
    }
  }

  test("events_cart_abandonment: complement of in-hour conversions, per-day counts sane") {
    import org.apache.spark.sql.functions._
    val rows = graft.SparkEntry.queries("events_cart_abandonment")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) >= r.getLong(2) && r.getLong(2) > 0))
    // abandoned + converted = all clicks
    val e = Tables.events(spark, dir)
    val clicks = e.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("ct"))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pt"))
    val converted = clicks.join(purchases,
        col("user_id") === col("pu") && col("pt") > col("ct") &&
          col("pt") <= col("ct") + expr("INTERVAL 60 MINUTES"),
        "left_semi").count()
    assert(rows.map(_.getLong(1)).sum + converted === clicks.count())
  }

  test("events_weekly_profile: cells cover the corpus, dow/hod in range") {
    val rows = graft.SparkEntry.queries("events_weekly_profile")(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(rows.forall(r => r._2 >= 1 && r._2 <= 7 && r._3 >= 0 && r._3 <= 23))
    assert(rows.map(_._4).sum === Tables.events(spark, dir).count())
  }

  test("events_session_stats: one summary row reconciling with the sessionize rollup") {
    val r = graft.SparkEntry.queries("events_session_stats")(spark, dir).collect()
    assert(r.length === 1)
    val (nSess, meanFp, p50, bounceBp) =
      (r.head.getLong(0), r.head.getLong(1), r.head.getDouble(2), r.head.getLong(3))
    val sessions = graft.SparkEntry.queries("events_sessionize")(spark, dir).collect()
    assert(nSess === sessions.length.toLong)
    val events = Tables.events(spark, dir).count()
    assert(meanFp === events * 10000L / nSess)
    val bounces = sessions.count(_.getLong(2) == 1L)
    assert(bounceBp === bounces.toLong * 10000L / nSess)
    assert(p50 >= 0.0)
  }

  test("events_window_topk: per-bucket ranks dense, values descend, equal to the window replay") {
    import org.apache.spark.sql.functions._
    val rows = graft.SparkEntry.queries("events_window_topk")(spark, dir).collect()
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (0 until sorted.length))
      assert(sorted.map(_._4).toSeq === sorted.map(_._4).sortBy(-(_: Double)).toSeq)
    }
    // full window-sort replay over the raw events agrees row for row
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(col("value").desc, col("event_id"))
    val replay = Tables.events(spark, dir)
      .select(date_trunc("hour", col("ts")).as("bucket"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select(col("bucket"), (col("rn") - 1).as("rank"), col("event_id"), col("value"))
      .collect().map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.sorted.toSeq === replay.sorted.toSeq)
  }

  test("events_forecast_backtest: every type scored, MAE bounds the bias") {
    val rows = graft.SparkEntry.queries("events_forecast_backtest")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val types = Tables.events(spark, dir).select("event_type").distinct().count()
    assert(rows.length.toLong === types)
    rows.foreach { case (t, n, mae, bias) =>
      assert(n > 0 && mae >= 0)
      // |sum of signed errors| <= sum of |errors|; mae_fp floors away
      // up to (n-1)/10000 of that mass, hence the +n slack
      assert(math.abs(bias) * 10000L <= mae * n + n, s"$t bias $bias exceeds MAE mass")
    }
  }

  test("events_burst_users: flagged peaks replay from the raw hourly rollup") {
    import org.apache.spark.sql.functions._
    val rows = graft.SparkEntry.queries("events_burst_users")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val hourly = Tables.events(spark, dir)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val expected = hourly.groupBy(_._1).view.mapValues { hs =>
      hs.minBy(t => (-t._3, t._2.getTime))
    }.toMap.filter(_._2._3 > 2)
    assert(rows.map(_._1).toSet === expected.keySet)
    rows.foreach { case (u, n, h) =>
      assert(expected(u)._3 === n && expected(u)._2 === h, s"user $u peak drifted")
    }
  }

  test("events_ctr: per-day funnel counts reconcile and rates replay") {
    val rows = graft.SparkEntry.queries("events_ctr")(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (v, c, p, ctr, cvr) =>
      assert(ctr === c * 10000L / v)
      assert(cvr === p * 10000L / math.max(c, 1L))
    }
    val e = Tables.events(spark, dir)
    import org.apache.spark.sql.functions.col
    assert(rows.map(_._1).sum === e.where(col("event_type") === "view").count())
  }

  test("events_new_vs_returning: news sum to the user count, day one is all-new") {
    val rows = graft.SparkEntry.queries("events_new_vs_returning")(spark, dir).collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2))).sortBy(_._1.getTime)
    assert(rows.nonEmpty)
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(rows.map(_._2).sum === users, "every user is new exactly once")
    assert(rows.head._3 === 0L, "nobody returns on the first day")
  }

  test("events_concentration: heavy decile share bounded and above uniform") {
    val r = graft.SparkEntry.queries("events_concentration")(spark, dir).collect()
    assert(r.length === 1)
    val (nUsers, nHeavy, shareBp) = (r.head.getLong(0), r.head.getLong(1), r.head.getLong(2))
    assert(nHeavy === (nUsers + 9) / 10)
    assert(shareBp >= 10000L * nHeavy / nUsers, "top decile can't be below uniform share")
    assert(shareBp <= 10000L)
  }

  test("events_conversion_time: positive lags, mean within day extrema, converters bounded") {
    val rows = graft.SparkEntry.queries("events_conversion_time")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) > 0.0 && r.getLong(3) > 0L, "non-positive conversion lag")
    }
    // converting users can't exceed users who ever viewed AND purchased
    val e = Tables.events(spark, dir)
    import org.apache.spark.sql.functions.col
    val both = e.where(col("event_type") === "view").select("user_id").distinct()
      .intersect(e.where(col("event_type") === "purchase").select("user_id").distinct())
      .count()
    assert(rows.map(_.getLong(1)).sum <= both)
  }

  test("events_anomaly_seasonal: flags exceed 3 sigma of their own (type, hour) cell") {
    val rows = graft.SparkEntry.queries("events_anomaly_seasonal")(spark, dir).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3)) >= 2.9999, s"z ${r.getDouble(3)} under the fence")
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 23)
    }
    // flagged events are a small tail of the corpus
    val total = Tables.events(spark, dir).count()
    assert(rows.length < total / 20, s"${rows.length} of $total flagged — fence too loose")
  }

  test("dedup_best_copy: survivor is the best-quality copy, groups cover the corpus") {
    import org.apache.spark.sql.functions.col
    val rows = graft.SparkEntry.queries("dedup_best_copy")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = Tables(spark, dir, "documents").count()
    assert(rows.map(_._2).sum === total, "copies must partition the corpus")
    val quality = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        org.apache.spark.sql.functions.floor(
          graft.text.TextFunctions.qualityScore(col("text")) * 10000 + 0.5).as("q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (_, _, survivor, qfp) =>
      assert(quality(survivor) === qfp, s"survivor $survivor quality drifted")
    }
    // survivors of multi-copy groups beat (or tie) every other group member
    // (grouping is by the scrub-NORMALIZED hash — the key under which
    // quality can actually differ within a group)
    val hashes = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        org.apache.spark.sql.functions.md5(
          graft.text.TextFunctions.scrub(col("text"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val byHash = hashes.groupBy(_._2)
    rows.filter(_._2 > 1).foreach { case (h, _, survivor, qfp) =>
      byHash(h).foreach { case (id, _) =>
        assert(quality(id) < qfp || (quality(id) == qfp && id >= survivor),
          s"member $id beats survivor $survivor in group $h")
      }
    }
  }

  test("events_window_funnel: user counts conserve, depth>=1 matches the plain funnel") {
    def depths(q: String) = graft.SparkEntry.queries(q)(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    val con = depths("events_window_funnel")
    val unc = depths("events_funnel")
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(con.values.sum === users, "every user gets exactly one depth")
    // depth>=1 (any view exists) is the same predicate in both funnels;
    // deeper levels use EXISTS vs first-occurrence semantics and are
    // deliberately incomparable
    assert((1 to 3).map(con).sum === (1 to 3).map(unc).sum)
    assert(con(3) >= 0 && con(2) >= 0)
  }

  test("basket_pairs: ordered pair keys, support floor, lift replays from raw counts") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val rows = graft.SparkEntry.queries("basket_pairs")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)), "pairs must be (pa < pb)")
    assert(rows.forall(_.getLong(2) >= 3L), "support floor violated")
    val lifts = rows.map(_.getDouble(3)).toSeq
    assert(lifts === lifts.sorted.reverse, "not lift-descending")
    // replay the top pair's lift from the raw table
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val (pa, pb, cab, lift) =
      (rows.head.getLong(0), rows.head.getLong(1), rows.head.getLong(2), rows.head.getDouble(3))
    val nOrders = li.agg(countDistinct("ok")).head.getLong(0)
    val ca = li.where(col("pk") === pa).count()
    val cb = li.where(col("pk") === pb).count()
    val expect = BigDecimal(cab.toDouble * nOrders / (ca.toDouble * cb.toDouble))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(lift === expect, s"lift $lift vs replay $expect")
  }

  test("orders_cohort: diagonal completeness and active-count conservation") {
    val rows = graft.SparkEntry.queries("orders_cohort")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(2) >= 0, "order month precedes its cohort")
      assert(r.getLong(3) > 0 && r.getDouble(4) > 0.0)
    }
    // months_since = 0 cell exists for every cohort (the acquisition month itself)
    val cohorts = rows.map(_.getDate(0)).distinct
    val diag = rows.filter(_.getInt(2) == 0).map(_.getDate(0)).distinct
    assert(diag.toSet === cohorts.toSet)
    // month-0 actives across cohorts = total distinct customers
    val nCust = Tables(spark, dir, "orders").select("o_custkey").distinct().count()
    assert(rows.filter(_.getInt(2) == 0).map(_.getLong(3)).sum === nCust)
  }

  test("orders_fulfillment: line counts cover, lag stats ordered sanely") {
    val rows = graft.SparkEntry.queries("orders_fulfillment")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.map(_._2).sum === Tables(spark, dir, "lineitem").count())
    rows.foreach { case (_, n, p50, mean) =>
      assert(n > 0 && p50 >= 0.0 && mean >= 0L)
    }
  }

  test("supplier_pareto: ranks dense, cumulative share monotone and bounded") {
    val rows = graft.SparkEntry.queries("supplier_pareto")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1 to rows.length) && rows.length <= 10)
    assert(rows.map(_._3).toSeq === rows.map(_._3).sortBy(-(_: Double)).toSeq,
      "revenue must descend with rank")
    val shares = rows.map(_._4)
    assert(shares.toSeq === shares.sorted.toSeq && shares.last <= 10000L)
  }

  test("orders_aging: buckets partition the open orders, values positive") {
    import org.apache.spark.sql.functions.col
    val rows = graft.SparkEntry.queries("orders_aging")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._2).toSet.subsetOf(Set("0-90", "91-365", "365+")))
    rows.foreach(r => assert(r._3 > 0 && r._4 > 0.0))
    val open = Tables(spark, dir, "orders").where(col("o_orderstatus") =!= "F").count()
    assert(rows.map(_._3).sum === open, "buckets must partition the open set")
  }

  test("customer_rfm: scores in 1..4, near-unique monetary quartiles balance") {
    val rows = graft.SparkEntry.queries("customer_rfm")(spark, dir).collect()
    val nCust = Tables(spark, dir, "orders").select("o_custkey").distinct().count()
    assert(rows.length.toLong === nCust, "one row per ordering customer")
    rows.foreach { r =>
      Seq(r.getInt(1), r.getInt(2), r.getInt(3)).foreach(sc => assert(sc >= 1 && sc <= 4))
    }
    // m_cents is near-unique → quartile buckets within interpolation slack
    val m = rows.groupBy(_.getInt(3)).view.mapValues(_.length).toMap
    val q = nCust / 4.0
    (1 to 4).foreach { b =>
      assert(m.getOrElse(b, 0) >= q * 0.5 && m.getOrElse(b, 0) <= q * 1.5,
        s"m_score bucket $b size ${m.getOrElse(b, 0)} vs expected ~$q")
    }
  }

  test("events_dwell: gap counts reconcile to events minus users, extrema bound the mean") {
    val rows = graft.SparkEntry.queries("events_dwell")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mean, mn, mx) = (r.getDouble(2), r.getLong(3), r.getLong(4))
      assert(mn >= 0L, "negative inter-arrival gap")
      assert(mean >= mn - 1e-4 && mean <= mx + 1e-4, s"mean $mean outside [$mn, $mx]")
    }
    val ev = Tables.events(spark, dir)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum === expected, "each user contributes n-1 gaps")
  }

  test("events_changepoint: one split per type, replays the hourly mean-shift argmax") {
    val out = run("events_changepoint").collect()
      .map(r => r.getString(0) -> (r.getTimestamp(1), r.getDouble(2), r.getDouble(3))).toMap
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum(round(col("value") * 100).cast("long")).as("hc"), count(lit(1)).as("hn"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(out.keySet === hourly.keySet.filter(hourly(_).length > 1))
    hourly.foreach { case (t, hs) if hs.length > 1 =>
      val ord = hs.sortBy(_._2.getTime)
      val (ct, nt) = (ord.map(_._3).sum, ord.map(_._4).sum)
      var cs = 0L; var ci = 0L
      val scored = ord.init.map { h =>
        cs += h._3; ci += h._4
        val delta = math.abs(cs.toDouble / ci - (ct - cs).toDouble / (nt - ci))
        (h._2, math.floor(delta * 10000 + 0.5).toLong, cs, ci)
      }
      val bestPick = scored.maxBy(s => (s._2, -s._1.getTime.toDouble))
      def q4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gotH, gotB, gotA) = out(t)
      assert(gotH === bestPick._1, s"type $t split hour")
      assert(gotB === q4(bestPick._3.toDouble / 100.0 / bestPick._4))
      assert(gotA === q4((ct - bestPick._3).toDouble / 100.0 / (nt - bestPick._4)))
    case _ => ()
    }
  }
}
