package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables.{moneySum, moneySumSql, quant4, quant4Sql}

/**
 * Round-4 analytics surface: the remaining TPC-H-shaped plan families
 * (correlated/scalar subqueries, left-outer distributions, anti-joins,
 * rollup/pivot) plus cohort retention — the query shapes a warehouse
 * user of the reference's host engine (DuckDB) runs daily and expects
 * graft to cover. Adapted to the synthetic schema (no partsupp /
 * commitdate / phone columns — see TESTDATA.md).
 *
 * Plan notes (100 TB framing): every decorrelation here is explicit —
 * argmin-per-group via a window (one shuffle, no self-join),
 * scalar-aggregate thresholds via a 1-row broadcast join (never a
 * driver collect), NOT EXISTS via LEFT ANTI (one shuffle, AQE-eligible).
 */
object AnalyticsQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Z-order layout through the gate: lineitem re-clustered on the
    // (shipdate, partkey) Morton code (graft.sources.Layout — Delta/
    // Iceberg OPTIMIZE ZORDER BY shape), then a 2-D range predicate
    // reads it back. Every output file covers a tight rectangle in BOTH
    // dimensions, so parquet min/max stats skip files for either
    // predicate — a linear sort serves only its leading column; the
    // skipping ratio is spec-quantified (StorageLayoutSpec). The
    // ORACLE runs the same filter on the ORIGINAL table: a layout may
    // change what a scan skips, never what a filter selects.
    "layout_zorder" -> { (s, dir) =>
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_zorder_gate_${Tables.fingerprint(dir, "lineitem")}").getAbsolutePath
      // write-once per dataset (parquet _SUCCESS marker): like the
      // bucketed layout, clustering is paid at write time and every
      // later query reads the clustered files — the steady-state shape
      if (!new java.io.File(path, "_SUCCESS").isFile)
        graft.sources.Layout.writeZOrdered(
          Tables(s, dir, "lineitem"),
          datediff(col("l_shipdate"), lit("1992-01-01")),
          col("l_partkey"), path, numFiles = 16)
      s.read.parquet(path)
        .where(
          col("l_shipdate") >= lit("1995-01-01 00:00:00").cast("timestamp") &&
            col("l_shipdate") < lit("1996-01-01 00:00:00").cast("timestamp") &&
            col("l_partkey") >= 50 && col("l_partkey") < 120)
        .agg(
          moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("total_qty"))
    },
    // bucketed-layout co-located join: orders and lineitem persisted
    // hash-bucketed on the join key (write-once), then joined with NO
    // exchange on either side — the recurring fact-fact join shuffle
    // becomes a file-layout property (StorageLayoutSpec asserts the
    // exchange-free join). merge hint pins SortMergeJoin so the
    // bucketed path is exercised even where stats would broadcast.
    // Results are layout-independent -> exact oracle on the originals.
    "layout_bucketed" -> { (s, dir) =>
      val suffix = Tables.fingerprint(dir, "orders", "lineitem")
      val (ot, lt) = (s"graft_bkt_orders_$suffix", s"graft_bkt_lineitem_$suffix")
      if (!s.catalog.tableExists(ot)) {
        graft.sources.Layout.writeBucketed(
          Tables(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
          "o_orderkey", ot, numBuckets = 8)
        graft.sources.Layout.writeBucketed(
          Tables(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
          "l_orderkey", lt, numBuckets = 8)
      }
      s.table(ot).hint("merge")
        .join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
    },
    // TPC-H Q2 shape: cheapest part per brand. The correlated min
    // subquery decorrelates to a window min + equality filter: ONE
    // shuffle on p_brand instead of a self-join against a grouped copy.
    "q2_mincost" -> { (s, dir) =>
      val w = Window.partitionBy("p_brand")
      Tables(s, dir, "part")
        .withColumn("min_price", min("p_retailprice").over(w))
        .where(col("p_retailprice") === col("min_price"))
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
    },
    // TPC-H Q8 shape: yearly share of one supplier nation in the
    // revenue delivered to one customer region. Two conditional
    // cents-sums in a single aggregation pass; the share divides two
    // exact integers-as-doubles so it is order-independent.
    "q8_share" -> { (s, dir) =>
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val n1 = Tables(s, dir, "nation").select(
        col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val asiaCust = Tables(s, dir, "customer")
        .join(broadcast(Tables(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .select("c_custkey")
      // join ORDER matters without CBO: restrict orders to the ASIA
      // customer set FIRST (cuts the region's share of orders before
      // the expensive lineitem join), then join lineitem against the
      // reduced order set — Catalyst keeps the written order for inner
      // joins, so the selective join is placed where it prunes most
      val asiaOrders = Tables(s, dir, "orders")
        .join(asiaCust, col("o_custkey") === col("c_custkey"))
      Tables(s, dir, "lineitem")
        .join(asiaOrders, col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          moneySum(when(col("supp_nation") === "NATION_5", rev).otherwise(lit(0.0)))
            .as("nation_revenue"),
          moneySum(rev).as("total_revenue"),
          count(lit(1)).as("n_items"))
        .select(col("o_year"),
          (col("nation_revenue") * 100.0 / col("total_revenue")).as("mkt_share_pct"),
          col("nation_revenue"), col("total_revenue"), col("n_items"))
    },
    // TPC-H Q13 shape: distribution of per-customer counts of URGENT
    // orders. The filter lives in the LEFT JOIN's ON clause (filtering
    // after the join would silently turn it inner); count(o_orderkey)
    // counts only matches, so zero-order customers survive as c_count=0.
    "q13_custdist" -> { (s, dir) =>
      val o = Tables(s, dir, "orders").where(col("o_orderpriority") === "1-URGENT")
      Tables(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
    },
    // TPC-H Q15 shape: supplier(s) achieving the max quarterly revenue.
    // The scalar max decorrelates to a 1-row broadcast joined back on
    // equality — no driver collect, no second scan of lineitem.
    "q15_top_supplier" -> { (s, dir) =>
      val rev = Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-07-01 00:00:00").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("total_revenue"))
      val mx = rev.agg(max("total_revenue").as("mx"))
      rev.join(broadcast(mx), col("total_revenue") === col("mx"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    },
    // TPC-H Q17 shape: revenue impact of small-quantity lineitems for
    // one brand. The correlated per-part AVG decorrelates to a grouped
    // aggregate joined back on partkey (both sides shuffle once on the
    // key; the brand filter prunes the probe side before the join).
    "q17_small_qty" -> { (s, dir) =>
      val avgq = Tables(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("ak"))
        .agg((sum("l_quantity") / count(lit(1))).as("avg_qty"))
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part").where(col("p_brand") === "Brand#23"),
          col("l_partkey") === col("p_partkey"))
        .join(avgq, col("l_partkey") === col("ak"))
        .where(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg(moneySum(col("l_extendedprice")).as("small_revenue"),
          count(lit(1)).as("n_items"))
        .select(quant4(col("small_revenue") / 7.0).as("avg_yearly"),
          col("small_revenue"), col("n_items"))
    },
    // TPC-H Q22 shape: rich-but-idle customers per nation. Scalar
    // threshold (avg positive balance) via 1-row broadcast; NOT EXISTS
    // (no recent order) via LEFT ANTI join — one bounded shuffle.
    "q22_idle_rich" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val avgBal = c.where(col("c_acctbal") > 0.0)
        .agg((moneySum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
      val recent = Tables(s, dir, "orders")
        .where(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
      c.crossJoin(broadcast(avgBal))
        .where(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"), moneySum(col("c_acctbal")).as("totacctbal"))
    },
    // ROLLUP: subtotal lattice over (returnflag, linestatus) in one
    // pass — Spark expands grouping sets map-side, so the shuffle
    // carries partial aggregates per lattice level, not 3x the rows.
    "sales_rollup" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping_id().as("gid"),
          sum("l_quantity").as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("n"))
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "sum_price", "n")
    },
    // PIVOT: returnflag columns per linestatus. Enumerating the pivot
    // values skips the distinct-discovery job; the plan is a two-phase
    // aggregate where the second (pivotfirst) shuffle moves only the
    // already-grouped |statuses|x|flags| intermediate — scale-safe
    // because everything row-count-proportional is map-side combined
    // in phase one
    "sales_pivot" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum("l_quantity"))
        .select(col("l_linestatus"), col("A").as("qty_a"),
          col("N").as("qty_n"), col("R").as("qty_r"))
    },
    // rank-function family over one window spec: ntile quartiles,
    // percent_rank, cume_dist computed in a single per-customer sort —
    // Spark evaluates all three in one Window operator, one shuffle
    "window_ranks" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          quant4(percent_rank().over(w)).as("pct_rank"),
          quant4(cume_dist().over(w)).as("cume"))
    },
    // semi-structured nesting: lineitems collected per order as a
    // sorted array (collect_list -> sort_array -> array_join), emitted
    // as a deterministic signature string — the denormalize-then-nest
    // shape training-data export pipelines use. One shuffle on the
    // order key; the array is bounded by per-order fanout, not corpus
    // size.
    "nest_lineitems" -> { (s, dir) =>
      val sig = concat_ws(":",
        lpad(col("l_linenumber").cast("string"), 4, "0"),
        lpad(col("l_partkey").cast("string"), 10, "0"),
        lpad(col("l_quantity").cast("long").cast("string"), 4, "0"))
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), sig.as("sig"))
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("sig"))).as("items"),
          count(lit(1)).as("n_items"))
        .select(col("l_orderkey"), array_join(col("items"), "|").as("items_sig"),
          col("n_items"))
    },
    // sliding windows (1h length, 30m slide): every event lands in two
    // overlapping buckets; Spark's window() expands them map-side so
    // the aggregation still shuffles only partial sums per bucket
    "events_sliding" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("sum_value"))
        .select(col("w.start").as("bucket"), col("event_type"),
          col("n_events"), col("sum_value"))
    },
    // rolling active users (DAU + 7-day WAU per day): the activity
    // dashboard scan. WAU via the sliding-window expansion trick — each
    // distinct (user, day) activity registers into the 7 windows it
    // belongs to (scan-stage explode of 7 ints), then ONE distinct
    // aggregation per window end; no self-join, no range join, and the
    // expansion carries (day, user_id) pairs only. Exact oracle.
    "events_active_users" -> { (s, dir) =>
      val act = Tables.events(s, dir)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val dau = act.groupBy("day").agg(countDistinct("user_id").as("dau"))
      val wau = act
        .select(explode(sequence(lit(0), lit(6))).as("off"), col("day"), col("user_id"))
        .select(date_add(col("day"), col("off")).as("day"), col("user_id"))
        .groupBy("day").agg(countDistinct("user_id").as("wau"))
      dau.join(wau, Seq("day"))
    },
    // the REAGGREGATABLE-sketch rollup (Datasketches HLL, built into
    // Spark 4): per-(event_type, day) user sketches at the fine grain,
    // then a coarse per-type rollup that unions the SKETCHES — raw
    // user ids cross the first shuffle once and never again. This is
    // the 100 TB dashboard shape: daily sketch partitions are a few KB
    // each, persistable, and any coarser rollup (weekly, all-time,
    // cross-type) is a sketch union, not a rescan. Estimates are
    // sketch-specific -> rows-only; merge-vs-direct agreement is
    // spec-asserted (AnalyticsSpec).
    // PROMOTED to a regime-measured exact oracle (driver r14): the gate
    // reads each per-type union sketch's bytes and classifies the run —
    // DENSE (mode HLL + out-of-order flag): the estimate is the
    // composite estimator, a pure function of the register array, and
    // the oracle REPLAYS the whole chain (murmur3 → registers → kxq →
    // cubic interpolation → bitmap crossover) in SQL, [[HllReplay]];
    // COUPON (all unions still LIST/SET): the estimate truncates to the
    // coupon count, which equals the exact distinct count iff no 26-bit
    // coupon collides — measured with the driver-side murmur replica —
    // so the oracle is count(DISTINCT). Any other state (mixed regimes,
    // collision observed) withholds the oracle: rows-only, loud.
    "events_hll_rollup" -> { (s, dir) =>
      val e = Tables.events(s, dir)
      val daily = e
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      val rolled = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), hll_union_agg(col("sk")).as("usk"))
      val sketches = rolled.select("usk").collect().map(_.getAs[Array[Byte]](0))
      val famOk = sketches.nonEmpty && sketches.forall(b => b.length > 7 && b(2) == 7)
      hllRollupRegime =
        if (famOk && sketches.forall(b => (b(7) & 3) == 2 && (b(5) & 16) != 0)) "dense"
        else if (famOk && sketches.forall(b => (b(7) & 3) != 2)) {
          val ids = e.select(col("event_type"), col("user_id")).distinct().collect()
          val collisionFree = ids.groupBy(_.getString(0)).values.forall { rows =>
            val us = rows.map(_.getLong(1)).distinct
            us.map(HllReplay.coupon).distinct.length == us.length
          }
          if (collisionFree) "coupon" else "unverified"
        } else "unverified"
      rolled.select(col("event_type"), col("n_days"),
        hll_sketch_estimate(col("usk")).cast("long").as("est_users"))
        .orderBy("event_type")
    },
    // the HLL rollup's EXACT-TIER twin (VERDICT r13 #3a): the same
    // sketch pipeline — per-(type, day) Datasketches HLL, per-type
    // sketch UNION — on a slice bounded so every union sketch provably
    // stays in coupon (LIST/SET) mode, where the estimate is linear
    // counting over 2^26 slots: est = c + c^2/2^27 + ... for c observed
    // coupons, so the long cast truncates to the exact distinct count
    // (measured boundary: the union gadget promotes to dense HLL near
    // 384 coupons at lgK=12; user_id < 300 keeps every per-type slice
    // at <= 300 distinct at both SFs). The gate MEASURES the mode on
    // the union sketch bytes (the knn_hnsw precondition-guard pattern)
    // and withholds the exact oracle when any sketch went dense —
    // loudly rows-only, never false-exact.
    "events_hll_exact" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .where(col("user_id") < 300)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      val rolled = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), hll_union_agg(col("sk")).as("usk"))
      // Datasketches HLL preamble: byte 2 = family id (7 = HLL), byte 7
      // low 2 bits = curMode (0 LIST / 1 SET / 2 HLL) — assert every
      // per-type union sketch stayed in a coupon mode
      hllExactCoupon = rolled.select("usk").collect().forall { row =>
        val b = row.getAs[Array[Byte]](0)
        b.length > 7 && b(2) == 7 && (b(7) & 3) != 2
      }
      rolled.select(col("event_type"), col("n_days"),
        hll_sketch_estimate(col("usk")).cast("long").as("est_users"))
        .orderBy("event_type")
    },
    // the KLL rollup's EXACT-TIER twin (VERDICT r13 #3b): same sketch
    // pipeline — per-(type, day) KLL, per-type sketch MERGE — on a
    // slice bounded so no sketch (daily or merged) ever compacts:
    // below the first randomized compaction a KLL sketch retains the
    // full value multiset and INCLUSIVE quantiles are the order
    // statistics sorted[max(1, ceil(q*n))] (verified against
    // KllDoublesSketch on n in 1..200, incl. ties and q=0/1). The gate
    // MEASURES getN == getNumRetained on every merged sketch —
    // compaction observed -> oracle withheld, rows-only, loud.
    // user_id < 12 keeps per-type totals at 150-180 rows (< k=200) at
    // both SFs.
    "events_kll_exact" -> { (s, dir) =>
      import graft.functions.kll
      val daily = Tables.events(s, dir)
        .where(col("user_id") < 12)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(kll.sketchAgg(col("value")).as("sk"))
      val merged = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), kll.mergeAgg(col("sk")).as("msk"))
      kllExactAllRetained = merged.select("msk").collect().forall { row =>
        val sk = org.apache.datasketches.kll.KllDoublesSketch.heapify(
          org.apache.datasketches.memory.Memory.wrap(row.getAs[Array[Byte]](0)))
        sk.getN == sk.getNumRetained
      }
      merged.select(col("event_type"), col("n_days"),
        kll.quantiles(col("msk"), Seq(0.5, 0.95, 0.99)).as("q"))
        .select(col("event_type"), col("n_days"),
          col("q")(0).as("p50"), col("q")(1).as("p95"), col("q")(2).as("p99"))
        .orderBy("event_type")
    },
    // percentile ROLLUP from persisted sketches: per-(type, day) KLL
    // value sketches at the fine grain, per-type p50/p95/p99 by sketch
    // MERGE — raw values cross one shuffle once; weekly/all-time/
    // cross-tenant percentiles are KB-sized merges, never rescans.
    // PROMOTED to an exact pinned-replay oracle (driver r14): the
    // randomized compaction made scalar-vs-scalar comparison
    // RUN-nondeterministic, so — the builtHnswGraphsOf pattern — the
    // gate now runs the distributed rollup ONCE, pins each merged
    // sketch's sorted view, derives the emitted quantiles from that
    // same pinned state, and the oracle replays the INCLUSIVE
    // extraction from the injected (item, cumWeight) pairs while
    // independently re-deriving n, n_days, and item-membership from
    // the parquet (see KllReplay). Compaction still randomizes WHICH
    // values are retained; it can no longer diverge the two sides.
    "events_kll_rollup" -> { (s, dir) =>
      import graft.functions.kll
      import org.apache.datasketches.kll.KllDoublesSketch
      import org.apache.datasketches.memory.Memory
      import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(kll.sketchAgg(col("value")).as("sk"))
      val rolled = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), kll.mergeAgg(col("sk")).as("msk"))
        .collect() // one action; ≤ #event_types rows of KB-sized sketches
      val pins = rolled.map { r =>
        val sk = KllDoublesSketch.heapify(Memory.wrap(r.getAs[Array[Byte]](2)))
        val sv = sk.getSortedView
        KllReplay.Pin(r.getString(0), r.getLong(1), sk.getN,
          sv.getQuantiles, sv.getCumulativeWeights,
          KllReplay.Ranks.map(q =>
            sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE)))
      }.sortBy(_.eventType).toSeq
      kllRollupPins =
        if (pins.nonEmpty && pins.forall(p =>
          p.n > 0 && p.cumWeights.nonEmpty && p.cumWeights.last == p.n))
          Some(pins)
        else None
      import s.implicits._
      pins.map(p => (p.eventType, p.nDays, p.quantiles(0), p.quantiles(1),
          p.quantiles(2)))
        .toDF("event_type", "n_days", "p50", "p95", "p99")
        .orderBy("event_type")
    },
    // theta-sketch set ALGEBRA (union/intersection/difference — the
    // operations HLL cannot do): day-over-day churn of the active-user
    // set. Raw ids cross one shuffle into per-day sketches; churned /
    // added / retained are then sketch math over KB summaries — no
    // self-join of (day, user) pairs. In exact mode (daily actives <
    // 4096 nominal entries) theta estimates are exact, so this gates
    // against an exact anti-join oracle. The lead() window runs over
    // the AGGREGATED frame (#days rows), not raw events.
    "events_theta_churn" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(graft.functions.theta.sketchAgg(col("user_id")).as("sk"))
      val w = Window.orderBy("day")
      daily
        .withColumn("next_sk", lead(col("sk"), 1).over(w))
        .where(col("next_sk").isNotNull)
        .select(col("day"),
          graft.functions.theta.estimate(
            graft.functions.theta.aNotB(col("sk"), col("next_sk"))).cast("long").as("churned"),
          graft.functions.theta.estimate(
            graft.functions.theta.aNotB(col("next_sk"), col("sk"))).cast("long").as("added"),
          graft.functions.theta.estimate(
            graft.functions.theta.intersect(col("sk"), col("next_sk"))).cast("long").as("retained"))
    },
    // value-distribution histogram per event type: fixed-width bins in
    // ONE aggregation pass (bin id is a scan-stage projection, partial
    // counts combine map-side) — the profiling scan that sizes
    // percentile/zscore follow-ups without a sort. floor(x/50) is one
    // correctly-rounded IEEE op, so bins match the oracle bit-exactly.
    "events_histogram" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"), floor(col("value") / 50.0).cast("long").as("bin"))
        .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("sum_value"))
    },
    // anomaly screen: per-type z-scores against streaming-friendly
    // moment sums (count / cents-sum / cents-sum-of-squares — one
    // aggregation pass, order-independent by integer fixed-point),
    // then a broadcast join back flags |z| > 3. mean/std/z are chains
    // of correctly-rounded IEEE ops on identical inputs, so the oracle
    // compares exactly despite the floating point.
    // hour-of-day seasonality profile per event type (the diurnal
    // traffic fingerprint capacity planning and anomaly baselining both
    // start from): per (type, hour 0-23) the event count, cents-exact
    // mean value, and integer-bp share of the type's traffic. ONE
    // map-side-combined rollup to ≤ 24×|types| rows; the type totals
    // come from a WINDOW over the profile itself (plan-asserted single
    // raw-events scan — a separate totals rollup would recompute the
    // whole scan subtree), so at 100 TB the raw table is read once and
    // only profile rows ever shuffle again. Exact oracle: counts/shares
    // are integer, the mean is one fixed IEEE division chain over a
    // cents sum.
    "events_seasonality" -> { (s, dir) =>
      val cents = round(col("value") * 100).cast("long")
      Tables.events(s, dir)
        .groupBy(col("event_type"), hour(col("ts")).as("hod"))
        .agg(count(lit(1)).as("n_events"), sum(cents).as("sc"))
        .withColumn("n_type",
          sum("n_events").over(Window.partitionBy("event_type")))
        .select(col("event_type"), col("hod"), col("n_events"),
          quant4(col("sc").cast("double") / 100.0 / col("n_events").cast("double"))
            .as("mean_value"),
          expr("n_events * 10000L div n_type").as("share_bp"))
    },
    // market-basket pair mining (association rules over order baskets,
    // ranked by LIFT — the same integer-derived log-free ranking as
    // text_collocations): distinct (order, part) pairs self-join
    // CO-PARTITIONED on the order key, so the quadratic is bounded by
    // the basket size (≤7 items in TPC-H shape — never corpus-sized);
    // pair supports ≥ 3 join part supports (AQE-sized: the part
    // dimension outgrows broadcast at scale), lift quantizes, top-20
    // is a distributed TakeOrdered. Exact oracle: identical supports,
    // one IEEE lift chain, (lift, pa, pb) total tie order.
    "basket_pairs" -> { (s, dir) =>
      // r14 single-consumption shape (guide §2.4): the old
      // distinct-self-join spelled the SAME basket quadratic as four
      // independent consumers of a distinct (order, part) view — the
      // executed plan scanned lineitem 5x and re-ran the distinct 4x
      // (7 Exchanges; plans/r14/basket_pairs_before.txt). One
      // collect_set basket rollup (per-order distinct == the old
      // DISTINCT, map-side combined) now feeds pairs, per-part
      // supports, AND the basket count: 1 scan + 3 Exchanges, with
      // the upper-triangle pair explode in the reduce stage (the
      // dedup_winnow shape). Pair multiset, supports, lift chain and
      // tie order are unchanged — the oracle is untouched.
      val baskets = Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("ok"))
        .agg(array_sort(collect_set(col("l_partkey"))).as("parts"))
      val pairs = baskets
        .select(explode(flatten(transform(col("parts"), (x, i) =>
          transform(slice(col("parts"), i + lit(2), size(col("parts"))),
            y => struct(x.as("pa"), y.as("pb")))))).as("p"))
        .select(col("p.pa"), col("p.pb"))
      val cab = pairs.groupBy("pa", "pb").agg(count(lit(1)).as("c_ab"))
        .where(col("c_ab") >= 3)
      val cnt = baskets.select(explode(col("parts")).as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("c"))
      val n = baskets.agg(count(lit(1)).as("n_orders"))
      cab
        .join(cnt.select(col("pk").as("pa"), col("c").as("c_a")), "pa")
        .join(cnt.select(col("pk").as("pb"), col("c").as("c_b")), "pb")
        .crossJoin(broadcast(n))
        .select(col("pa"), col("pb"), col("c_ab"),
          quant4(col("c_ab").cast("double") * col("n_orders").cast("double") /
            (col("c_a").cast("double") * col("c_b").cast("double"))).as("lift"))
        .orderBy(col("lift").desc, col("pa"), col("pb"))
        .limit(20)
    },
    // acquisition-cohort revenue matrix (the finance twin of
    // events_retention's user-count cohorts): customers grouped by
    // first-order month, revenue and active-customer counts per
    // (cohort, order month). One customer-grain first-order rollup
    // joined back on custkey (AQE-sized: broadcast at test scale,
    // shuffle join when the customer dimension outgrows it), then one
    // map-side-combined matrix rollup — month-start dates make the
    // month arithmetic integer-exact on both engines.
    "orders_cohort" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate").cast("date").as("d"),
          col("o_totalprice"))
      val first = o.groupBy("o_custkey")
        .agg(date_trunc("month", min("d")).cast("date").as("cohort"))
      o.join(first, "o_custkey")
        .groupBy(col("cohort"), date_trunc("month", col("d")).cast("date").as("month"))
        .agg(countDistinct("o_custkey").as("n_active"),
          moneySum(col("o_totalprice")).as("revenue"))
        .select(col("cohort"), col("month"),
          months_between(col("month"), col("cohort")).cast("int").as("months_since"),
          col("n_active"), col("revenue"))
    },
    // fulfillment-lag distribution per priority: order date → line ship
    // date in integer days, count/mean/exact-interpolated median — the
    // SLA report. One orderkey join (AQE-planned), one priority rollup;
    // integer-day lags make p50 and mean IEEE-exact. Exact oracle.
    "orders_fulfillment" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_orderdate").cast("date").as("od"))
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_shipdate").cast("date").as("sd"))
        .join(o, "o_orderkey")
        .select(col("o_orderpriority"), datediff(col("sd"), col("od")).cast("long").as("lag"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          quant4(expr("percentile(lag, 0.5)")).as("p50_lag_days"),
          expr("sum(lag) div count(*)").as("mean_lag_days"))
    },
    // supplier revenue Pareto: top-10 suppliers by revenue with rank
    // and cumulative corpus share in integer bp — the concentration
    // curve behind "how exposed are we to supplier X". Revenue reduces
    // to cents per supplier map-side; the rank/cumsum window runs on
    // the supplier-dimension rollup. Exact.
    "supplier_pareto" -> { (s, dir) =>
      val rev = Tables(s, dir, "lineitem")
        .groupBy(col("l_suppkey").as("suppkey"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long")).as("cents"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cents").desc, col("suppkey"))
      val tot = rev.agg(sum("cents").as("total"))
      rev.crossJoin(broadcast(tot))
        .withColumn("rnk", row_number().over(w))
        .withColumn("cum", sum("cents").over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .where(col("rnk") <= 10)
        .select(col("rnk"), col("suppkey"),
          (col("cents").cast("double") / 100.0).as("revenue"),
          expr("(cum * 10000L) div total").as("cum_share_bp"))
    },
    // open-order aging matrix (the AR/backlog report): non-finalized
    // orders bucketed by age at the corpus horizon (≤90 / ≤365 / older
    // days) × priority, with counts and cents-exact value. The horizon
    // is max(o_orderdate) — computed once, broadcast — so the query is
    // reproducible on a frozen snapshot. One rollup; exact oracle.
    "orders_aging" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val horizon = o.agg(max(col("o_orderdate").cast("date")).as("h"))
      o.where(col("o_orderstatus") =!= "F")
        .crossJoin(broadcast(horizon))
        .select(col("o_orderpriority"), col("o_totalprice"),
          datediff(col("h"), col("o_orderdate").cast("date")).as("age_days"))
        .groupBy(col("o_orderpriority"),
          when(col("age_days") <= 90, "0-90")
            .when(col("age_days") <= 365, "91-365")
            .otherwise("365+").as("age_bucket"))
        .agg(count(lit(1)).as("n_orders"),
          moneySum(col("o_totalprice")).as("open_value"))
    },
    // RFM customer segmentation (recency / frequency / monetary
    // quartile scores — the classic warehouse marketing rollup): one
    // orders rollup to customer grain, quartile thresholds computed on
    // that DIMENSION-sized frame (orders of magnitude below the fact
    // table; swap approx_percentile in only past ~1e9 customers),
    // broadcast back, scan-stage CASE bucketing. Exact cross-engine:
    // all three metrics are integers and quarter-quantile interpolation
    // over integers is exact in IEEE (g ∈ {0,.25,.5,.75} and b−a are
    // all exact binaries), so boundary comparisons cannot ULP-flip.
    "customer_rfm" -> { (s, dir) =>
      val cents = round(col("o_totalprice") * 100).cast("long")
      val rfm = Tables(s, dir, "orders")
        .groupBy(col("o_custkey").as("custkey"))
        .agg(max(col("o_orderdate").cast("date")).as("last_date"),
          count(lit(1)).as("f"),
          sum(cents).as("m_cents"))
        .withColumn("r_days",
          datediff(lit("1998-12-31").cast("date"), col("last_date")).cast("long"))
      val th = rfm.agg(
        expr("percentile(r_days, array(0.25D, 0.5D, 0.75D))").as("rq"),
        expr("percentile(f, array(0.25D, 0.5D, 0.75D))").as("fq"),
        expr("percentile(m_cents, array(0.25D, 0.5D, 0.75D))").as("mq"))
      def hiGood(v: Column, q: Column) =
        when(v <= element_at(q, 1), 1).when(v <= element_at(q, 2), 2)
          .when(v <= element_at(q, 3), 3).otherwise(4)
      def loGood(v: Column, q: Column) =
        when(v <= element_at(q, 1), 4).when(v <= element_at(q, 2), 3)
          .when(v <= element_at(q, 3), 2).otherwise(1)
      rfm.crossJoin(broadcast(th))
        .select(col("custkey"),
          loGood(col("r_days").cast("double"), col("rq")).as("r_score"),
          hiGood(col("f").cast("double"), col("fq")).as("f_score"),
          hiGood(col("m_cents").cast("double"), col("mq")).as("m_score"))
    },
    // inter-arrival (dwell) statistics per event type: how long users
    // sit between consecutive events, attributed to the LATER event's
    // type — the engagement-cadence fingerprint sessionization/markov
    // don't expose. One user-keyed window shuffle carrying only
    // (user, type, id, epoch-µs longs), then a map-side-combined
    // per-type rollup of integer gaps. Exact oracle: ordering is the
    // total (ts µs, event_id) order on both engines, gaps/extrema are
    // integers, the mean is one IEEE division of two longs.
    "events_dwell" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("event_id"),
          expr("unix_micros(ts)").as("us"))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
        .where(col("gap_us").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          sum("gap_us").as("sg"),
          min("gap_us").as("min_gap_us"),
          max("gap_us").as("max_gap_us"))
        .select(col("event_type"), col("n_gaps"),
          // floor-on-double fixed point, NOT quant4: the mean sits at
          // ~4e10 (15 significant digits at 4 decimals), where Spark's
          // double→DECIMAL(18,4) (shortest-string, HALF_UP) and
          // DuckDB's (binary scale-and-round) can disagree on an exact
          // half-grid value — sf0.001's click mean x.59135 landed
          // .5914 vs .5913 (found in r14's green-tree audit; latent,
          // the driver-gated SFs never hit a boundary before). floor
          // of the identical double chain is bit-equal on any engine
          // (the dedup_best_copy precedent).
          (floor(col("sg").cast("double") / col("n_gaps").cast("double") * 10000 + 0.5)
            .cast("double") / 10000.0).as("mean_gap_us"),
          col("min_gap_us"), col("max_gap_us"))
    },
    // cart abandonment: clicks with NO purchase by the same user within
    // the next hour, rolled up per click day — the anti-funnel (the
    // time-bounded NOT EXISTS that events_window_funnel's EXISTS
    // mirrors). LEFT ANTI against the purchase frame on (user, range) —
    // one user-key shuffle per side, fan-out bounded per user. Exact.
    "events_cart_abandonment" -> { (s, dir) =>
      val e = Tables.events(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("ct"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pt"))
      clicks.join(purchases,
          clicks("user_id") === purchases("user_id") &&
            col("pt") > col("ct") &&
            col("pt") <= col("ct") + expr("INTERVAL 60 MINUTES"),
          "left_anti")
        .groupBy(to_date(col("ct")).as("day"))
        .agg(count(lit(1)).as("n_abandoned"),
          countDistinct(col("user_id")).as("n_users"))
    },
    // weekly traffic matrix: (day-of-week, hour-of-day) event counts
    // per type — the full weekly fingerprint events_seasonality's
    // hour-only profile flattens (Monday 9 a.m. ≠ Sunday 9 a.m.). One
    // map-side-combined rollup to ≤ 7×24×|types| rows. Exact.
    "events_weekly_profile" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"),
          dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hod"))
        .agg(count(lit(1)).as("n_events"),
          Tables.moneySum(col("value")).as("sum_value"))
    },
    // hourly top-k events by value through the bounded-heap aggregate
    // (the BATCH twin of streaming_topk, same TypedImperativeAggregate):
    // partial k-heaps merge map-side, so no hour's events are ever
    // fully sorted — the plan that holds when one hour has 1e9 events.
    // Deterministic ties (smaller id wins, = the oracle's
    // (value DESC, id) order) make it EXACT despite the custom agg.
    "events_window_topk" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("bucket"))
        .agg(graft.functions.vec
          .topk(3, col("value"), col("event_id"), ascending = false).as("top"))
        .select(col("bucket"), posexplode(col("top")).as(Seq("pos", "nn")))
        .select(col("bucket"), col("nn.rank").as("rank"),
          col("nn.label").as("event_id"), col("nn.distance").as("value"))
    },
    // seasonal-naive forecast BACKTEST (the q6 revenue forecast's
    // eval-twin on traffic): predict each hour's event count per type
    // as the SAME HOUR YESTERDAY, score MAE/bias over every scoreable
    // hour in integer fixed-point. One hourly rollup (map-side
    // combined), self-joined 24 h back on the (type, hour) key — at
    // 100 TB only (type, hour, count) triples move. Exact: counts and
    // errors are integers, MAE is one integer division.
    "events_forecast_backtest" -> { (s, dir) =>
      val hourly = Tables.events(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
      val pred = hourly.select(col("event_type").as("t"),
        (col("h") + expr("INTERVAL 24 HOURS")).as("h"), col("n").as("n_pred"))
      hourly.join(pred, col("event_type") === col("t") && hourly("h") === pred("h"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"),
          expr("(sum(abs(n - n_pred)) * 10000L) div count(*)").as("mae_fp"),
          expr("sum(n - n_pred)").as("bias"))
    },
    // burst / rate-cap audit: users whose busiest hour exceeds the cap
    // (the abuse/bot screen, and the per-key hot-spot detector for
    // stream sizing): one (user, hour) rollup with map-side combine,
    // then an argmax-by-struct per user — ties to the EARLIEST hour.
    // Exact oracle: integer counts, total (count desc, hour asc) order
    // folded into one struct max.
    "events_burst_users" -> { (s, dir) =>
      val cap = 2L
      val hourly = Tables.events(s, dir)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
      hourly
        .groupBy("user_id")
        .agg(max(struct(col("n"),
          (lit(0L) - expr("unix_micros(h)")).as("negh"))).as("m"))
        .select(col("user_id"), col("m.n").as("peak_events"),
          timestamp_micros(lit(0L) - col("m.negh")).as("peak_hour"))
        .where(col("peak_events") > cap)
    },
    // daily click-through and purchase rates in integer basis points
    // (THE funnel-health timeseries): one conditional-count rollup per
    // day — views/clicks/purchases never scan separately. Exact.
    "events_ctr" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(when(col("event_type") === "view", 1)).as("n_views"),
          count(when(col("event_type") === "click", 1)).as("n_clicks"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchases"))
        .where(col("n_views") > 0)
        .select(col("day"), col("n_views"), col("n_clicks"), col("n_purchases"),
          expr("(n_clicks * 10000L) div n_views").as("ctr_bp"),
          expr("(n_purchases * 10000L) div greatest(n_clicks, 1L)").as("cvr_bp"))
    },
    // two-sample conversion test (the A/B readout): users split by id
    // parity into variants, per-user converted flag, 2x2 contingency
    // counts, and the chi-square statistic computed as ONE division of
    // two exact DECIMAL(38) integers — n(ad-bc)^2 / ((a+b)(c+d)(a+c)
    // (b+d)) — so the float value is identical cross-engine (no
    // variance/sqrt chain to drift). Exact oracle incl. the statistic.
    "events_ab_test" -> { (s, dir) =>
      // "converted" = a heavy buyer: strictly above the corpus's per-user
      // purchase LOWER MEDIAN (rank (N+1) div 2, integer — no
      // interpolation to drift), derived IN-QUERY on both engines so the
      // split stays non-degenerate at any scale factor (a constant
      // threshold tuned to one SF can silently collapse the 2x2 table to
      // the chi2=0 branch elsewhere). Global window over the per-user
      // rollup: dimension-sized (|users|), never the events table.
      val pc = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purch"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("n_purch"), col("user_id"))
      val thrDf = pc.select(col("n_purch"),
          row_number().over(w).as("rn"),
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy()).as("n_users"))
        .where(col("rn") === expr("(n_users + 1) div 2"))
        .select(col("n_purch").as("thr"))
      val conv = pc.crossJoin(broadcast(thrDf))
        .select((col("user_id") % 2).as("variant"),
          when(col("n_purch") > col("thr"), 1L).otherwise(0L).as("converted"))
      val p = conv.agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("users_a"),
        sum(when(col("variant") === 0, col("converted")).otherwise(0L)).as("conv_a"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("users_b"),
        sum(when(col("variant") === 1, col("converted")).otherwise(0L)).as("conv_b"))
      def dec(c: Column) = c.cast("decimal(38,0)")
      val a = dec(col("conv_a"))
      val b = dec(col("users_a") - col("conv_a"))
      val c0 = dec(col("conv_b"))
      val d0 = dec(col("users_b") - col("conv_b"))
      val n = dec(col("users_a") + col("users_b"))
      val diff = a * d0 - b * c0
      // a degenerate margin (all users converted, or none) carries no
      // signal: chi-square is 0 by convention instead of 0/0
      val den = (a + b) * (c0 + d0) * (a + c0) * (b + d0)
      p.select(col("users_a"), col("conv_a"), col("users_b"), col("conv_b"),
        expr("(conv_a * 10000L) div users_a").as("conv_a_bp"),
        expr("(conv_b * 10000L) div users_b").as("conv_b_bp"),
        when(den === dec(lit(0)), lit(0.0))
          .otherwise(Tables.quant4((n * diff * diff).cast("double") / den.cast("double")))
          .as("chi2"))
    },
    // daily active users split NEW vs RETURNING (first-seen day per
    // user vs activity day) — the growth-accounting twin of
    // events_active_users. Two map-side-combined rollups: per-user
    // first day, then per (day, is_new) over distinct (user, day)
    // activity; only (user, day) pairs shuffle. Exact oracle.
    "events_new_vs_returning" -> { (s, dir) =>
      val e = Tables.events(s, dir)
      val activity = e.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val firstDay = activity.groupBy("user_id").agg(min("day").as("first_day"))
      activity.join(firstDay, "user_id")
        .groupBy("day")
        .agg(
          count(when(col("day") === col("first_day"), 1)).as("n_new"),
          count(when(col("day") =!= col("first_day"), 1)).as("n_returning"))
    },
    // activity concentration — what share of all events the heaviest
    // decile of users generates (the power-user / abuse-skew metric,
    // and the skew estimate that decides salting): heavy = the top
    // ceil(users/10) by the TOTAL (count desc, user_id) rank — pure
    // integer logic (an interpolated p90 threshold would hang the cut
    // on a 0.9·k product that isn't IEEE-exact). Per-user counts are
    // one map-side-combined rollup; the rank runs over the
    // dimension-sized user table. Exact oracle.
    "events_concentration" -> { (s, dir) =>
      val perUser = Tables.events(s, dir)
        .groupBy("user_id").agg(count(lit(1)).as("n"))
      val ranked = perUser.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("user_id"))))
      val tot = ranked.agg(count(lit(1)).as("n_users"), sum("n").as("total"))
      ranked.crossJoin(broadcast(tot))
        .where(col("rk") <= expr("(n_users + 9L) div 10L"))
        .groupBy("n_users")
        .agg(count(lit(1)).as("n_heavy_users"),
          expr("(sum(n) * 10000L) div first(total)").as("heavy_share_bp"))
        .select(col("n_users"), col("n_heavy_users"), col("heavy_share_bp"))
    },
    // time-to-convert: per user, first view → first purchase strictly
    // after it; lag distribution per purchase day (count, exact-
    // interpolated p50, integer mean). Two per-user min rollups
    // (map-side combined) + one day rollup — only (user, µs) longs
    // shuffle at any scale. Exact: lags are integer µs, p50
    // interpolation over integers at g ∈ {0,.5} is IEEE-exact, the
    // mean is integer division of two longs.
    "events_conversion_time" -> { (s, dir) =>
      val e = Tables.events(s, dir)
      val firstView = e.where(col("event_type") === "view")
        .groupBy("user_id").agg(min(expr("unix_micros(ts)")).as("vt"))
      val conv = e.where(col("event_type") === "purchase")
        .select(col("user_id"), expr("unix_micros(ts)").as("pt"))
        .join(firstView, "user_id")
        .where(col("pt") > col("vt"))
        .groupBy("user_id").agg(min("pt").as("pt"), min("vt").as("vt"))
      conv
        .select(col("user_id"),
          to_date(timestamp_micros(col("pt"))).as("day"),
          (col("pt") - col("vt")).as("lag_us"))
        .groupBy("day")
        .agg(count(lit(1)).as("n_conversions"),
          quant4(expr("percentile(lag_us, 0.5)")).as("p50_lag_us"),
          expr("sum(lag_us) div count(*)").as("mean_lag_us"))
    },
    // seasonal-baseline anomaly: each event scores against the
    // mean/std of ITS OWN (type, hour-of-day) cell instead of the
    // whole-type baseline — a 3 a.m. spike that looks normal against
    // the 24 h mix stands out against 3 a.m. history (and a peak-hour
    // value stops false-alarming). Same cents-fixed-point moment
    // machinery as events_zscore, keyed by (type, hod); the ≤24×|types|
    // stats table broadcasts back. Exact oracle.
    "events_anomaly_seasonal" -> { (s, dir) =>
      val cents = round(col("value") * 100).cast("long")
      val stats = Tables.events(s, dir)
        .groupBy(col("event_type").as("t"), hour(col("ts")).as("h"))
        .agg(count(lit(1)).as("n"), sum(cents).as("sc"), sum(cents * cents).as("ss"))
        .select(col("t"), col("h"),
          (col("sc").cast("double") / 100.0 / col("n").cast("double")).as("mean"),
          sqrt(
            (col("ss").cast("double") / 10000.0 / col("n").cast("double")) -
              (col("sc").cast("double") / 100.0 / col("n").cast("double")) *
              (col("sc").cast("double") / 100.0 / col("n").cast("double"))).as("std"))
      Tables.events(s, dir)
        .join(broadcast(stats),
          col("event_type") === col("t") && hour(col("ts")) === col("h"))
        .where(col("std") > 0.0 && abs(col("value") - col("mean")) > lit(3.0) * col("std"))
        .select(col("event_id"), col("event_type"), hour(col("ts")).as("hod"),
          quant4((col("value") - col("mean")) / col("std")).as("z"))
    },
    "events_zscore" -> { (s, dir) =>
      val cents = round(col("value") * 100).cast("long")
      val stats = Tables.events(s, dir)
        .groupBy(col("event_type").as("t"))
        .agg(count(lit(1)).as("n"), sum(cents).as("s"), sum(cents * cents).as("ss"))
        .select(col("t"),
          (col("s").cast("double") / 100.0 / col("n").cast("double")).as("mean"),
          sqrt(
            (col("ss").cast("double") / 10000.0 / col("n").cast("double")) -
              (col("s").cast("double") / 100.0 / col("n").cast("double")) *
              (col("s").cast("double") / 100.0 / col("n").cast("double"))).as("std"))
      Tables.events(s, dir)
        .join(broadcast(stats), col("event_type") === col("t"))
        .where(col("std") > 0.0 &&
          abs(col("value") - col("mean")) > lit(3.0) * col("std"))
        .select(col("event_id"), col("event_type"),
          quant4((col("value") - col("mean")) / col("std")).as("z"))
    },
    // TPC-H Q9 shape: profit by (nation, year) through a 5-way join.
    // The selective p_name filter joins FIRST (prunes lineitem before
    // the wider joins); profit = revenue minus a retail-price cost
    // proxy (the synthetic schema has no partsupp.ps_supplycost).
    "q9_profit" -> { (s, dir) =>
      val profit = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
        lit(0.1) * col("p_retailprice") * col("l_quantity")
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part").where(col("p_name").contains("widget")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(moneySum(profit).as("sum_profit"), count(lit(1)).as("n_items"))
    },
    // TPC-H Q11 shape: parts whose revenue exceeds a fraction of the
    // corpus total. The grouped table is computed ONCE; the global
    // scalar re-aggregates the (much smaller) per-part table and joins
    // back as a 1-row broadcast — never a second lineitem scan, never a
    // driver collect.
    "q11_part_value" -> { (s, dir) =>
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val byPart = Tables(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(moneySum(rev).as("part_value"))
      val tot = byPart.agg(moneySum(col("part_value")).as("total_value"))
      byPart.crossJoin(broadcast(tot))
        .where(col("part_value") > col("total_value") * lit(0.001))
        .select(col("l_partkey"), col("part_value"))
    },
    // TPC-H Q12 shape: late-shipment priority audit — conditional
    // two-class counts after a ship-vs-order date join predicate. One
    // equi-join shuffle; the date arithmetic is a join residual.
    "q12_late_priority" -> { (s, dir) =>
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
    },
    // TPC-H Q16 shape: supplier variety per (brand, size) — a distinct
    // aggregate over a join, minus an excluded supplier set via LEFT
    // ANTI (the NOT IN decorrelation; Spark's two-phase distinct agg
    // shuffles (group, supplier) pairs once, then counts).
    "q16_variety" -> { (s, dir) =>
      val bad = Tables(s, dir, "supplier")
        .where(col("s_acctbal") < 0.0).select(col("s_suppkey").as("bad_key"))
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part")
            .where(col("p_type") =!= "PROMO" && col("p_size").isin(1, 5, 10, 15, 20, 25)),
          col("l_partkey") === col("p_partkey"))
        .join(bad, col("l_suppkey") === col("bad_key"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    },
    // TPC-H Q20 shape: nested aggregate-threshold semi-join chain —
    // suppliers who shipped a heavy volume of any 'red' part in 1997.
    // The inner grouped-filter produces a small supplier-id set; the
    // outer supplier table joins LEFT SEMI against it (one bounded
    // shuffle, no duplication regardless of how many parts qualify).
    "q20_heavy_suppliers" -> { (s, dir) =>
      val qualified = Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        .join(Tables(s, dir, "part").where(col("p_name").startsWith("red"))
          .select("p_partkey"), col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum("l_quantity").as("qty"))
        .where(col("qty") > 50.0)
        .select("l_suppkey")
      Tables(s, dir, "supplier")
        .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(Tables(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    },
    // TPC-H Q21 shape: the only-late-supplier audit. The classic
    // EXISTS/NOT-EXISTS double self-join decorrelates to two grouped
    // passes: per (order, supplier) lateness first — a plain aggregate
    // with map-side combine — then per order. Two distinct-counts in
    // one aggregate would instead plan an Expand (3x the join output
    // shuffled); the two-level form moves each row once at full width
    // and once per distinct supplier. Top-10 runs as
    // TakeOrderedAndProject (no global sort at scale).
    "q21_waiting" -> { (s, dir) =>
      val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")
      val perSupp = Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "orders").where(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max(when(late, 1L).otherwise(0L)).as("is_late"))
      val per = perSupp.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"),
          sum(col("is_late")).as("n_late"),
          max(when(col("is_late") === 1L, col("l_suppkey"))).as("late_supp"))
        .where(col("n_supp") >= 2 && col("n_late") === 1)
      per.groupBy("late_supp")
        .agg(count(lit(1)).as("numwait"))
        .join(Tables(s, dir, "supplier"), col("late_supp") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(10)
    },
    // cohort retention: users bucketed by first-active day, distinct
    // users per (cohort, day-offset). The (user, day) distinct bounds
    // state to one row per user-day; the cohort join shuffles only that
    // deduplicated activity table, never raw events.
    "events_retention" -> { (s, dir) =>
      val d = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val first = d.groupBy("user_id").agg(min("day").as("cohort_day"))
      d.join(first, "user_id")
        .select(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
        .groupBy("cohort_day", "day_offset")
        .agg(count(lit(1)).as("n_users"))
    },
    // session path mining (product-analytics "top paths"): most common
    // within-session event-type trigrams. Sessionize by 30-min gap
    // (events_sessionize's exact logic), two leads inside each session,
    // one global rollup. Corpus-wide movement = the user_id window
    // shuffle sessionize already pays + the (user, session) window that
    // AQE-coalesces off its output; the path rollup shuffles one row
    // per distinct path per partition (map-side combine).
    "events_top_paths" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val sess = Tables.events(s, dir)
        .withColumn("prev_ts", lag("ts", 1).over(byUser))
        .withColumn("new_session",
          (col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 1800L).cast("int"))
        .withColumn("session_seq", sum("new_session").over(byUser))
      val bySess = Window.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
      sess
        .withColumn("e2", lead("event_type", 1).over(bySess))
        .withColumn("e3", lead("event_type", 2).over(bySess))
        .where(col("e3").isNotNull)
        // concat (not concat_ws): a NULL event_type must propagate to a
        // NULL path like the oracle's ||, never silently collapse a
        // trigram into a bigram
        .select(concat(col("event_type"), lit(">"), col("e2"), lit(">"), col("e3")).as("path"))
        .groupBy("path")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(10)
    },
    // sequence pattern matching (MATCH_RECOGNIZE-lite): each user's
    // event-time-ordered type sequence becomes a compact symbol string
    // (one char per known type), and a regex counts non-overlapping
    // occurrences of view -> (anything)* -> purchase-within-3 — the CEP
    // query shape warehouses bolt onto funnels. ONE user-keyed
    // aggregation builds the string (collect_list is order-agnostic;
    // array_sort on (ts, event_id) structs restores event order
    // deterministically inside the aggregate, so no window pre-sort
    // shuffle); the regex scan runs over |users| tiny strings. The
    // per-user string is bounded by that user's event count — the same
    // per-key-bounded-state assumption sessionize/funnel already make.
    "events_pattern" -> { (s, dir) =>
      val sym = when(col("event_type") === "view", "v")
        .when(col("event_type") === "click", "c")
        .when(col("event_type") === "purchase", "p")
        .otherwise("x")
      val seqStr = array_join(
        transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"), sym.as("s")))),
          x => x.getField("s")), "")
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(seqStr.as("seq"))
        .select(col("user_id"), length(col("seq")).as("n_events"),
          size(regexp_extract_all(col("seq"), lit("v[^p]{0,2}p"), lit(0)))
            .as("n_quick_conversions"))
        .where(col("n_quick_conversions") > 0)
    },
    // time-series gap filling + forward fill (the dashboard/feature-
    // pipeline step between raw events and models that assume dense
    // series): hourly rollup per type, then each type's [min, max] hour
    // range becomes a generated spine, missing buckets join in as
    // zero-count rows and carry the last observed sum forward. The only
    // corpus-scale movement is the map-side-combined hourly rollup —
    // spine generation and the fill window run over the tiny aggregate
    // (|types| x hours rows). value sums are cents-fixed-point
    // (moneySum), so fills replay bit-identically in the oracle.
    "events_gap_fill" -> { (s, dir) =>
      val hourly = Tables.events(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_events"), Tables.moneySum(col("value")).as("value_sum"))
      val spine = hourly.groupBy("event_type")
        .agg(min("hour").as("h0"), max("hour").as("h1"))
        .select(col("event_type"),
          explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hour"))
      val joined = spine.join(hourly, Seq("event_type", "hour"), "left")
      val w = Window.partitionBy("event_type").orderBy("hour")
      joined.select(
        col("event_type"), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("n_events").isNull.as("filled"),
        coalesce(col("value_sum"), lit(0.0)).as("value_sum"),
        last(col("value_sum"), ignoreNulls = true).over(w).as("carry_sum"))
    },
    // next-event transition matrix (first-order Markov chain over event
    // types): the sequence statistic behind session-flow diagrams and
    // synthetic-session generators. ONE user_id window (per-user state
    // is a single lead row, so the window scales by user partitioning)
    // feeds a map-side-combined (from,to) rollup — corpus-wide movement
    // is the user shuffle plus |types|^2 aggregate rows. p_trans is one
    // IEEE division of two exact longs (correctly rounded in both
    // engines); the row-count normalizer windows over the TINY aggregate.
    "events_markov" -> { (s, dir) =>
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .withColumn("to_type", lead("event_type", 1).over(byUser))
        .where(col("to_type").isNotNull)
        .select(col("event_type").as("from_type"), col("to_type"))
        .groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("n_trans"))
        .withColumn("p_trans",
          col("n_trans").cast("double") /
            sum("n_trans").over(Window.partitionBy("from_type")).cast("double"))
    },
    // CUBE over (year, priority): all four grouping combinations in ONE
    // Expand + one shuffle (4x the aggregate rows, never 4 scans).
    // grouping_id bit-parity with DuckDB GROUPING, like sales_rollup.
    "sales_cube" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .cube(year(col("o_orderdate")).as("o_year"), col("o_orderpriority"))
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n_orders"),
          moneySum(col("o_totalprice")).as("sum_price"))
        .select("o_year", "o_orderpriority", "gid", "n_orders", "sum_price")
    },
    // robust outlier detection per event type: median + MAD (the
    // skew-immune twin of events_zscore's mean/std). Exact interpolated
    // medians need a sort, but only WITHIN each type partition — two
    // bounded passes over the value column (med, then MAD over |v-med|),
    // each a per-type sort-aggregate; the per-type scalars ride back as
    // 1-row-per-type broadcast joins (never a driver collect). The
    // anomaly comparison runs on raw doubles: both engines compute med
    // and MAD from identical inputs with the same interpolation formula,
    // so the flag is deterministic; output scalars quantize for the hash.
    // mean-shift changepoint per event type (binary segmentation's
    // first split): the hour boundary maximizing |mean(before) −
    // mean(after)| over the (hour)-ordered series. Scale-safe by
    // construction: raw events reduce MAP-SIDE to per-(type, hour)
    // cents-sum + count first (one small shuffle), so the ordered
    // window runs over hours-per-type rows, never raw events — the
    // shape that survives 1e12-events-per-type. All sums are exact
    // longs; the split score quantizes to fixed point before the
    // argmax (ties to the earliest hour), so the chosen split is
    // bit-stable cross-engine and the whole chain oracles exactly.
    "events_changepoint" -> { (s, dir) =>
      val hourly = Tables.events(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(sum(round(col("value") * 100).cast("long")).as("hc"),
          count(lit(1)).as("hn"))
      val ord = Window.partitionBy("event_type").orderBy(col("h"))
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = hourly.groupBy("event_type")
        .agg(sum("hc").as("ct"), sum("hn").as("nt"), count(lit(1)).as("nh"))
      val scored = hourly
        .withColumn("cs", sum(col("hc")).over(run))
        .withColumn("ci", sum(col("hn")).over(run))
        .withColumn("hi", row_number().over(ord).cast("long"))
        .join(broadcast(tot), "event_type")
        .where(col("hi") < col("nh"))
        .withColumn("delta",
          abs(col("cs").cast("double") / col("ci").cast("double")
            - (col("ct") - col("cs")).cast("double") / (col("nt") - col("ci")).cast("double")))
        .withColumn("dq", floor(col("delta") * 10000 + 0.5).cast("long"))
      val best = Window.partitionBy("event_type").orderBy(col("dq").desc, col("h").asc)
      scored.withColumn("rn", row_number().over(best)).where(col("rn") === 1)
        .select(col("event_type"), col("h").as("split_hour"),
          quant4(col("cs").cast("double") / 100.0 / col("ci").cast("double"))
            .as("mean_before"),
          quant4((col("ct") - col("cs")).cast("double") / 100.0
            / (col("nt") - col("ci")).cast("double")).as("mean_after"))
    },
    "events_anomaly" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val med = ev.groupBy(col("event_type").as("t"))
        .agg(expr("percentile(value, 0.5)").as("med"))
      val withMed = ev.join(broadcast(med), col("event_type") === col("t")).drop("t")
      val mad = withMed.groupBy(col("event_type").as("t"))
        .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
      withMed.join(broadcast(mad), col("event_type") === col("t")).drop("t")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(abs(col("value") - col("med")) > lit(3.0) * col("mad"), 1L)
            .otherwise(0L)).as("n_anomalies"),
          quant4(first("med")).as("med"),
          quant4(first("mad")).as("mad"))
    },
    // last-touch revenue attribution: each purchase credits the user's
    // most recent preceding touch event (click/view/signup), 'direct'
    // when none precedes. ONE per-user window (same shuffle the
    // sessionize/markov family rides) computes the carried channel; the
    // rollup is |channels| rows with map-side combine. Cents-fixed-point
    // revenue keeps the sum order-independent.
    "events_attribution" -> { (s, dir) =>
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .withColumn("channel",
          last(when(col("event_type").isin("click", "view", "signup"),
            col("event_type")), ignoreNulls = true).over(byUser))
        .where(col("event_type") === "purchase")
        .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"), moneySum(col("value")).as("revenue"))
    },
    // small-file compaction (OPTIMIZE/bin-pack): the table-maintenance
    // op a streaming ingest demands — micro-batch sinks leave thousands
    // of KB-sized files whose open/footer cost dominates scans at 100 TB.
    // A fragmented copy (64 files) is bin-packed to size-targeted files
    // via coalesce (NO shuffle — packing is a file-boundary change, not
    // a repartition; at scale it runs per partition-dir). Write-once like
    // the other layout gates; the oracle runs the same aggregate on the
    // ORIGINAL table because compaction must never change table contents.
    "layout_compact" -> { (s, dir) =>
      val base = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_compact_gate_${Tables.fingerprint(dir, "lineitem")}").getAbsolutePath
      val compacted = s"$base/compacted"
      if (!new java.io.File(compacted, "_SUCCESS").isFile) {
        val frag = s"$base/frag"
        if (!new java.io.File(frag, "_SUCCESS").isFile)
          Tables(s, dir, "lineitem").repartition(64)
            .write.mode("overwrite").parquet(frag)
        graft.sources.Layout.compact(s, frag, compacted,
          targetFileBytes = 64L << 20)
      }
      s.read.parquet(compacted)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("total_qty"),
          moneySum(col("l_extendedprice")).as("sum_price"))
    })

  /** whether every events_hll_exact union sketch stayed in coupon mode
    * this run (measured on the sketch bytes in-gate); false until the
    * gate runs → exact oracle withheld, rows-only */
  @volatile private[queries] var hllExactCoupon: Boolean = false

  /** whether every events_kll_exact merged sketch retained ALL values
    * this run (getN == getNumRetained — no randomized compaction);
    * false until the gate runs → exact oracle withheld, rows-only */
  @volatile private[queries] var kllExactAllRetained: Boolean = false

  /** pinned sorted views of the last events_kll_rollup run (one action
    * built them; the emitted quantiles derive from the same pins) —
    * None until the gate runs, or when a pin failed its own weight
    * invariant → replay oracle withheld, rows-only */
  @volatile private[queries] var kllRollupPins: Option[Seq[KllReplay.Pin]] = None

  /** exact-distinct twin of the bounded-slice HLL rollup: in coupon
    * mode the truncated estimate IS the distinct count (see the gate) */
  private val hllExactOracle: String =
    """WITH e AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
      |  FROM events WHERE user_id < 300)
      |SELECT event_type, count(DISTINCT day) AS n_days,
      |  count(DISTINCT user_id) AS est_users
      |FROM e GROUP BY 1 ORDER BY 1""".stripMargin

  /** exact order-statistics twin of the bounded-slice KLL rollup: an
    * uncompacted sketch's INCLUSIVE quantile is sorted[max(1,ceil(q*n))] */
  private val kllExactOracle: String =
    """WITH e AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, "value" AS v
      |  FROM events WHERE user_id < 12),
      |n AS (SELECT event_type, count(DISTINCT day) AS n_days, count(*) AS n
      |      FROM e GROUP BY 1),
      |r AS (SELECT event_type, v,
      |        row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn
      |      FROM e)
      |SELECT n.event_type, n.n_days,
      |  max(CASE WHEN r.rn = GREATEST(1, CAST(ceil(0.50 * n.n) AS BIGINT)) THEN r.v END) AS p50,
      |  max(CASE WHEN r.rn = GREATEST(1, CAST(ceil(0.95 * n.n) AS BIGINT)) THEN r.v END) AS p95,
      |  max(CASE WHEN r.rn = GREATEST(1, CAST(ceil(0.99 * n.n) AS BIGINT)) THEN r.v END) AS p99
      |FROM n JOIN r USING (event_type)
      |GROUP BY n.event_type, n.n_days ORDER BY event_type""".stripMargin

  /** measured estimate regime of the last events_hll_rollup run:
    * "dense" (all unions composite-path), "coupon" (all unions in
    * coupon mode AND collision-free), or "unverified" (mixed / gate
    * not run / collision) → oracle withheld */
  @volatile private[queries] var hllRollupRegime: String = "unverified"

  private def hllRollupOracle: Map[String, String] = hllRollupRegime match {
    case "dense" => Map("events_hll_rollup" -> HllReplay.denseOracleSql(
      "SELECT event_type, user_id FROM events",
      "SELECT event_type, count(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS n_days " +
        "FROM events GROUP BY 1"))
    case "coupon" => Map("events_hll_rollup" ->
      """SELECT event_type,
        |  count(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS n_days,
        |  count(DISTINCT user_id) AS est_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
    case _ =>
      System.err.println(
        "[graft] events_hll_rollup oracle withheld: union sketches in a " +
          "mixed/unverified estimate regime this run — rows-only")
      Map.empty
  }

  def oracles: Map[String, String] = {
    if (!hllExactCoupon) System.err.println(
      "[graft] events_hll_exact oracle withheld: a union sketch left " +
        "coupon mode this run (or the gate did not run) — rows-only")
    if (!kllExactAllRetained) System.err.println(
      "[graft] events_kll_exact oracle withheld: a merged sketch " +
        "compacted this run (or the gate did not run) — rows-only")
    if (kllRollupPins.isEmpty) System.err.println(
      "[graft] events_kll_rollup oracle withheld: no pinned sorted " +
        "views this run (gate not run, or a pin broke its weight " +
        "invariant) — rows-only")
    staticOracles ++ hllRollupOracle ++
      (if (hllExactCoupon) Map("events_hll_exact" -> hllExactOracle) else Map.empty) ++
      (if (kllExactAllRetained) Map("events_kll_exact" -> kllExactOracle) else Map.empty) ++
      kllRollupPins.map(p =>
        Map("events_kll_rollup" -> KllReplay.rollupOracleSql(p))).getOrElse(Map.empty)
  }

  private def staticOracles: Map[String, String] = Map(
    // identical 2x2 fold + the chi-square as one HUGEINT-exact division
    "events_ab_test" ->
      """WITH pc AS (
        |  SELECT user_id,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purch
        |  FROM events GROUP BY user_id
        |), r AS (
        |  SELECT n_purch, row_number() OVER (ORDER BY n_purch, user_id) AS rn,
        |         count(*) OVER () AS n_users
        |  FROM pc
        |), t AS (SELECT n_purch AS thr FROM r WHERE rn = (n_users + 1) // 2),
        |v AS (
        |  SELECT user_id % 2 AS variant,
        |    CASE WHEN n_purch > t.thr THEN 1 ELSE 0 END AS converted
        |  FROM pc, t),
        |p AS (
        |  SELECT
        |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS users_a,
        |    CAST(sum(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
        |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS users_b,
        |    CAST(sum(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM v),
        |h AS (
        |  SELECT users_a, conv_a, users_b, conv_b,
        |    conv_a::HUGEINT AS a, (users_a - conv_a)::HUGEINT AS b,
        |    conv_b::HUGEINT AS c, (users_b - conv_b)::HUGEINT AS d,
        |    (users_a + users_b)::HUGEINT AS n
        |  FROM p)
        |SELECT users_a, conv_a, users_b, conv_b,
        |  CAST((conv_a * 10000) // users_a AS BIGINT) AS conv_a_bp,
        |  CAST((conv_b * 10000) // users_b AS BIGINT) AS conv_b_bp,
        |  CASE WHEN (a+b) * (c+d) * (a+c) * (b+d) = 0 THEN 0.0
        |    ELSE CAST(CAST(CAST(n * (a*d - b*c) * (a*d - b*c) AS DOUBLE)
        |      / CAST((a+b) * (c+d) * (a+c) * (b+d) AS DOUBLE)
        |      AS DECIMAL(18,4)) AS DOUBLE) END AS chi2
        |FROM h""".stripMargin,
    // the SAME filter over the ORIGINAL table: the z-ordered copy must
    // select identical rows or the layout broke the data
    "layout_zorder" ->
      s"""SELECT ${moneySumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  count(*) AS n_items,
         |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_partkey >= 50 AND l_partkey < 120""".stripMargin,
    // layout-independent: the bucketed tables hold the same rows, so
    // the oracle is the plain join over the originals
    "layout_bucketed" ->
      s"""SELECT o_orderpriority,
         |  ${moneySumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  count(*) AS n_items
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderpriority""".stripMargin,
    "q2_mincost" ->
      """SELECT p_brand, p_partkey, p_name, p_retailprice
        |FROM part
        |QUALIFY p_retailprice = min(p_retailprice) OVER (PARTITION BY p_brand)""".stripMargin,
    "q8_share" ->
      s"""WITH asia_cust AS (
         |  SELECT c_custkey FROM customer
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'ASIA'
         |), j AS (
         |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, n_name,
         |    l_extendedprice * (1.0 - l_discount) AS rev
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN asia_cust ON o_custkey = c_custkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |), a AS (
         |  SELECT o_year,
         |    ${moneySumSql("CASE WHEN n_name = 'NATION_5' THEN rev ELSE 0.0 END")} AS nation_revenue,
         |    ${moneySumSql("rev")} AS total_revenue,
         |    count(*) AS n_items
         |  FROM j GROUP BY o_year
         |)
         |SELECT o_year, nation_revenue * 100.0 / total_revenue AS mkt_share_pct,
         |  nation_revenue, total_revenue, n_items
         |FROM a""".stripMargin,
    "q13_custdist" ->
      """WITH c_orders AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
        |  GROUP BY c_custkey
        |)
        |SELECT c_count, count(*) AS custdist FROM c_orders GROUP BY c_count""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |    ${moneySumSql("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
         |  GROUP BY l_suppkey
         |)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin,
    "q17_small_qty" ->
      s"""WITH avgq AS (
         |  SELECT l_partkey AS ak, sum(l_quantity) / count(*) AS avg_qty
         |  FROM lineitem GROUP BY l_partkey
         |), f AS (
         |  SELECT l_extendedprice
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN avgq ON l_partkey = ak
         |  WHERE p_brand = 'Brand#23' AND l_quantity < 0.5 * avg_qty
         |)
         |SELECT ${quant4Sql(s"(${moneySumSql("l_extendedprice")}) / 7.0")} AS avg_yearly,
         |  ${moneySumSql("l_extendedprice")} AS small_revenue,
         |  count(*) AS n_items
         |FROM f""".stripMargin,
    "q22_idle_rich" ->
      s"""WITH a AS (
         |  SELECT (${moneySumSql("c_acctbal")}) / count(*) AS avg_bal
         |  FROM customer WHERE c_acctbal > 0.0
         |)
         |SELECT c_nationkey, count(*) AS numcust,
         |  ${moneySumSql("c_acctbal")} AS totacctbal
         |FROM customer, a
         |WHERE c_acctbal > a.avg_bal
         |  AND NOT EXISTS (
         |    SELECT 1 FROM orders
         |    WHERE o_custkey = c_custkey
         |      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
         |GROUP BY c_nationkey""".stripMargin,
    "sales_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |  sum(l_quantity) AS sum_qty,
         |  ${moneySumSql("l_extendedprice")} AS sum_price,
         |  count(*) AS n
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "sales_pivot" ->
      """SELECT l_linestatus,
        |  sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS qty_a,
        |  sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS qty_n,
        |  sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS qty_r
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "window_ranks" ->
      s"""SELECT o_custkey, o_orderkey,
         |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
         |  ${quant4Sql("percent_rank() OVER w")} AS pct_rank,
         |  ${quant4Sql("cume_dist() OVER w")} AS cume
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,
    "nest_lineitems" ->
      """WITH s AS (
        |  SELECT l_orderkey,
        |    lpad(CAST(l_linenumber AS VARCHAR), 4, '0') || ':' ||
        |    lpad(CAST(l_partkey AS VARCHAR), 10, '0') || ':' ||
        |    lpad(CAST(CAST(l_quantity AS BIGINT) AS VARCHAR), 4, '0') AS sig
        |  FROM lineitem
        |)
        |SELECT l_orderkey,
        |  array_to_string(list_sort(list(sig)), '|') AS items_sig,
        |  count(*) AS n_items
        |FROM s GROUP BY l_orderkey""".stripMargin,
    "events_sliding" ->
      s"""WITH e AS (
         |  SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
         |), w AS (
         |  SELECT event_type, value,
         |    CAST(to_timestamp((floor(epoch(ts) / 1800) - i.i) * 1800) AS TIMESTAMP) AS bucket
         |  FROM e CROSS JOIN (SELECT unnest([0, 1]) AS i) i
         |)
         |SELECT bucket, event_type, count(*) AS n_events,
         |  ${moneySumSql("value")} AS sum_value
         |FROM w GROUP BY 1, 2""".stripMargin,
    // exact-mode theta estimates are exact counts, so the oracle is the
    // literal anti-join/semi-join definition of churn
    "events_theta_churn" ->
      """WITH a AS (
        |  SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id FROM events
        |), p AS (
        |  SELECT day, lead(day) OVER (ORDER BY day) AS nd
        |  FROM (SELECT DISTINCT day FROM a)
        |  QUALIFY nd IS NOT NULL
        |)
        |SELECT p.day,
        |  (SELECT count(*) FROM a x WHERE x.day = p.day
        |     AND x.user_id NOT IN (SELECT user_id FROM a y WHERE y.day = p.nd)) AS churned,
        |  (SELECT count(*) FROM a x WHERE x.day = p.nd
        |     AND x.user_id NOT IN (SELECT user_id FROM a y WHERE y.day = p.day)) AS added,
        |  (SELECT count(*) FROM a x WHERE x.day = p.day
        |     AND x.user_id IN (SELECT user_id FROM a y WHERE y.day = p.nd)) AS retained
        |FROM p""".stripMargin,
    "events_active_users" ->
      """WITH a AS (
        |  SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id FROM events
        |), dau AS (
        |  SELECT day, count(DISTINCT user_id) AS dau FROM a GROUP BY 1
        |), w AS (
        |  SELECT a.day + CAST(i.i AS INTEGER) AS day, a.user_id
        |  FROM a CROSS JOIN (SELECT unnest(range(0, 7)) AS i) i
        |), wau AS (
        |  SELECT day, count(DISTINCT user_id) AS wau FROM w GROUP BY 1
        |)
        |SELECT dau.day, dau.dau, wau.wau FROM dau JOIN wau USING (day)""".stripMargin,
    "events_histogram" ->
      s"""SELECT event_type, CAST(floor("value" / 50.0) AS BIGINT) AS bin,
         |  count(*) AS n_events, ${moneySumSql("value")} AS sum_value
         |FROM events GROUP BY 1, 2""".stripMargin,
    "basket_pairs" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |p AS (
         |  SELECT a.pk AS pa, b.pk AS pb FROM li a JOIN li b
         |  ON a.ok = b.ok AND a.pk < b.pk
         |),
         |cab AS (SELECT pa, pb, count(*) AS c_ab FROM p GROUP BY pa, pb HAVING count(*) >= 3),
         |cnt AS (SELECT pk, count(*) AS c FROM li GROUP BY pk),
         |n AS (SELECT count(DISTINCT ok) AS n_orders FROM li)
         |SELECT pa, pb, c_ab,
         |  ${quant4Sql("CAST(c_ab AS DOUBLE) * CAST(n_orders AS DOUBLE) / " +
              "(CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE))")} AS lift
         |FROM cab
         |JOIN cnt ca ON cab.pa = ca.pk
         |JOIN cnt cb ON cab.pb = cb.pk
         |CROSS JOIN n
         |ORDER BY lift DESC, pa, pb LIMIT 20""".stripMargin,
    "orders_cohort" ->
      s"""WITH o AS (
         |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_totalprice FROM orders
         |), f AS (
         |  SELECT o_custkey, CAST(date_trunc('month', min(d)) AS DATE) AS cohort
         |  FROM o GROUP BY o_custkey
         |)
         |SELECT cohort, CAST(date_trunc('month', d) AS DATE) AS month,
         |  CAST(date_diff('month', cohort, date_trunc('month', d)) AS INTEGER) AS months_since,
         |  count(DISTINCT o_custkey) AS n_active,
         |  ${moneySumSql("o_totalprice")} AS revenue
         |FROM o JOIN f USING (o_custkey)
         |GROUP BY 1, 2, 3""".stripMargin,
    "orders_fulfillment" ->
      """WITH j AS (
        |  SELECT o_orderpriority,
        |    CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT) AS lag
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |)
        |SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(CAST(quantile_cont(lag, 0.5) AS DECIMAL(18,4)) AS DOUBLE) AS p50_lag_days,
        |  CAST(sum(lag) // count(*) AS BIGINT) AS mean_lag_days
        |FROM j GROUP BY o_orderpriority""".stripMargin,
    "supplier_pareto" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS suppkey,
        |    sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100, 0) AS BIGINT)) AS cents
        |  FROM lineitem GROUP BY l_suppkey
        |), t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM rev),
        |r AS (
        |  SELECT suppkey, cents,
        |    row_number() OVER (ORDER BY cents DESC, suppkey) AS rnk,
        |    CAST(sum(cents) OVER (ORDER BY cents DESC, suppkey
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM rev
        |)
        |SELECT CAST(rnk AS INTEGER) AS rnk, suppkey,
        |  CAST(cents AS DOUBLE) / 100.0 AS revenue,
        |  CAST((cum * 10000) // total AS BIGINT) AS cum_share_bp
        |FROM r CROSS JOIN t WHERE rnk <= 10""".stripMargin,
    "orders_aging" ->
      s"""WITH h AS (SELECT CAST(max(o_orderdate) AS DATE) AS hz FROM orders)
         |SELECT o_orderpriority,
         |  CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), hz) <= 90 THEN '0-90'
         |       WHEN date_diff('day', CAST(o_orderdate AS DATE), hz) <= 365 THEN '91-365'
         |       ELSE '365+' END AS age_bucket,
         |  count(*) AS n_orders,
         |  ${moneySumSql("o_totalprice")} AS open_value
         |FROM orders CROSS JOIN h
         |WHERE o_orderstatus <> 'F'
         |GROUP BY 1, 2""".stripMargin,
    "customer_rfm" ->
      """WITH rfm AS (
        |  SELECT o_custkey AS custkey,
        |    CAST(date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '1998-12-31') AS BIGINT) AS r_days,
        |    count(*) AS f,
        |    sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS m_cents
        |  FROM orders GROUP BY o_custkey
        |), th AS (
        |  SELECT quantile_cont(r_days, [0.25, 0.5, 0.75]) AS rq,
        |    quantile_cont(f, [0.25, 0.5, 0.75]) AS fq,
        |    quantile_cont(m_cents, [0.25, 0.5, 0.75]) AS mq
        |  FROM rfm
        |)
        |SELECT custkey,
        |  CAST(CASE WHEN CAST(r_days AS DOUBLE) <= rq[1] THEN 4
        |            WHEN CAST(r_days AS DOUBLE) <= rq[2] THEN 3
        |            WHEN CAST(r_days AS DOUBLE) <= rq[3] THEN 2 ELSE 1 END AS INTEGER) AS r_score,
        |  CAST(CASE WHEN CAST(f AS DOUBLE) <= fq[1] THEN 1
        |            WHEN CAST(f AS DOUBLE) <= fq[2] THEN 2
        |            WHEN CAST(f AS DOUBLE) <= fq[3] THEN 3 ELSE 4 END AS INTEGER) AS f_score,
        |  CAST(CASE WHEN CAST(m_cents AS DOUBLE) <= mq[1] THEN 1
        |            WHEN CAST(m_cents AS DOUBLE) <= mq[2] THEN 2
        |            WHEN CAST(m_cents AS DOUBLE) <= mq[3] THEN 3 ELSE 4 END AS INTEGER) AS m_score
        |FROM rfm CROSS JOIN th""".stripMargin,
    "events_dwell" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, event_id,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
         |  FROM events
         |), g AS (
         |  SELECT event_type,
         |    us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap_us
         |  FROM e
         |)
         |SELECT event_type, count(*) AS n_gaps,
         |  CAST(floor(CAST(sum(gap_us) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 10000 + 0.5)
         |       AS DOUBLE) / 10000.0 AS mean_gap_us,
         |  CAST(min(gap_us) AS BIGINT) AS min_gap_us,
         |  CAST(max(gap_us) AS BIGINT) AS max_gap_us
         |FROM g WHERE gap_us IS NOT NULL
         |GROUP BY event_type""".stripMargin,
    "events_seasonality" ->
      s"""WITH p AS (
         |  SELECT event_type,
         |    CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hod,
         |    count(*) AS n_events,
         |    sum(CAST(round(value * 100, 0) AS BIGINT)) AS sc
         |  FROM events GROUP BY 1, 2
         |), t AS (
         |  SELECT event_type, CAST(sum(n_events) AS BIGINT) AS n_type
         |  FROM p GROUP BY 1
         |)
         |SELECT p.event_type, hod, CAST(n_events AS BIGINT) AS n_events,
         |  ${quant4Sql("CAST(sc AS DOUBLE) / 100.0 / CAST(n_events AS DOUBLE)")} AS mean_value,
         |  CAST((n_events * 10000) // n_type AS BIGINT) AS share_bp
         |FROM p JOIN t USING (event_type)""".stripMargin,
    "events_cart_abandonment" ->
      """WITH c AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ct FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS pt FROM events WHERE event_type = 'purchase'
        |)
        |SELECT CAST(ct AS DATE) AS day, count(*) AS n_abandoned,
        |  count(DISTINCT user_id) AS n_users
        |FROM c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p WHERE p.user_id = c.user_id
        |  AND p.pt > c.ct AND p.pt <= c.ct + INTERVAL 60 MINUTE
        |)
        |GROUP BY 1""".stripMargin,
    "events_weekly_profile" ->
      s"""SELECT event_type,
         |  CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS INTEGER) AS dow,
         |  CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hod,
         |  count(*) AS n_events,
         |  ${moneySumSql("value")} AS sum_value
         |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "events_window_topk" ->
      """WITH e AS (
        |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket, event_id, value
        |  FROM events
        |), r AS (
        |  SELECT bucket, event_id, value,
        |    row_number() OVER (PARTITION BY bucket ORDER BY value DESC, event_id) AS rn
        |  FROM e
        |)
        |SELECT bucket, CAST(rn - 1 AS INTEGER) AS rank, event_id, value
        |FROM r WHERE rn <= 3""".stripMargin,
    "events_forecast_backtest" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), p AS (
        |  SELECT event_type AS t, h + INTERVAL 24 HOUR AS h, n AS n_pred FROM h
        |)
        |SELECT h.event_type, count(*) AS n_hours,
        |  CAST((sum(abs(h.n - p.n_pred)) * 10000) // count(*) AS BIGINT) AS mae_fp,
        |  CAST(sum(h.n - p.n_pred) AS BIGINT) AS bias
        |FROM h JOIN p ON h.event_type = p.t AND h.h = p.h
        |GROUP BY h.event_type""".stripMargin,
    "events_burst_users" ->
      """WITH h AS (
        |  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), p AS (
        |  SELECT user_id, n AS peak_events, h AS peak_hour,
        |    row_number() OVER (PARTITION BY user_id ORDER BY n DESC, h) AS rn
        |  FROM h
        |)
        |SELECT user_id, peak_events, peak_hour FROM p
        |WHERE rn = 1 AND peak_events > 2""".stripMargin,
    "events_ctr" ->
      """WITH d AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    count(CASE WHEN event_type = 'view' THEN 1 END) AS n_views,
        |    count(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks,
        |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases
        |  FROM events GROUP BY 1
        |)
        |SELECT day, n_views, n_clicks, n_purchases,
        |  CAST((n_clicks * 10000) // n_views AS BIGINT) AS ctr_bp,
        |  CAST((n_purchases * 10000) // greatest(n_clicks, 1) AS BIGINT) AS cvr_bp
        |FROM d WHERE n_views > 0""".stripMargin,
    "events_new_vs_returning" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events
        |), f AS (
        |  SELECT user_id, min(day) AS first_day FROM a GROUP BY user_id
        |)
        |SELECT day,
        |  count(CASE WHEN day = first_day THEN 1 END) AS n_new,
        |  count(CASE WHEN day <> first_day THEN 1 END) AS n_returning
        |FROM a JOIN f USING (user_id)
        |GROUP BY day""".stripMargin,
    "events_concentration" ->
      """WITH pu AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
        |r AS (
        |  SELECT user_id, n,
        |    row_number() OVER (ORDER BY n DESC, user_id) AS rk
        |  FROM pu
        |), t AS (SELECT count(*) AS n_users, sum(n) AS total FROM pu)
        |SELECT CAST(n_users AS BIGINT) AS n_users,
        |  count(*) AS n_heavy_users,
        |  CAST((sum(n) * 10000) // max(total) AS BIGINT) AS heavy_share_bp
        |FROM r CROSS JOIN t
        |WHERE rk <= (n_users + 9) // 10
        |GROUP BY n_users""".stripMargin,
    "events_conversion_time" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |    CAST(ts AS TIMESTAMP) AS t FROM events
         |), fv AS (
         |  SELECT user_id, min(us) AS vt FROM e WHERE event_type = 'view' GROUP BY user_id
         |), conv AS (
         |  SELECT e.user_id, min(us) AS pt, min(vt) AS vt
         |  FROM e JOIN fv ON e.user_id = fv.user_id
         |  WHERE event_type = 'purchase' AND us > vt
         |  GROUP BY e.user_id
         |)
         |SELECT CAST(make_timestamp(pt) AS DATE) AS day,
         |  count(*) AS n_conversions,
         |  ${quant4Sql("quantile_cont(pt - vt, 0.5)")} AS p50_lag_us,
         |  CAST(sum(pt - vt) // count(*) AS BIGINT) AS mean_lag_us
         |FROM conv GROUP BY 1""".stripMargin,
    "events_anomaly_seasonal" ->
      s"""WITH stats AS (
         |  SELECT event_type AS t, CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS h,
         |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
         |      / CAST(count(*) AS DOUBLE) AS mean,
         |    sqrt(
         |      CAST(sum(CAST(round(value * 100, 0) AS BIGINT) * CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 10000.0
         |        / CAST(count(*) AS DOUBLE)
         |      - (CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE))
         |        * (CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE))
         |    ) AS std
         |  FROM events GROUP BY 1, 2
         |)
         |SELECT event_id, event_type,
         |  CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hod,
         |  ${quant4Sql("(value - mean) / std")} AS z
         |FROM events JOIN stats
         |  ON event_type = t AND CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) = h
         |WHERE std > 0.0 AND abs(value - mean) > 3.0 * std""".stripMargin,
    "events_zscore" ->
      s"""WITH stats AS (
         |  SELECT event_type AS t,
         |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
         |      / CAST(count(*) AS DOUBLE) AS mean,
         |    sqrt(
         |      CAST(sum(CAST(round(value * 100, 0) AS BIGINT) * CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 10000.0
         |        / CAST(count(*) AS DOUBLE)
         |      - (CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE))
         |        * (CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE))
         |    ) AS std
         |  FROM events GROUP BY event_type
         |)
         |SELECT event_id, event_type, ${quant4Sql("(value - mean) / std")} AS z
         |FROM events JOIN stats ON event_type = t
         |WHERE std > 0.0 AND abs(value - mean) > 3.0 * std""".stripMargin,
    "q9_profit" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |  ${moneySumSql("l_extendedprice * (1.0 - l_discount) - 0.1 * p_retailprice * l_quantity")} AS sum_profit,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%widget%'
         |GROUP BY 1, 2""".stripMargin,
    "q11_part_value" ->
      s"""WITH bypart AS (
         |  SELECT l_partkey,
         |    ${moneySumSql("l_extendedprice * (1.0 - l_discount)")} AS part_value
         |  FROM lineitem GROUP BY l_partkey
         |), tot AS (
         |  SELECT ${moneySumSql("part_value")} AS total_value FROM bypart
         |)
         |SELECT l_partkey, part_value
         |FROM bypart, tot
         |WHERE part_value > total_value * 0.001""".stripMargin,
    "q12_late_priority" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_linestatus""".stripMargin,
    "q16_variety" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_type <> 'PROMO' AND p_size IN (1, 5, 10, 15, 20, 25)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        |GROUP BY p_brand, p_size""".stripMargin,
    "q20_heavy_suppliers" ->
      """WITH q AS (
        |  SELECT l_suppkey
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'red%'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(l_quantity) > 50.0
        |)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (SELECT l_suppkey FROM q)""".stripMargin,
    "q21_waiting" ->
      """WITH per AS (
        |  SELECT l_orderkey,
        |    count(DISTINCT l_suppkey) AS n_supp,
        |    count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN l_suppkey END) AS n_late,
        |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN l_suppkey END) AS late_supp
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY l_orderkey
        |), w AS (
        |  SELECT late_supp, count(*) AS numwait
        |  FROM per WHERE n_supp >= 2 AND n_late = 1
        |  GROUP BY late_supp
        |)
        |SELECT s_name, numwait
        |FROM w JOIN supplier ON late_supp = s_suppkey
        |ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin,
    "events_retention" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        |  FROM events
        |), f AS (
        |  SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id
        |)
        |SELECT f.cohort_day, CAST(d.day - f.cohort_day AS INTEGER) AS day_offset,
        |  count(*) AS n_users
        |FROM d JOIN f ON d.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin,
    // same sessionization CTE as events_sessionize (second-floored ts
    // diffs), then trigram paths per session; NULL leads (session
    // shorter than 3) drop out before the rollup
    "events_top_paths" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec
        |  FROM events
        |), flagged AS (
        |  SELECT user_id, event_id, event_type, ts, ts_sec,
        |    CASE WHEN lag(ts_sec) OVER w IS NULL
        |           OR ts_sec - lag(ts_sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM flagged
        |), tri AS (
        |  SELECT
        |    event_type || '>' || lead(event_type, 1) OVER w2
        |      || '>' || lead(event_type, 2) OVER w2 AS path,
        |    lead(event_type, 2) OVER w2 AS e3
        |  FROM sess
        |  WINDOW w2 AS (PARTITION BY user_id, session_seq ORDER BY ts, event_id)
        |)
        |SELECT path, count(*) AS n FROM tri WHERE e3 IS NOT NULL
        |GROUP BY path ORDER BY n DESC, path LIMIT 10""".stripMargin,
    // same symbol mapping, in-aggregate ordering, and non-overlapping
    // leftmost regex count (Java regex and RE2 agree on both)
    "events_pattern" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        |      WHEN 'purchase' THEN 'p' ELSE 'x' END AS sym
        |  FROM events
        |), seqs AS (
        |  SELECT user_id, string_agg(sym, '' ORDER BY ts, event_id) AS seq
        |  FROM ev GROUP BY user_id
        |)
        |SELECT user_id, CAST(len(seq) AS INTEGER) AS n_events,
        |  CAST(len(regexp_extract_all(seq, 'v[^p]{0,2}p')) AS INTEGER) AS n_quick_conversions
        |FROM seqs WHERE len(regexp_extract_all(seq, 'v[^p]{0,2}p')) > 0""".stripMargin,
    // same hourly spine and ROWS-framed forward fill; hour buckets are
    // unique per type so RANGE/ROWS framing agree across engines
    "events_gap_fill" ->
      s"""WITH ev AS (
         |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, value FROM events
         |), hourly AS (
         |  SELECT event_type, hour, count(*) AS n_events,
         |    ${moneySumSql("value")} AS value_sum
         |  FROM ev GROUP BY 1, 2
         |), rng AS (
         |  SELECT event_type, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY 1
         |), spine AS (
         |  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM rng
         |), j AS (
         |  SELECT s.event_type, s.hour, h.n_events, h.value_sum
         |  FROM spine s LEFT JOIN hourly h USING (event_type, hour)
         |)
         |SELECT event_type, hour,
         |  coalesce(n_events, CAST(0 AS BIGINT)) AS n_events,
         |  n_events IS NULL AS filled,
         |  coalesce(value_sum, 0.0) AS value_sum,
         |  last_value(value_sum IGNORE NULLS) OVER (
         |    PARTITION BY event_type ORDER BY hour ROWS UNBOUNDED PRECEDING) AS carry_sum
         |FROM j""".stripMargin,
    // same per-user lead ordering as the Spark window; the probability
    // is a single double division of two exact longs in both engines
    "events_markov" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
        |), t AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM ev
        |), c AS (
        |  SELECT from_type, to_type, count(*) AS n_trans
        |  FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, n_trans,
        |  CAST(n_trans AS DOUBLE) /
        |    CAST(CAST(sum(n_trans) OVER (PARTITION BY from_type) AS BIGINT) AS DOUBLE) AS p_trans
        |FROM c""".stripMargin,
    "sales_cube" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, o_orderpriority,
         |  CAST(GROUPING(year(o_orderdate), o_orderpriority) AS BIGINT) AS gid,
         |  count(*) AS n_orders,
         |  ${moneySumSql("o_totalprice")} AS sum_price
         |FROM orders
         |GROUP BY CUBE (year(o_orderdate), o_orderpriority)""".stripMargin,
    // identical fixed-point chain: per-(type, hour) BIGINT rollup,
    // window prefix sums (CASTs kill HUGEINT), quantized split score,
    // earliest-hour tie-break
    "events_changepoint" ->
      s"""WITH hourly AS (
         |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS hc,
         |    CAST(count(*) AS BIGINT) AS hn
         |  FROM events GROUP BY 1, 2
         |),
         |s AS (
         |  SELECT event_type, h,
         |    CAST(sum(hc) OVER (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cs,
         |    CAST(sum(hn) OVER (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ci,
         |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY h) AS BIGINT) AS hi,
         |    CAST(sum(hc) OVER (PARTITION BY event_type) AS BIGINT) AS ct,
         |    CAST(sum(hn) OVER (PARTITION BY event_type) AS BIGINT) AS nt,
         |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nh
         |  FROM hourly
         |),
         |d AS (
         |  SELECT *,
         |    abs(CAST(cs AS DOUBLE) / CAST(ci AS DOUBLE)
         |      - CAST(ct - cs AS DOUBLE) / CAST(nt - ci AS DOUBLE)) AS delta
         |  FROM s WHERE hi < nh
         |),
         |q AS (SELECT *, CAST(floor(delta * 10000 + 0.5) AS BIGINT) AS dq FROM d),
         |r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dq DESC, h ASC) AS rn FROM q)
         |SELECT event_type, h AS split_hour,
         |  ${quant4Sql("CAST(cs AS DOUBLE) / 100.0 / CAST(ci AS DOUBLE)")} AS mean_before,
         |  ${quant4Sql("CAST(ct - cs AS DOUBLE) / 100.0 / CAST(nt - ci AS DOUBLE)")} AS mean_after
         |FROM r WHERE rn = 1""".stripMargin,
    "events_anomaly" ->
      s"""WITH med AS (
         |  SELECT event_type AS t, median(value) AS med FROM events GROUP BY 1
         |), j AS (
         |  SELECT e.event_type, e.value, med.med
         |  FROM events e JOIN med ON e.event_type = med.t
         |), mad AS (
         |  SELECT event_type AS t, median(abs(value - med)) AS mad FROM j GROUP BY 1
         |)
         |SELECT j.event_type, count(*) AS n,
         |  CAST(sum(CASE WHEN abs(j.value - j.med) > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
         |  ${quant4Sql("any_value(j.med)")} AS med,
         |  ${quant4Sql("any_value(mad.mad)")} AS mad
         |FROM j JOIN mad ON j.event_type = mad.t
         |GROUP BY j.event_type""".stripMargin,
    "events_attribution" ->
      s"""WITH ev AS (
         |  SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
         |  FROM events
         |), a AS (
         |  SELECT event_type, value,
         |    last_value(CASE WHEN event_type IN ('click', 'view', 'signup')
         |               THEN event_type END IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
         |  FROM ev
         |)
         |SELECT coalesce(channel, 'direct') AS channel, count(*) AS n_purchases,
         |  ${moneySumSql("value")} AS revenue
         |FROM a WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,
    // contents must be layout-invariant: aggregate the ORIGINAL table
    "layout_compact" ->
      s"""SELECT l_returnflag, count(*) AS n_items,
         |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
         |  ${moneySumSql("l_extendedprice")} AS sum_price
         |FROM lineitem GROUP BY l_returnflag""".stripMargin)
}
