package graft.queries

/**
 * DuckDB replay of the KLL quantile EXTRACTION from a pinned sorted
 * view — the promotion that retires "randomized KLL compaction is
 * RUN-nondeterministic" for the rollup gate (driver r14, the
 * builtHnswGraphsOf pattern): the gate builds the merged per-type
 * sketches ONCE (one distributed action), pins each sketch's sorted
 * view (items + cumulative weights), derives the emitted quantiles
 * from that same pinned state, and injects the state into the oracle.
 * Randomized compaction can then never diverge between the two sides —
 * exactly how the HNSW gates replay a beam walk over their own
 * randomized-build graphs.
 *
 * What the oracle independently verifies (not just echoes):
 *  1. every pinned item is a value that actually occurs in the source
 *     rows of its group (a fabricated sorted view poisons the result);
 *  2. the pinned total weight equals the group's true row count
 *     (count(*) recomputed from the parquet, not trusted);
 *  3. n_days is recomputed from the source entirely;
 *  4. the INCLUSIVE quantile rule is replayed in SQL from the pinned
 *     (item, cumWeight) pairs: quantile(q) = first item whose
 *     cumulative weight reaches the natural rank.
 *
 * The natural rank replays datasketches-java 6.2.0's
 * QuantilesUtil.getNaturalRank bit-for-bit: naturalRank = q·N, then —
 * because N ≤ 1e7 here — TAIL-ROUNDED to 7 decimal digits
 * (Math.round(nr·1e7)/1e7, decompiled from the jar; a plain ceil(q·N)
 * is a 1-ulp trap: 0.561·20000 = 11220.000000000002 must rank 11220,
 * not 11221), then Math.ceil for INCLUSIVE. Validated 0 mismatches on
 * ~88k (sketch, q) probes including 30-way merged sketches and
 * n ∈ {1, 2, 3, 199, 200, 201} tie-heavy edges (KllReplaySpec pins the
 * same property in-tree).
 *
 * Reference shape: the reference's host engine ships quantile sketches
 * (duckdb approx_quantile); this proves graft's reaggregatable KLL
 * tier (graft/functions/KllSketch.scala) emits exactly the published
 * Datasketches extraction arithmetic over its own built state.
 */
private[queries] object KllReplay {

  /** ranks the rollup gate emits (p50/p95/p99) */
  val Ranks: Seq[Double] = Seq(0.5, 0.95, 0.99)

  /** pinned sorted view of one merged per-type sketch */
  case class Pin(
      eventType: String,
      nDays: Long,
      n: Long,
      items: Array[Double],
      cumWeights: Array[Long],
      quantiles: Seq[Double])

  private def lit(d: Double): String =
    if (d == d.toLong.toDouble && math.abs(d) < 1e15) s"${d.toLong}.0"
    else new java.math.BigDecimal(d).toString

  private def sq(s: String): String = s.replace("'", "''")

  /** datasketches' INCLUSIVE natural rank (see header), replayed
    * driver-side — the spec pins this against the library */
  def naturalRank(q: Double, n: Long): Long = {
    var nr = q * n
    if (n.toDouble <= 1.0e7) nr = Math.round(nr * 1.0e7) / 1.0e7
    Math.ceil(nr).toLong
  }

  /** driver-side replica of the full INCLUSIVE extraction (spec use) */
  def inclusiveQuantile(
      items: Array[Double], cumWeights: Array[Long], n: Long, q: Double): Double = {
    val nat = naturalRank(q, n)
    var i = 0
    while (i < cumWeights.length && cumWeights(i) < nat) i += 1
    items(math.min(i, items.length - 1))
  }

  /** the same natural rank as SQL over column n.n (operation order
    * matches the decompiled Java exactly: (q*N), *1e7, +0.5, floor,
    * long→double, /1e7, ceil, →long) */
  private def naturalRankSql(q: Double): String =
    s"CAST(ceil(CAST(CAST(floor(((${lit(q)} * n.n) * 10000000.0) + 0.5) AS BIGINT) AS DOUBLE) / 10000000.0) AS BIGINT)"

  /** full replay oracle for events_kll_rollup from the pinned views */
  def rollupOracleSql(pins: Seq[Pin]): String = {
    val values = pins.flatMap { p =>
      p.items.zip(p.cumWeights).map { case (it, w) =>
        s"('${sq(p.eventType)}', CAST(${lit(it)} AS DOUBLE), CAST($w AS BIGINT))"
      }
    }.mkString(",\n    ")
    val natCols = Ranks.zipWithIndex
      .map { case (q, i) => s"${naturalRankSql(q)} AS r$i" }.mkString(",\n        ")
    val qCols = Ranks.indices
      .map(i => s"min(CASE WHEN sv.cw >= nat.r$i THEN sv.item END) AS q$i")
      .mkString(",\n        ")
    val outNames = Seq("p50", "p95", "p99")
    val outCols = Ranks.indices.map { i =>
      s"CASE WHEN chk.n_missing = 0 AND chk.total_w = n.n THEN q.q$i END AS ${outNames(i)}"
    }.mkString(",\n  ")
    s"""WITH sv(event_type, item, cw) AS (VALUES
       |    $values),
       |src AS (SELECT event_type, "value" AS v FROM events),
       |n AS (SELECT event_type, count(*) AS n,
       |        count(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS n_days
       |      FROM events GROUP BY 1),
       |chk AS (SELECT s2.event_type, max(s2.cw) AS total_w,
       |          sum(CASE WHEN hit.v IS NULL THEN 1 ELSE 0 END) AS n_missing
       |        FROM sv s2 LEFT JOIN (SELECT DISTINCT event_type, v FROM src) hit
       |          ON hit.event_type = s2.event_type AND hit.v = s2.item
       |        GROUP BY 1),
       |nat AS (SELECT n.event_type, n.n_days,
       |        $natCols
       |      FROM n),
       |q AS (SELECT nat.event_type, nat.n_days,
       |        $qCols
       |      FROM nat JOIN sv ON sv.event_type = nat.event_type
       |      GROUP BY nat.event_type, nat.n_days)
       |SELECT q.event_type, q.n_days,
       |  $outCols
       |FROM q
       |JOIN chk ON chk.event_type = q.event_type
       |JOIN n ON n.event_type = q.event_type
       |ORDER BY q.event_type""".stripMargin
  }
}
