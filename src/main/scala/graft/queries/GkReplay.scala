package graft.queries

/**
 * DuckDB replay of catalyst QuantileSummaries.query over a pinned
 * Greenwald-Khanna summary — the promotion that retires "GK merge
 * order is run-nondeterministic" for `events_percentiles_approx`
 * (driver r14). The gate aggregates the state ONCE
 * (functions.GkStateAgg — approx_percentile's own digest with its
 * state exposed), pins (count, values, g, delta) per group, derives
 * its emitted percentiles from that state with the library's own
 * query(), and injects the state here. The oracle independently
 * re-derives the group count and item membership from the parquet and
 * replays the query arithmetic.
 *
 * The replayed rule, decompiled from catalyst 4.1.2
 * `QuantileSummaries.query(Seq)` / `findApproxQuantile`:
 *
 *   targetError = max_i(delta_i + g_i) / 2        (integer division)
 *   rank(q)     = ceil(q · count)                  (double mult+ceil)
 *   walk a SHARED cursor over ranks in ASCENDING order; for each q:
 *     if q ≤ relativeError   → first value
 *     if q ≥ 1−relativeError → last value
 *     else scan i from the cursor over [cursor, len−2] for the first
 *       i with  cumG(i)+delta_i − tE ≤ rank(q) ≤ cumG(i) + tE;
 *       found → value_i, cursor := i; none → last value, cursor :=
 *       len−1 (every later rank then returns the last value).
 *
 * All rank quantities are longs < 2^53, so Java's double comparisons
 * in findApproxQuantile are EXACTLY the integer comparisons the SQL
 * uses; the only true double op, ceil(q·count), replays bit-for-bit.
 * The cursor is replayed by chaining the per-rank first-satisfier
 * scans (min idx ≥ previous cursor); cumG(i) always equals the
 * cursor's minRank because it advances by g on every step.
 *
 * What the oracle verifies beyond the replay: pinned Σg equals the
 * group's true row count (recomputed), every pinned value occurs in
 * the source rows of its group, and the pinned values are
 * non-decreasing in index (the GK structural invariant); any
 * violation poisons the output NULL — loud, never false-exact.
 */
private[queries] object GkReplay {

  /** ranks the gate emits, with their output column names */
  val Ranks: Seq[Double] = Seq(0.5, 0.95)
  val OutNames: Seq[String] = Seq("p50_approx", "p95_approx")
  val Accuracy = 1000
  val RelativeError: Double = 1.0 / Accuracy

  case class Pin(
      eventType: String,
      n: Long,
      digestN: Long,
      values: Array[Double],
      gs: Array[Long],
      deltas: Array[Long])

  /** driver-side replica of the decompiled query walk (spec-validated
    * against the library across merge shapes) */
  def queryReplica(
      values: Array[Double], gs: Array[Long], deltas: Array[Long],
      count: Long, ranks: Seq[Double]): Seq[Double] = {
    val te = values.indices
      .foldLeft(Long.MinValue)((e, i) => math.max(e, deltas(i) + gs(i))) / 2
    var cur = 0
    var fellOff = false
    val out = Array.ofDim[Double](ranks.length)
    for ((q, idx) <- ranks.zipWithIndex.sortBy(_._1)) {
      out(idx) =
        if (q <= RelativeError) values.head
        else if (q >= 1 - RelativeError) values.last
        else if (fellOff) values.last
        else {
          val rank = math.ceil(q * count).toLong
          var j = cur
          var res = -1
          while (res < 0 && j < values.length - 1) {
            val cumg = gs.take(j + 1).sum
            if (cumg + deltas(j) - te <= rank && rank <= cumg + te) res = j
            else j += 1
          }
          if (res >= 0) { cur = res; values(res) }
          else { fellOff = true; values.last }
        }
    }
    out.toSeq
  }

  private def lit(d: Double): String =
    if (d == d.toLong.toDouble && math.abs(d) < 1e15) s"${d.toLong}.0"
    else new java.math.BigDecimal(d).toString

  private def sq(s: String): String = s.replace("'", "''")

  /** full replay oracle for events_percentiles_approx */
  def oracleSql(pins: Seq[Pin]): String = {
    require(Ranks == Ranks.sorted, "rank chain below assumes ascending order")
    require(Ranks.forall(q => q > RelativeError && q < 1 - RelativeError),
      "head/last constant branches not emitted — all ranks mid-range")
    val values = pins.flatMap { p =>
      p.values.indices.map { i =>
        s"('${sq(p.eventType)}', $i, CAST(${lit(p.values(i))} AS DOUBLE), ${p.gs(i)}, ${p.deltas(i)})"
      }
    }.mkString(",\n    ")
    // rank constants per group (ceil of an exact double product)
    val rkCols = Ranks.zipWithIndex
      .map { case (q, i) => s"CAST(ceil(${lit(q)} * n.cnt) AS BIGINT) AS rk$i" }
      .mkString(",\n       ")
    // chained first-satisfier scans: s0 from idx 0, s_k from s_{k-1}
    val scans = Ranks.indices.map { i =>
      val lower = if (i == 0) "" else
        s" AND s${i - 1}.i${i - 1} IS NOT NULL AND cum.idx >= s${i - 1}.i${i - 1}"
      val prevJoin = if (i == 0) "" else
        s"\n       JOIN s${i - 1} ON s${i - 1}.event_type = cum.event_type"
      s"""s$i AS (SELECT cum.event_type,
         |    min(CASE WHEN cum.idx <= cum.len - 2$lower
         |          AND cum.cumg + cum.delta - r.te <= r.rk$i AND r.rk$i <= cum.cumg + r.te
         |        THEN cum.idx END) AS i$i
         |  FROM cum JOIN r ON r.event_type = cum.event_type$prevJoin
         |  GROUP BY cum.event_type)""".stripMargin
    }.mkString(",\n")
    val pvCols = Ranks.indices
      .map(i => s"max(CASE WHEN cum.idx = s$i.i$i THEN cum.v END) AS v$i")
      .mkString(",\n    ")
    val pvJoins = Ranks.indices
      .map(i => s"JOIN s$i ON s$i.event_type = cum.event_type").mkString("\n       ")
    val outCols = Ranks.indices.map { i =>
      s"CASE WHEN chk.n_missing = 0 AND tot.n_unsorted = 0 AND tot.sumg = n.cnt " +
        s"THEN COALESCE(pv.v$i, tot.last_v) END AS ${OutNames(i)}"
    }.mkString(",\n  ")
    s"""WITH st(event_type, idx, v, g, delta) AS (VALUES
       |    $values),
       |src AS (SELECT event_type, "value" AS v FROM events),
       |n AS (SELECT event_type, count(*) AS cnt FROM src GROUP BY 1),
       |cum AS (SELECT st.*,
       |    sum(g) OVER (PARTITION BY event_type ORDER BY idx) AS cumg,
       |    count(*) OVER (PARTITION BY event_type) AS len,
       |    lag(v) OVER (PARTITION BY event_type ORDER BY idx) AS prev_v
       |  FROM st),
       |te0 AS (SELECT event_type, max(g + delta) // 2 AS te FROM st GROUP BY 1),
       |chk AS (SELECT s2.event_type,
       |    sum(CASE WHEN hit.v IS NULL THEN 1 ELSE 0 END) AS n_missing
       |  FROM st s2 LEFT JOIN (SELECT DISTINCT event_type, v FROM src) hit
       |    ON hit.event_type = s2.event_type AND hit.v = s2.v
       |  GROUP BY 1),
       |tot AS (SELECT event_type, max(cumg) AS sumg,
       |    max(CASE WHEN idx = len - 1 THEN v END) AS last_v,
       |    sum(CASE WHEN prev_v IS NOT NULL AND v < prev_v THEN 1 ELSE 0 END) AS n_unsorted
       |  FROM cum GROUP BY 1),
       |r AS (SELECT n.event_type, n.cnt, te0.te,
       |       $rkCols
       |  FROM n JOIN te0 ON te0.event_type = n.event_type),
       |$scans,
       |pv AS (SELECT cum.event_type,
       |    $pvCols
       |  FROM cum
       |       $pvJoins
       |  GROUP BY cum.event_type)
       |SELECT n.event_type,
       |  $outCols,
       |  n.cnt AS n
       |FROM n
       |JOIN chk ON chk.event_type = n.event_type
       |JOIN tot ON tot.event_type = n.event_type
       |JOIN pv ON pv.event_type = n.event_type
       |ORDER BY n.event_type""".stripMargin
  }
}
