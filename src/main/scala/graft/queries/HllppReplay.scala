package graft.queries

/**
 * DuckDB replay of Spark's OWN `approx_count_distinct` estimate
 * (HyperLogLogPlusPlus, rsd 0.02 → p=12, m=4096) — the promotion that
 * retires "sketch estimates are engine-specific" for
 * `events_window_approx` (driver r14). Unlike the Datasketches
 * replays, NO state pinning is needed: Spark's HLL++ is a pure,
 * order-independent function of the key set (xxhash64 is
 * deterministic; register update is max), so the oracle recomputes the
 * estimate from the raw parquet end to end.
 *
 * The replayed regime is LINEAR COUNTING, which is where every bucket
 * of the gate lands (≤166 distinct users/hour vs the ~11.5k p=12
 * threshold at both SFs). Decompiled from
 * `catalyst/util/HyperLogLogPlusPlusHelper` (4.1.2 jar):
 *
 *   hash    = XXH64.hashLong(user_id, seed=42)
 *   slot    = hash >>> (64-p)           (register index; value = NLZ
 *             of (hash << p | 1<<(p-1)) + 1 — irrelevant under linear
 *             counting, where only slot OCCUPANCY matters)
 *   V       = # registers left at 0 = m − |{slots hit}|
 *   if (V > 0 && ((p < 19 && H ≤ THRESHOLDS(p−4)) || E ≤ 2.5m)):
 *     estimate = round(H)   where H = m · ln(m / V)
 *
 * so in-regime the estimate is a pure function of V ∈ {1..m−1}. The
 * oracle computes the slot in exact HUGEINT-wraparound SQL (the
 * DedupQueries XXH64 machinery, here the dedicated 8-byte-long path),
 * counts occupancy, and looks H up in an injected (V → m·ln(m/V))
 * table computed with THIS JVM's Math.log — no libm in the oracle
 * engine (the HllReplay discipline); round replays Math.round as
 * floor(H + 0.5).
 *
 * The gate MEASURES the regime before emitting the oracle (the
 * knn_hnsw precondition pattern): V per bucket is computed
 * DISTRIBUTED (groupBy bucket, countDistinct(xxhash64 >>> 52) — no
 * raw collect), and the driver replica must equal Spark's actual
 * per-bucket estimates bit-for-bit; any bucket out of the linear
 * regime, or any replica mismatch (e.g. a future xxhash64 seed/flag
 * change), withholds the oracle — rows-only, loud.
 *
 * Reference shape: the reference's host engine ships approx distinct
 * sketches too (duckdb approx_count_distinct); parity here is
 * host-engine parity — graft's windowed approximate-distinct tier
 * provably computes the published HLL++ algorithm.
 */
private[queries] object HllppReplay {

  val Rsd = 0.02
  /** p = ceil(2·log2(1.106/rsd)) per the decompiled constructor */
  val P: Int = math.ceil(2.0 * math.log(1.106 / Rsd) / math.log(2.0)).toInt
  val M: Int = 1 << P

  /** Spark's own linear-counting threshold for this p (public static
    * on the helper object — literal parity by construction) */
  lazy val Threshold: Double =
    org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper.THRESHOLDS(P - 4)

  // ---- driver-side replica ----------------------------------------
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  /** XXH64.hashLong(v, 42) — the exact hash the aggregate applies to a
    * LONG column (validated against Spark's xxhash64 in the spec) */
  def hashLong(v: Long): Long = {
    var hash = 42L + P5 + 8L
    hash ^= java.lang.Long.rotateLeft(v * P2, 31) * P1
    hash = java.lang.Long.rotateLeft(hash, 27) * P1 + P4
    hash ^= hash >>> 33; hash *= P2
    hash ^= hash >>> 29; hash *= P3
    hash ^= hash >>> 32
    hash
  }

  def slot(v: Long): Int = (hashLong(v) >>> (64 - P)).toInt

  /** H = m·ln(m/V) with the decompiled operation order:
    * (double)m * log((double)m / V) */
  def linearH(vZeros: Int): Double = M.toDouble * Math.log(M.toDouble / vZeros)

  def linearEstimate(vZeros: Int): Long = Math.round(linearH(vZeros))

  /** the sufficient regime condition the gate requires of EVERY bucket
    * before emitting the oracle (first disjunct of the decompiled
    * branch; the E ≤ 2.5m disjunct would need zInverse — withheld) */
  def linearRegime(vZeros: Int): Boolean =
    vZeros > 0 && P < 19 && linearH(vZeros) <= Threshold

  // ---- oracle SQL ---------------------------------------------------
  private def lit(d: Double): String =
    if (d == d.toLong.toDouble && math.abs(d) < 1e15) s"${d.toLong}.0"
    else new java.math.BigDecimal(d).toString

  private val M64 = "18446744073709551616::HUGEINT"
  private def wmul(a: String, b: String): String =
    s"((((($a) >> 32) * ($b)) % 4294967296::HUGEINT) * 4294967296::HUGEINT" +
      s" + ((($a) % 4294967296::HUGEINT) * ($b))) % $M64"
  private def rotl(u: String, r: Int): String =
    s"(((($u) * ${1L << r}::HUGEINT) % $M64) + (($u) >> ${64 - r}))"

  /** (V → m·ln(m/V)) for every reachable V, as exact decimal literals */
  private def lnTable: String =
    (1 until M).map(v => s"($v, ${lit(linearH(v))})").mkString(", ")

  /** full replay: hourly buckets of `events`, approx_users per Spark's
    * linear-counting estimate recomputed from raw user_ids */
  def windowApproxOracleSql: String = {
    val acc0 = (BigInt(42) + BigInt(P5) + 8) mod (BigInt(1) << 64)
    val p1u = BigInt(P1) mod (BigInt(1) << 64)
    val p2u = BigInt(P2) mod (BigInt(1) << 64)
    val p3u = BigInt(P3) mod (BigInt(1) << 64)
    val p4u = BigInt(P4) mod (BigInt(1) << 64)
    s"""WITH pairs AS (
       |  SELECT DISTINCT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket, user_id
       |  FROM events),
       |u0 AS (SELECT bucket,
       |  CASE WHEN user_id < 0 THEN user_id::HUGEINT + $M64 ELSE user_id::HUGEINT END AS u
       |  FROM pairs),
       |k1 AS (SELECT bucket, ${wmul(rotl(wmul("u", s"$p2u::HUGEINT"), 31), s"$p1u::HUGEINT")} AS k FROM u0),
       |a1 AS (SELECT bucket, xor($acc0::HUGEINT, k) AS h FROM k1),
       |a2 AS (SELECT bucket, (${wmul(rotl("h", 27), s"$p1u::HUGEINT")} + $p4u::HUGEINT) % $M64 AS h FROM a1),
       |a3 AS (SELECT bucket, ${wmul("xor(h, h >> 33)", s"$p2u::HUGEINT")} AS h FROM a2),
       |a4 AS (SELECT bucket, ${wmul("xor(h, h >> 29)", s"$p3u::HUGEINT")} AS h FROM a3),
       |hh AS (SELECT bucket, xor(h, h >> 32) AS h FROM a4),
       |occ AS (SELECT bucket, count(DISTINCT (h >> ${64 - P})) AS nslots FROM hh GROUP BY 1),
       |lc(vz, hraw) AS (VALUES $lnTable)
       |SELECT occ.bucket, CAST(floor(lc.hraw + 0.5) AS BIGINT) AS approx_users
       |FROM occ JOIN lc ON lc.vz = $M - occ.nslots
       |ORDER BY occ.bucket""".stripMargin
  }
}
