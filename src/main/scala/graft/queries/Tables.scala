package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loaders + oracle-stable numeric canonicalization helpers. */
object Tables {
  // memoized per (session, path): spark.read.parquet re-lists files and
  // re-reads footers for schema inference on EVERY call (~70 ms on local
  // files — a real catalog caches table metadata once). DataFrames are
  // immutable plans, so reuse is safe; the map stays tiny (sessions ×
  // tables) and a racing double-read is harmless.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, s"$dir/$name.parquet"),
      spark.read.parquet(s"$dir/$name.parquet"))

  /** widened scan for CPU-heavy per-row work: the testdata files are
    * single-row-group parquet (unsplittable -> 1 partition), which would
    * serialize shingling/hashing onto one core */
  def wide(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.search.Knn.widen(apply(spark, dir, name))

  /**
   * events.parquet has shipped with two physical `ts` encodings across
   * testdata generations: TIMESTAMP(NANOS) (which Spark's parquet reader
   * rejects — read nanos as long, truncate to micros) and plain
   * timestamp[us] (read natively, arrives as TIMESTAMP_NTZ). Branch on
   * the loaded schema so either generation works; both paths emit a
   * session-local TimestampType, and with the UTC session timezone the
   * NTZ→LTZ cast is value-identity — exactly what the DuckDB oracles'
   * naive CAST(ts AS TIMESTAMP) sees.
   */
  def events(spark: SparkSession, dir: String): DataFrame =
    cache.getOrElseUpdate((spark, s"$dir/events.parquet@events"), {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _ =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    })

  /**
   * Content fingerprint of one or more input tables: name + byte length +
   * mtime of every file under each `$dir/$name.parquet`, hashed. Keys the
   * write-once derived layouts (z-order / compacted / bucketed copies) so
   * a REGENERATED input at the same path gets a fresh layout instead of a
   * stale cached one — `dir.hashCode` alone survived testdata rewrites.
   */
  def fingerprint(dir: String, names: String*): String = {
    val sig = names.sorted.map { n =>
      val root = new java.io.File(s"$dir/$n.parquet")
      val parts =
        if (root.isDirectory) root.listFiles().sortBy(_.getName) else Array(root)
      parts.map(p => s"${p.getName}:${p.length}:${p.lastModified}")
        .mkString(n + "[", ";", "]")
    }.mkString(dir + "|", "|", "")
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
  }

  /**
   * Money amounts are doubles with float noise; summing them directly is
   * order-dependent and would make the DuckDB-oracle hash flaky. We
   * canonicalize to integer cents before summing (exact, associative,
   * order-independent) and divide once at the end — the oracle SQL does
   * the identical transform, so both engines produce bit-identical
   * doubles regardless of row order or partial-aggregation shape.
   */
  def moneySum(c: Column): Column =
    (sum(round(c * 100).cast("long")).cast("double") / 100.0)

  /** oracle-side twin of [[moneySum]] */
  def moneySumSql(expr: String): String =
    s"CAST(sum(CAST(round(($expr) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0"

  /**
   * Distance/score quantization for the oracle hash: round through
   * DECIMAL(18,4) (both engines agree exactly on that conversion) but
   * EMIT a DOUBLE — decimal→double is correctly rounded in both the JVM
   * and DuckDB, whereas a decimal output column survives some client
   * readers as `Decimal` and others as `float64`, which breaks a
   * string-canonicalized hash even when values are equal.
   */
  def quant4(c: Column): Column =
    c.cast(org.apache.spark.sql.types.DecimalType(18, 4)).cast("double")

  /** oracle-side twin of [[quant4]] */
  def quant4Sql(expr: String): String =
    s"CAST(CAST(($expr) AS DECIMAL(18,4)) AS DOUBLE)"

  /** [[quant4]] at 8 decimals — for scores whose scale sits below 1e-4
    * (reciprocal-rank fusion values are ~1/60..1/160) */
  def quant8(c: Column): Column =
    c.cast(org.apache.spark.sql.types.DecimalType(18, 8)).cast("double")

  /** oracle-side twin of [[quant8]] */
  def quant8Sql(expr: String): String =
    s"CAST(CAST(($expr) AS DECIMAL(18,8)) AS DOUBLE)"
}
