package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loaders + oracle-stable numeric canonicalization helpers. */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /**
   * events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
   * rejects; read nanos as long and truncate to micros (exactly what
   * DuckDB's CAST(ts_ns AS TIMESTAMP) does, keeping the oracle aligned).
   */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
}
