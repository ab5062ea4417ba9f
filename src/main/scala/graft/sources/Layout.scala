package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Space-filling-curve (Z-order) data layout: cluster a table on the
 * Morton interleave of two columns so every output file covers a tight
 * rectangle in BOTH dimensions. Parquet min/max stats then prune
 * files/row-groups for 2-D range predicates — a linear sort serves only
 * its leading column, and at 100 TB the difference is reading ~√s of
 * the selectivity-s file set instead of all of it for the second
 * dimension. Same idea as Delta/Iceberg OPTIMIZE ZORDER BY; results are
 * layout-independent (the layout changes what a scan SKIPS, never what
 * a filter selects).
 *
 * Everything is codegen'd bitwise builtins — no UDF, no shuffle beyond
 * the single range exchange that IS the clustering.
 */
object Layout {

  private val spreadSteps = Seq(
    (8, 0x00FF00FF00FF00FFL),
    (4, 0x0F0F0F0F0F0F0F0FL),
    (2, 0x3333333333333333L),
    (1, 0x5555555555555555L))

  /** spread the low 16 bits of x so original bit j lands at bit 2j */
  private def spread16(x: Column): Column =
    spreadSteps.foldLeft(x.bitwiseAND(lit(0xFFFFL))) { case (acc, (s, m)) =>
      acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton code over two 16-bit values: bit j of `a` at 2j, bit
    * j of `b` at 2j+1 — the top bits ALTERNATE dimensions, so range
    * splits of the code cut both dimensions evenly */
  def zorder32(a: Column, b: Column): Column =
    spread16(a.cast("long")).bitwiseOR(shiftleft(spread16(b.cast("long")), 1))

  /** min/max-scale an integer column to the 16-bit Morton domain */
  private def scale16(x: Column, lo: Long, hi: Long): Column =
    ((x.cast("long") - lit(lo)) * lit(65535L) / lit(math.max(hi - lo, 1L))).cast("long")

  /**
   * Write `df` Z-clustered on integer expressions (a, b).
   *
   * One bounds pass (a 4-scalar aggregate — at a real deployment the
   * catalog's column stats replace it), then ONE range exchange on the
   * Morton code with an in-partition sort: every output file covers a
   * tight (a, b) rectangle. Both columns are min/max-scaled to 16 bits
   * first so dimensions of very different magnitudes (day numbers vs
   * keys) still alternate in the code's high bits — unscaled, the wider
   * dimension would monopolize every split.
   */
  def writeZOrdered(
      df: DataFrame, a: Column, b: Column, path: String, numFiles: Int): Unit = {
    val bounds = df.agg(
      min(a.cast("long")), max(a.cast("long")),
      min(b.cast("long")), max(b.cast("long"))).head()
    if (bounds.isNullAt(0) || bounds.isNullAt(2)) {
      // empty input (or an all-null dimension): nothing to cluster —
      // write as-is instead of NPEing on absent bounds
      df.write.mode("overwrite").parquet(path)
      return
    }
    val z = zorder32(
      scale16(a, bounds.getLong(0), bounds.getLong(1)),
      scale16(b, bounds.getLong(2), bounds.getLong(3)))
    df.withColumn("__graft_z", z)
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)
  }

  /**
   * Bucketed-table layout: persist `df` hash-bucketed (and sorted)
   * on `key` via the catalog. Two tables bucketed on the same key with
   * the same bucket count join WITHOUT any exchange — the partitioning
   * is baked into the file layout, so the recurring fact-fact join
   * shuffle is paid ONCE at write time and never again. At 100 TB this
   * is the difference between re-shuffling both sides on every run of
   * a daily join and streaming co-located buckets file-against-file.
   */
  /**
   * Small-file compaction (OPTIMIZE bin-pack): rewrite a fragmented
   * parquet directory into files of ~`targetFileBytes`. Streaming
   * micro-batch sinks leave thousands of small files whose per-file
   * open/footer/stat cost comes to dominate scan time; compaction
   * restores the scan-friendly layout. File count is sized from the
   * ACTUAL on-disk bytes (not a guess), and the rewrite uses coalesce —
   * a file-boundary change, NOT a shuffle: tasks concatenate input
   * splits, no row ever crosses the wire on a key. At 100 TB this runs
   * per partition-directory, compacting only dirs whose small-file
   * count crossed a threshold. Returns (filesBefore, filesAfter).
   */
  def compact(
      spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetFileBytes: Long): (Int, Int) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(inPath))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val totalBytes = parts.map(_.getLen).sum
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inPath)
      .coalesce(nFiles)
      .write.mode("overwrite").parquet(outPath)
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    (parts.length, after)
  }

  def writeBucketed(df: DataFrame, key: String, table: String, numBuckets: Int): Unit = {
    val spark = df.sparkSession
    // a previous JVM can leave the managed location behind while the
    // (in-memory) catalog has forgotten the table — CTAS then refuses
    // the orphaned directory. Unknown table + existing dir = stale.
    if (!spark.catalog.tableExists(table)) {
      val wh = java.nio.file.Paths.get(new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir")).getPath)
      val loc = wh.resolve(table.toLowerCase)
      if (java.nio.file.Files.isDirectory(loc)) {
        java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }
}
