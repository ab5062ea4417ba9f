package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/**
 * Storage-layout scale guards: the two on-disk layouts SURVEY §5 leans
 * on at 100 TB — bucketed tables for shuffle-free co-located joins,
 * and value-partitioned sinks for partition pruning — demonstrated and
 * plan-asserted on the real test tables.
 */
class StorageLayoutSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val wh = Files.createTempDirectory("graft_layout_wh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_layout LOCATION '$wh'")
    try {
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_layout.li_b")
      spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_layout.ord_b")
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.table("graft_layout.li_b")
          .join(spark.table("graft_layout.ord_b"), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
        val plan = j.queryExecution.executedPlan.toString
        // matching bucket counts -> SortMergeJoin reads buckets directly,
        // with NO exchange on either join side (the join itself is
        // shuffle-free; only the final small aggregate repartitions)
        val joinSection = plan.split("SortMergeJoin")(1)
        assert(plan.contains("SortMergeJoin"), plan.take(3000))
        assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey")
          && !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
          plan.take(3000))
        assert(plan.contains("SelectedBucketsCount"), plan.take(3000))
        // and the answer matches the unbucketed plan
        val want = spark.read.parquet(s"$dir/lineitem.parquet")
          .join(spark.read.parquet(s"$dir/orders.parquet"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        val got = j.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        assert(got === want)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally spark.sql("DROP DATABASE IF EXISTS graft_layout CASCADE")
  }

  test("layout_bucketed gate query: bucketed layout eliminates both join-side exchanges") {
    val q = graft.SparkEntry.queries("layout_bucketed")(spark, dir)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(3000))
    // everything BELOW the join (its two sides) must be exchange-free:
    // the bucketed files ARE the partitioning. Only the priority
    // aggregate above the join may repartition.
    val joinSection = plan.split("SortMergeJoin")(1)
    assert(!joinSection.contains("Exchange hashpartitioning"), plan.take(4000))
    assert(plan.contains("Bucketed: true"), plan.take(3000))
  }

  test("z-order layout: files cover tight rectangles in BOTH dims; linear sort serves only one") {
    import org.apache.spark.sql.DataFrame
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val day = datediff(col("l_shipdate"), lit("1992-01-01"))
    val nFiles = 32
    val zOut = Files.createTempDirectory("graft_zorder").toString
    Layout.writeZOrdered(li, day, col("l_partkey"), zOut, nFiles)
    // the comparison layout: linear sort on shipdate (what a naive
    // time-series table does) — same file count
    val linOut = Files.createTempDirectory("graft_linear").toString
    li.withColumn("__d", day).repartitionByRange(nFiles, col("__d"))
      .sortWithinPartitions(col("__d")).drop("__d")
      .write.mode("overwrite").parquet(linOut)

    // per-FILE value ranges (what parquet footer min/max stats expose to
    // the scan) for both layouts
    def fileRanges(path: String): Array[(Long, Long, Long, Long)] =
      new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(day), max(day), min("l_partkey"), max("l_partkey")).head()
        (r.getInt(0).toLong, r.getInt(1).toLong, r.getLong(2), r.getLong(3))
      }
    val zR = fileRanges(zOut)
    val linR = fileRanges(linOut)
    assert(zR.length >= nFiles / 2 && linR.length >= nFiles / 2)

    // a ~25%-per-dim rectangle: count files a stats-based scan CANNOT
    // skip (range intersects the predicate) under each layout
    val (d0, d1) = (1096L, 1461L) // 1995 in day numbers
    val (p0, p1) = (100L, 149L)
    def cantSkip(rs: Array[(Long, Long, Long, Long)],
        dayPred: Boolean, pkPred: Boolean): Int =
      rs.count { case (dl, dh, pl, ph) =>
        (!dayPred || (dh >= d0 && dl <= d1)) && (!pkPred || (ph >= p0 && pl <= p1)) }

    // partkey-only predicate: the linear (time-sorted) layout can skip
    // NOTHING — every file spans ~the full key range; z-order skips most
    assert(cantSkip(linR, dayPred = false, pkPred = true) === linR.length,
      "time-sorted files should all intersect a key predicate")
    assert(cantSkip(zR, dayPred = false, pkPred = true) <= zR.length / 2,
      s"z-order must let a key-only predicate skip files: ${zR.mkString(", ")}")
    // the 2-D rectangle: z-order reads strictly fewer files than the
    // linear layout's date pruning alone
    assert(cantSkip(zR, dayPred = true, pkPred = true) <
      cantSkip(linR, dayPred = true, pkPred = true),
      s"z=${zR.mkString(",")} lin=${linR.mkString(",")}")

    // and the layout never changes RESULTS: the gate rectangle selects
    // identical rows from both copies
    def sel(path: String): Long = spark.read.parquet(path)
      .where(day.between(d0, d1) && col("l_partkey").between(p0, p1 - 1)).count()
    assert(sel(zOut) === sel(linOut))
  }

  test("compaction bin-packs small files without changing contents, and never shuffles") {
    val base = Files.createTempDirectory("graft_compact").toString
    val frag = s"$base/frag"; val out = s"$base/out"
    val src = spark.read.parquet(s"$dir/lineitem.parquet")
    src.repartition(32).write.mode("overwrite").parquet(frag)
    val (before, after) = Layout.compact(spark, frag, out, targetFileBytes = 256L << 20)
    assert(before === 32)
    assert(after < before, s"expected fewer files, got $after")
    // contents are invariant: same rows, same per-key aggregates
    val a = spark.read.parquet(out)
    assert(a.count() === src.count())
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag")
        .agg(sum(col("l_quantity").cast("long")).as("q"), count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(agg(a) === agg(src))
    // the rewrite is a file-boundary change: no exchange in its plan
    val plan = spark.read.parquet(frag).coalesce(1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1000))
  }

  test("value-partitioned sink prunes partitions at the scan") {
    val out = Files.createTempDirectory("graft_part_events").toString
    val e = graft.queries.Tables.events(spark, dir)
    e.select("event_id", "event_type", "value")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val clicks = spark.read.parquet(out).where(col("event_type") === "click")
    val plan = clicks.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"), plan.take(2000))
    // only the click partition is read
    assert(clicks.count() ===
      e.where(col("event_type") === "click").count())
  }

  test("layout-gate fingerprint: regenerated input gets a fresh layout key") {
    import graft.queries.Tables
    val d = Files.createTempDirectory("graft_fp").toString
    val t = new java.io.File(s"$d/lineitem.parquet")
    Files.write(t.toPath, Array[Byte](1, 2, 3))
    val fp1 = Tables.fingerprint(d, "lineitem")
    assert(fp1 === Tables.fingerprint(d, "lineitem"), "fingerprint must be stable")
    // regenerate: same path, different bytes/mtime -> different key, so a
    // write-once gate dir keyed on it can never serve the stale layout
    Files.write(t.toPath, Array[Byte](1, 2, 3, 4))
    t.setLastModified(t.lastModified() + 2000)
    val fp2 = Tables.fingerprint(d, "lineitem")
    assert(fp1 !== fp2, "regenerated input must change the layout key")
    // multi-table keys react to any member changing
    val o = new java.io.File(s"$d/orders.parquet")
    Files.write(o.toPath, Array[Byte](9))
    val both1 = Tables.fingerprint(d, "orders", "lineitem")
    o.setLastModified(o.lastModified() + 2000)
    assert(both1 !== Tables.fingerprint(d, "orders", "lineitem"))
  }
}
