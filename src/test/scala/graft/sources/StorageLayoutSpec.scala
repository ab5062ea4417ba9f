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
}
