package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Streaming

/**
 * State-store scale rung (VERDICT r11 #4): the parity gates pin
 * streaming SEMANTICS at small key counts; this tool measures state
 * BEHAVIOR at serving cardinality — ~1e7 distinct keys through the
 * stateful operators a pipeline actually runs long-lived (windowed
 * agg, session windows, custom FMGWS state), recording state rows,
 * state memory, throughput, and per-batch wall as the store fills.
 *
 * Source: the `rate` source (deterministic monotone timestamps, no
 * disk), key = value % keys so every batch touches a uniform slice of
 * the key space — the adversarial shape for an in-memory store (no
 * locality, every key eventually resident).
 *
 * Usage:
 *   SPARK_GRAFT_SS_KEYS=10000000 SPARK_GRAFT_SS_ROWS_PER_SEC=2000000 \
 *   SPARK_GRAFT_SS_SECONDS=60 SPARK_GRAFT_SS_PROVIDER=rocksdb \
 *   sbt "runMain graft.tools.StreamStateProfile"
 * Emits one JSON line per (op, batch) plus a final summary line per op.
 */
object StreamStateProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val keys = sys.env.getOrElse("SPARK_GRAFT_SS_KEYS", "10000000").toLong
    val rps = sys.env.getOrElse("SPARK_GRAFT_SS_ROWS_PER_SEC", "2000000").toLong
    val secs = sys.env.getOrElse("SPARK_GRAFT_SS_SECONDS", "60").toInt
    val provider = sys.env.getOrElse("SPARK_GRAFT_SS_PROVIDER", "hdfs")
    val opsFilter = sys.env.get("SPARK_GRAFT_SS_ONLY").map(_.split(",").toSet)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // RocksDB state store: the disk-backed provider for key counts the
    // executor heap can't hold (ships with Spark 4, no extra deps).
    // HDFSBacked (default) keeps every key's state in the JVM heap —
    // fine to ~1e7 small values, the wall past that.
    if (provider == "rocksdb")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def rate(): org.apache.spark.sql.DataFrame =
      spark.readStream.format("rate")
        .option("rowsPerSecond", rps)
        .option("numPartitions", cpus)
        .load()
        // uniform key spray over the full space; event time advances
        // with the rate clock so watermarks progress realistically
        .select(
          col("timestamp").as("ts"),
          pmod(col("value"), lit(keys)).as("user_id"),
          element_at(array(lit("view"), lit("click"), lit("purchase"), lit("scroll")),
            (pmod(col("value"), lit(4)) + 1).cast("int")).as("event_type"),
          col("value").as("event_id"))

    // each op: (name, outputMode, streaming transform). Watermark kept
    // short so windows close while the run is live (state churns, not
    // only grows).
    val ops: Seq[(String, String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
      // windowed agg keyed PER USER (hourlyWindowAggExact's state path —
      // StateStoreSave under a streaming aggregate — at per-key
      // cardinality instead of its 4-event-type grouping)
      ("window_agg", "update", df =>
        df.withWatermark("ts", "10 seconds")
          .groupBy(window(col("ts"), "30 seconds").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))),
      // session windows: state = open session per user
      ("sessionize", "append", df => Streaming.sessionWindowAgg(
        df.select(col("user_id"), col("event_id"), col("ts")),
        gap = "5 seconds", watermark = "10 seconds")),
      // custom FMGWS funnel state per user (the hand-rolled state path)
      ("funnel_fmgws", "append", df => Streaming.funnelFMGWS(
        df.select(col("user_id"), col("event_type"), col("ts")).as[Streaming.TypedEv],
        watermark = "10 seconds", idleCloseMs = 15000L).toDF),
      // streaming exact dedup: one state row PER EVENT ID inside the
      // watermark — the unbounded-key shape (state grows with input
      // rate x watermark, not with a fixed key space)
      ("dedup", "append", df =>
        df.withWatermark("ts", "10 seconds")
          .dropDuplicates("event_id", "ts"))
    )

    for ((name, mode, xform) <- ops if opsFilter.forall(_.contains(name))) {
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_ss_$name").toString
      val q = xform(rate())
        .writeStream.format("noop") // sink cost excluded: state is the subject
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime("5 seconds"))
        .start()
      val t0 = System.nanoTime()
      var lastRows = 0L
      try {
        while ((System.nanoTime() - t0) / 1e9 < secs) {
          Thread.sleep(5000)
          val p = q.lastProgress
          if (p != null && p.numInputRows > 0) {
            val so = if (p.stateOperators.nonEmpty) p.stateOperators(0) else null
            val stateRows = if (so != null) so.numRowsTotal else -1L
            val stateMem = if (so != null) so.memoryUsedBytes else -1L
            lastRows = stateRows
            println(
              s"""{"bench":"stream_state","op":"$name","provider":"$provider","keys":$keys,""" +
                s""""batch_id":${p.batchId},"input_rows":${p.numInputRows},""" +
                s""""proc_rows_per_sec":${p.processedRowsPerSecond},""" +
                s""""batch_ms":${p.durationMs.getOrDefault("triggerExecution", -1L)},""" +
                s""""state_rows":$stateRows,"state_mem_bytes":$stateMem}""")
          }
        }
      } finally {
        q.stop()
        println(
          s"""{"bench":"stream_state_final","op":"$name","provider":"$provider","keys":$keys,""" +
            s""""final_state_rows":$lastRows,"ran_sec":${(System.nanoTime() - t0) / 1e9}}""")
        // settle before touching the checkpoint: RocksDB's JNI logger
        // callback can SIGSEGV if its directory is deleted (or the JVM
        // exits) while the store's native side is still flushing — the
        // stores unload asynchronously after stop()
        if (provider == "rocksdb") Thread.sleep(3000)
        // checkpoint dirs are disposable scratch
        try {
          import scala.reflect.io.Directory
          new Directory(new java.io.File(ckpt)).deleteRecursively()
        } catch { case _: Throwable => () }
      }
    }
    spark.stop()
  }
}
