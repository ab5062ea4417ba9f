package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/**
 * The events loader must tolerate every physical `ts` encoding the
 * testdata generator has shipped: TIMESTAMP(NANOS) (arrives as LongType
 * under the legacy nanosAsLong flag), timestamp[us] without timezone
 * (arrives as TIMESTAMP_NTZ), and plain session-local TIMESTAMP. A
 * regeneration that switches encoding broke 23 gate queries once
 * (round 6); this pins all three paths to identical values.
 */
class EventsSchemaSpec extends SparkSpec {

  // one event at a known instant: 2024-03-01 12:00:00 UTC
  private val micros = 1709294400000000L

  private def base = {
    val s = spark
    import s.implicits._
    Seq((1L, 7L, "click", 2.5, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
  }

  private def load(dir: String) = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType,
      s"ts must land as session-local TimestampType, got ${df.schema("ts").dataType}")
    df.select(col("event_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("nanos-as-long encoding resolves through the shim") {
    val dir = Files.createTempDirectory("graft_ev_nanos").toString
    base.withColumn("ts", lit(micros * 1000L))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(load(dir) === Set((1L, micros)))
  }

  test("timestamp_ntz (timestamp[us]) encoding passes through") {
    val dir = Files.createTempDirectory("graft_ev_ntz").toString
    base.withColumn("ts", timestamp_micros(lit(micros)).cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(load(dir) === Set((1L, micros)))
  }

  test("session-local timestamp encoding passes through") {
    val dir = Files.createTempDirectory("graft_ev_ltz").toString
    base.withColumn("ts", timestamp_micros(lit(micros)))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(load(dir) === Set((1L, micros)))
  }

  // same regeneration hazard, embeddings flavor: the generator could
  // plausibly switch `embedding` to double elements or `label` to
  // int64. The whole vector surface funnels through vec.vector's
  // array<float> cast, so both variants must produce identical search
  // results — pinned here so a regeneration can't silently break the
  // 45-query vector family the way ts broke events.
  test("embeddings tolerate double-element vectors and int64 labels") {
    val s = spark
    import s.implicits._
    val f32 = Seq(
      (0L, Array(0.25f, 0.5f), 0),
      (1L, Array(1.5f, 2.0f), 1),
      (2L, Array(4.0f, 4.5f), 0))
      .toDF("vec_id", "embedding", "label")
    val dirA = Files.createTempDirectory("graft_emb_f32").toString
    f32.write.mode("overwrite").parquet(s"$dirA/embeddings.parquet")
    val dirB = Files.createTempDirectory("graft_emb_f64").toString
    f32.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"),
        col("label").cast("long").as("label"))
      .write.mode("overwrite").parquet(s"$dirB/embeddings.parquet")
    def searched(dir: String) = {
      val e = Tables(spark, dir, "embeddings")
        .select(col("vec_id").as("label"), graft.functions.vec.vector(col("embedding")).as("vec"))
      val q = Tables(spark, dir, "embeddings").where(col("vec_id") < 2)
        .select(col("vec_id").as("qid"), graft.functions.vec.vector(col("embedding")).as("qvec"))
      graft.search.Knn.searchFlat(e, q, 2, "l2sq")
        .select(col("qid"), col("rank"), col("label"), Tables.quant4(col("distance")))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    }
    assert(searched(dirB) === searched(dirA))
    assert(searched(dirA).nonEmpty)
  }
}
