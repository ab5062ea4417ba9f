package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/**
 * Multimodal plumbing queries: documents stand in for binary assets
 * (payload = utf-8 bytes); decode is the stub codec, the distributed
 * shape is real (SURVEY §2 "mm_manifest").
 */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // batched partition-local decode: id, modality, size, stub feature head
    "mm_decode" -> { (s, dir) =>
      val mf = Multimodal.manifestFrom(Tables(s, dir, "documents"), "doc_id", "text")
      Multimodal.decodeFeatures(mf)
        .select(col("asset_id"), col("modality"), col("n_bytes"),
          Tables.quant4(element_at(col("feature"), 1)).as("f0"),
          col("frames_sampled"))
    },
    // frame sampling cardinality is pure arithmetic -> exact oracle
    "mm_frames" -> { (s, dir) =>
      val mf = Multimodal.manifestFrom(Tables(s, dir, "documents"), "doc_id", "text")
      Multimodal.sampleFrames(mf, everyMs = 1000L)
        .groupBy("asset_id")
        .agg(count(lit(1)).as("n_frames"))
    })

  def oracles: Map[String, String] = Map(
    "mm_frames" ->
      """SELECT doc_id AS asset_id,
        |  CAST(floor((length(text) * 10 - 1) / 1000) AS BIGINT) + 1 AS n_frames
        |FROM documents
        |WHERE doc_id % 3 = 2""".stripMargin)
}
