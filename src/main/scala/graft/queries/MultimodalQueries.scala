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
    // resize planning: aspect-preserving fit into 128x128 — metadata
    // arithmetic is exact, so this gets a full oracle even though the
    // pixel resample itself sits behind the codec stub
    "mm_resize" -> { (s, dir) =>
      val mf = Multimodal.manifestFrom(Tables(s, dir, "documents"), "doc_id", "text")
      Multimodal.planResize(mf, maxW = 128, maxH = 128)
        .select(col("asset_id"), col("in_w"), col("in_h"), col("out_w"), col("out_h"))
    },
    // frame sampling cardinality is pure arithmetic -> exact oracle
    "mm_frames" -> { (s, dir) =>
      val mf = Multimodal.manifestFrom(Tables(s, dir, "documents"), "doc_id", "text")
      Multimodal.sampleFrames(mf, everyMs = 1000L)
        .groupBy("asset_id")
        .agg(count(lit(1)).as("n_frames"))
    },
    // END-TO-END multimodal similarity: manifest -> batched stub decode
    // -> 8-dim feature -> exact top-3 neighbor search (the decode stub
    // is pure byte arithmetic, so even the composed pipeline keeps a
    // full DuckDB oracle — swap the codec and only the features change).
    // Same plan as knn_flat: one corpus scan, map-side partial top-k.
    "mm_knn" -> { (s, dir) =>
      val mf = Multimodal.manifestFrom(Tables.wide(s, dir, "documents"), "doc_id", "text")
      val feats = Multimodal.decodeFeatures(mf).select(col("asset_id"), col("feature"))
      val q = feats.where(col("asset_id") < 10)
        .select(col("asset_id").as("qid"), col("feature").as("qvec"))
      val d = feats.select(col("asset_id").as("label"), col("feature").as("vec"))
      graft.search.Knn.searchFlat(d, q, 3, "l2sq")
        .select(col("qid"), col("rank"), col("label"),
          Tables.quant4(col("distance")).as("distance"))
    },
    // multimodal near-dup screen: decoded-feature pairs within an L2^2
    // radius over a bounded id window (the dedup_embedding pattern on
    // the OTHER modality) — decode and pairing compose in one plan, and
    // the replayable stub keeps the oracle exact. The 100 TB shape is
    // AnnJoin.ivfRadiusJoin over the same features (dedup_embedding_ann)
    "mm_dedup" -> { (s, dir) =>
      val mf = Multimodal.manifestFrom(Tables.wide(s, dir, "documents"), "doc_id", "text")
      val feats = Multimodal.decodeFeatures(mf).select(col("asset_id"), col("feature"))
      val a = feats.select(col("asset_id").as("a_id"), col("feature").as("fa"))
      val b = feats.select(col("asset_id").as("b_id"), col("feature").as("fb"))
      a.join(b, col("b_id") > col("a_id") && col("b_id") <= col("a_id") + 50)
        .select(col("a_id"), col("b_id"),
          graft.functions.vec.dist("l2sq",
            graft.functions.vec.vector(col("fa")),
            graft.functions.vec.vector(col("fb"))).as("d"))
        .where(col("d") < 0.001)
        .select(col("a_id"), col("b_id"), Tables.quant8(col("d")).as("feat_dist"))
    })

  def oracles: Map[String, String] = Map(
    // the stub decode is pure byte arithmetic over ASCII payloads:
    // slot-0 feature = mean of bytes at positions 1,9,17,... (double
    // accumulation in input order, float-rounded once at the end)
    "mm_decode" ->
      """SELECT doc_id AS asset_id,
        |  ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS modality,
        |  CAST(length(text) AS INTEGER) AS n_bytes,
        |  CAST(CAST(CASE WHEN length(text) = 0 THEN 0.0 ELSE
        |    CAST(CAST(list_sum([CAST(ord(substr(text, i, 1)) AS DOUBLE) / 255.0
        |           FOR i IN range(1, length(text) + 1, 8)])
        |         / greatest(1, length(text) // 8) AS FLOAT) AS DOUBLE)
        |    END AS DECIMAL(18,4)) AS DOUBLE) AS f0,
        |  CAST(greatest(1, (length(text) * 10) // 1000) AS INTEGER) AS frames_sampled
        |FROM documents""".stripMargin,
    "mm_resize" ->
      """WITH m AS (
        |  SELECT doc_id AS asset_id,
        |    32 + (doc_id % 7) * 64 AS w, 32 + (doc_id % 5) * 48 AS h
        |  FROM documents
        |)
        |SELECT asset_id,
        |  CAST(w AS INTEGER) AS in_w, CAST(h AS INTEGER) AS in_h,
        |  CAST(CASE WHEN w <= 128 AND h <= 128 THEN w
        |            WHEN w * 128 >= h * 128 THEN 128
        |            ELSE floor(CAST(w * 128 AS DOUBLE) / CAST(h AS DOUBLE)) END AS INTEGER) AS out_w,
        |  CAST(CASE WHEN w <= 128 AND h <= 128 THEN h
        |            WHEN w * 128 >= h * 128 THEN floor(CAST(h * 128 AS DOUBLE) / CAST(w AS DOUBLE))
        |            ELSE 128 END AS INTEGER) AS out_h
        |FROM m""".stripMargin,
    "mm_frames" ->
      """SELECT doc_id AS asset_id,
        |  CAST(floor((length(text) * 10 - 1) / 1000) AS BIGINT) + 1 AS n_frames
        |FROM documents
        |WHERE doc_id % 3 = 2""".stripMargin,
    // the full 8-dim stub feature replayed in SQL (slot j = float-rounded
    // mean of bytes at positions j, j+8, ...), then brute-force top-3 by
    // L2^2 with the identical double accumulation the kernel runs
    "mm_knn" ->
      """WITH f AS (
        |  SELECT doc_id AS asset_id,
        |    [CAST(coalesce(list_sum([CAST(ord(substr(text, i, 1)) AS DOUBLE) / 255.0
        |                             FOR i IN range(j, length(text) + 1, 8)]), 0.0)
        |          / greatest(1, length(text) // 8) AS FLOAT)
        |     FOR j IN range(1, 9)] AS feature
        |  FROM documents
        |),
        |q AS (SELECT asset_id AS qid, feature AS a FROM f WHERE asset_id < 10),
        |d AS (
        |  SELECT q.qid, e.asset_id AS label,
        |    list_sum([ (CAST(a[i] AS DOUBLE) - CAST(b[i] AS DOUBLE)) * (CAST(a[i] AS DOUBLE) - CAST(b[i] AS DOUBLE)) FOR i IN range(1, len(a)+1) ]) AS dist
        |  FROM q CROSS JOIN (SELECT asset_id, feature AS b FROM f) e
        |),
        |r AS (
        |  SELECT qid, label, dist,
        |    CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, label) - 1 AS INTEGER) AS rank
        |  FROM d
        |)
        |SELECT qid, rank, label, CAST(CAST(dist AS DECIMAL(18,4)) AS DOUBLE) AS distance
        |FROM r WHERE rank < 3""".stripMargin,
    // same stub-feature replay, windowed pair join, radius predicate
    "mm_dedup" ->
      """WITH f AS (
        |  SELECT doc_id AS asset_id,
        |    [CAST(coalesce(list_sum([CAST(ord(substr(text, i, 1)) AS DOUBLE) / 255.0
        |                             FOR i IN range(j, length(text) + 1, 8)]), 0.0)
        |          / greatest(1, length(text) // 8) AS FLOAT)
        |     FOR j IN range(1, 9)] AS feature
        |  FROM documents
        |),
        |p AS (
        |  SELECT a.asset_id AS a_id, b.asset_id AS b_id,
        |    list_sum([ (CAST(a.feature[i] AS DOUBLE) - CAST(b.feature[i] AS DOUBLE)) * (CAST(a.feature[i] AS DOUBLE) - CAST(b.feature[i] AS DOUBLE)) FOR i IN range(1, 9) ]) AS d
        |  FROM f a JOIN f b ON b.asset_id > a.asset_id AND b.asset_id <= a.asset_id + 50
        |)
        |SELECT a_id, b_id, CAST(CAST(d AS DECIMAL(18,8)) AS DOUBLE) AS feat_dist
        |FROM p WHERE d < 0.001""".stripMargin)
}
