package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.index.IndexCatalog

/** Typed result rows for Scala callers — case-class `Encoder`s give
  * compile-time field access (`hit.label`) where the dynamic DataFrame
  * surface gives `Row.getLong(2)`. */
case class SearchHit(qid: Long, rank: Int, label: Long, distance: Double)
case class RangeHit(qid: Long, label: Long, distance: Double)
case class Neighbor(rank: Int, label: Long, distance: Double)
case class NeighborList(qid: Long, results: Seq[Neighbor])

/**
 * Typed facade over the serving surface. Same plans as the DataFrame
 * API — `.as[T]` only attaches an encoder, it adds no extra stage —
 * so there is no performance tax for the type safety. The dynamic
 * DataFrame surface stays primary (schemas vary with index kind and
 * params); these wrappers pin the STABLE result shapes a Scala
 * application codes against: per-row hits, range hits, and the
 * reference's nested LIST<STRUCT(rank,label,distance)>.
 */
object Typed {

  private def hits(df: DataFrame): Dataset[SearchHit] = {
    val s = df.sparkSession
    import s.implicits._
    df.selectExpr(
      "CAST(qid AS BIGINT) AS qid", "CAST(rank AS INT) AS rank",
      "CAST(label AS BIGINT) AS label", "CAST(distance AS DOUBLE) AS distance")
      .as[SearchHit]
  }

  def search(
      name: String, k: Int, queries: DataFrame,
      params: Map[String, String] = Map.empty): Dataset[SearchHit] =
    hits(IndexCatalog.search(name, k, queries, params))

  def searchFilterSet(
      name: String, k: Int, queries: DataFrame, ids: DataFrame,
      params: Map[String, String] = Map.empty): Dataset[SearchHit] =
    hits(IndexCatalog.searchFilterSet(name, k, queries, ids, params))

  def searchRadius(
      name: String, radius: Double, queries: DataFrame,
      params: Map[String, String] = Map.empty): Dataset[RangeHit] = {
    val df = IndexCatalog.searchRadius(name, radius, queries, params)
    val s = df.sparkSession
    import s.implicits._
    df.selectExpr(
      "CAST(qid AS BIGINT) AS qid", "CAST(label AS BIGINT) AS label",
      "CAST(distance AS DOUBLE) AS distance")
      .as[RangeHit]
  }

  def searchNested(
      name: String, k: Int, queries: DataFrame,
      params: Map[String, String] = Map.empty): Dataset[NeighborList] = {
    val df = IndexCatalog.searchNested(name, k, queries, params)
    val s = df.sparkSession
    import s.implicits._
    df.as[NeighborList]
  }
}
