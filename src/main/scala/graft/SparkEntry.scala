package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * pipeline_rag composes the engine end-to-end: quality gate →
    * exact-dedup survivors → embedding join → catalog IVF build → serve. */
  def entry(spark: SparkSession): DataFrame =
    RetrievalQueries.queries("pipeline_rag")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ AnalyticsQueries.queries ++
      VectorQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++ IndexQueries.queries ++
      IndexQueries.scaleQueries ++ MultimodalQueries.queries ++
      PipelineQueries.queries ++ RetrievalQueries.queries ++ SqlQueries.queries ++
      StreamingParityQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ AnalyticsQueries.oracles ++
      VectorQueries.oracles ++
      TextQueries.oracles ++ DedupQueries.oracles ++ IndexQueries.oracles ++
      MultimodalQueries.oracles ++ PipelineQueries.oracles ++
      RetrievalQueries.oracles ++ SqlQueries.oracles ++
      StreamingParityQueries.oracles
}
