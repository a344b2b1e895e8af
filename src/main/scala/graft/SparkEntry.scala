package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dedup.Dedup
import graft.multimodal.MultimodalQueries
import graft.queries.{ControlPlaneQueries, ExtendedQueries, PipelineQueries, RelationalQueries}
import graft.similarity.Similarity
import graft.streaming.StreamReplay
import graft.text.TextAnalysis

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate every module's query surface; each
  * module keeps its own map so operators, tests, and oracles live together.
  */
object SparkEntry {

  /** Flagship query (SURVEY §2.3 multi-way join, TPC-H Q5 shape) on
    * sf0.001; the driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q03JoinRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ ExtendedQueries.queries ++
      PipelineQueries.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ StreamReplay.queries ++
      MultimodalQueries.queries ++ ControlPlaneQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ ExtendedQueries.oracleSql ++
      PipelineQueries.oracleSql ++ TextAnalysis.oracleSql ++
      Dedup.oracleSql ++ Similarity.oracleSql ++ StreamReplay.oracleSql ++
      MultimodalQueries.oracleSql ++ ControlPlaneQueries.oracleSql
}
