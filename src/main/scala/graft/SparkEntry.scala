package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.api.GraftQuery
import graft.functions.FunctionQueries
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every declared operator (SURVEY.md §2B/§2C) from the module
  * registries. Each query name maps to a Spark-native implementation; each
  * SQL-expressible one also carries its committed DuckDB oracle twin.
  */
object SparkEntry {

  /** Ordered registry of all operator modules. */
  def modules: Seq[graft.api.QueryModule] = Seq(
    ScanFilterQueries,
    JoinQueries,
    AggregateQueries,
    WindowQueries,
    SetOpQueries,
    FunctionQueries,
    TextQueries,
    DedupQueries,
    ScaleQueries,
    SimilarityQueries,
    MultimodalQueries,
    AsofJoinQueries,
    EventAnalyticsQueries,
    graft.streaming.StreamingQueries,
    graft.sources.IngestQueries)

  def allQueries: Seq[GraftQuery] = modules.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQueries.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
