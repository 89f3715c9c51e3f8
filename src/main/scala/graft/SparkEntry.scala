package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every operator module's declared queries + oracle SQL. */
object SparkEntry {

  /** Flagship query (SURVEY §7.3) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Basics.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Basics.queries ++ ops.Joins.queries ++ ops.Aggregates.queries ++
      ops.Windows.queries ++ ops.Events.queries ++ ops.SortsLimits.queries ++ ops.SetOps.queries ++
      ops.Functions.queries ++ ops.LlmText.queries ++ ops.LlmPipeline.queries ++ ops.LlmVector.queries ++
      ops.Multimodal.queries ++ ops.Formats.queries ++ ops.Storage.queries ++
      ops.SystemTables.queries ++ ops.Streaming.queries ++ ops.Udafs.queries ++
      ops.Sampling.queries ++ fuzz.Differential.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Basics.oracles ++ ops.Joins.oracles ++ ops.Aggregates.oracles ++
      ops.Windows.oracles ++ ops.Events.oracles ++ ops.SortsLimits.oracles ++ ops.SetOps.oracles ++
      ops.Functions.oracles ++ ops.LlmText.oracles ++ ops.LlmPipeline.oracles ++ ops.LlmVector.oracles ++
      ops.Multimodal.oracles ++ ops.Formats.oracles ++ ops.Storage.oracles ++
      ops.SystemTables.oracles ++ ops.Streaming.oracles ++ ops.Udafs.oracles ++
      ops.Sampling.oracles ++ fuzz.Differential.oracles
}
