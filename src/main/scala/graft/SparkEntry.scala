package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{EditQueries, FeatureQueries, IoQueries, KernelQueries, LlmQueries, Relational, SqaQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship per-segment cardiac SQA metrics table
    * (pipeline/SQA.py:161-197): detected/expected/missing/artifact beats
    * and invalid flags per (subject, segment) over the canonical signal
    * frame. */
  def entry(spark: SparkSession): DataFrame =
    SqaQueries.queries("q19_sqa_metrics")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ LlmQueries.queries ++ SqaQueries.queries ++
      KernelQueries.queries ++ FeatureQueries.queries ++ EditQueries.queries ++ IoQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ LlmQueries.oracleSql ++ SqaQueries.oracleSql ++
      KernelQueries.oracleSql ++ FeatureQueries.oracleSql ++ EditQueries.oracleSql ++ IoQueries.oracleSql
}
