package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{LlmQueries, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Per-user-per-hour segment quality metrics over the events stream — the
    * engine's analog of the reference's flagship per-segment SQA table
    * (pipeline/SQA.py:161-197). */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q01_seg_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ LlmQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ LlmQueries.oracleSql
}
