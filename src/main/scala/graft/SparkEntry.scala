package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{IcebergQueries, QueryDef, Relational, SimilarityQueries, Text}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 (plus the LLM-pipeline
  * extensions) surfaces here as a named query; SQL-expressible ones carry a
  * DuckDB oracle for the hash-match correctness gate.
  */
object SparkEntry {

  def all: Seq[QueryDef] =
    Relational.defs ++ Text.defs ++ SimilarityQueries.defs ++ IcebergQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
