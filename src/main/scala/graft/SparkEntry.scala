package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full named operator suite (SURVEY.md §2 inventory plus
  * the LLM-data-pipeline extensions); `oracleSql` carries the DuckDB
  * equivalent for every SQL-expressible entry. Both are assembled in
  * [[graft.queries.Registry]].
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. The 4-way
    * join + top-k route query exercises scan→join→project→agg→sort, the
    * spine of the reference dashboard (SURVEY.md §3.3). */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("q21_route_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (the
    * driver records a weaker rows-only check for those). */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
