package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ExtQueries, RelQueries, TsQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator key (SURVEY §2 + §2.F) to a
  * DataFrame builder over the sf-dir parquet substrate; `oracleSql`
  * holds the equivalent DuckDB SQL the driver hash-compares against.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TsQueries.queries("scan_time_range")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TsQueries.queries ++ ExtQueries.queries ++ RelQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    TsQueries.oracle ++ ExtQueries.oracle ++ RelQueries.oracle
}
