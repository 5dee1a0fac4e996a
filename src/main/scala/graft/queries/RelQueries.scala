package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.core.Tables

/** Relational workload keys: a pricing-summary aggregation and a
  * dim-enrichment join over the TPC-H-ish tables. These exercise the
  * scale-critical physical shapes — map-side-combined hash aggregation
  * and broadcast-hash joins (dims broadcast, no shuffle of the fact
  * table). Double sums go through DECIMAL so partial-aggregation order
  * can never change the result (exact, engine-portable), then cast back
  * to double for output.
  */
object RelQueries {

  private def dec(c: String) = col(c).cast(DecimalType(18, 2))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec("l_quantity")).cast(DoubleType).as("sum_qty"),
          sum(dec("l_extendedprice")).cast(DoubleType).as("sum_price"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")),

    "join_enrich" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val customer = broadcast(Tables.load(s, dir, "customer"))
      val nation = broadcast(Tables.load(s, dir, "nation"))
      orders
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec("o_totalprice")).cast(DoubleType).as("total"))
        .orderBy("n_name")
    }),

    // TPC-H Q6-shaped forecast-revenue scan: every predicate pushes to
    // the parquet scan (PushedFilters + row-group skipping on
    // l_shipdate), only 4 columns read — the pure scan-efficiency
    // benchmark at 100 TB. The float product runs in double (same
    // operands both engines), the SUM through decimal.
    "q6_forecast" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(expr("l_shipdate >= TIMESTAMP '1996-01-01'") &&
          expr("l_shipdate < TIMESTAMP '1997-01-01'") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(
          sum((col("l_extendedprice") * col("l_discount"))
            .cast(DecimalType(18, 6))).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n"))),

    // Per-customer running revenue — cumulative window sum routed
    // through DECIMAL (running double sums are accumulation-order
    // dependent; decimal addition is exact, so the prefix sums are
    // unique on every engine and partitioning).
    "orders_running_total" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          sum(dec("o_totalprice")).over(w).cast(DoubleType)
            .as("running_rev"))
        .orderBy("o_orderkey")
    }),
  )

  def oracle: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "join_enrich" ->
      """SELECT n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q6_forecast" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
        |       AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "orders_running_total" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |       OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_rev
        |FROM orders ORDER BY o_orderkey""".stripMargin,
  )
}
