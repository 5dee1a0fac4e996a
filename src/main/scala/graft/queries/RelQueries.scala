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

    // SCD2 dimension build from an append log: each customer's orders
    // become validity intervals — valid_from = the order's date,
    // valid_to = the next order's date (NULL + is_current on the
    // latest). ONE lead() window over one key exchange; the shape a
    // warehouse uses to snapshot slowly-changing attributes.
    "orders_scd2_intervals" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("valid_from"), col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").as("valid_from"), col("o_totalprice"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy("o_orderkey")
    }),

    // Entity-resolution near join: supplier names within edit distance
    // 1 (one-typo records) via the FastSS deletion-neighborhood — an
    // equi-join on deletion keys (bounded (len+1)× fan-out), never an
    // all-pairs compare; codegen levenshtein verifies candidates only.
    "supplier_name_near_join" -> ((s, dir) =>
      graft.ext.Strings.nearJoin(
          Tables.load(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_name")),
          "s_suppkey", "s_name")
        .select(col("a_id").as("a_key"), col("b_id").as("b_key"),
          col("a_str").as("a_name"), col("b_str").as("b_name"), col("dist"))
        .orderBy("a_key", "b_key")),

    // CDC snapshot diff — the table-maintenance staple: two order
    // snapshots (old = keys % 13 ≠ 0; new = keys % 19 ≠ 0 with the
    // price bumped on keys % 17 = 0) diffed into per-verdict counts.
    // Scale shape: side-tagged union + ONE hash aggregation on the
    // key (map-side combinable) — never a full outer join's two-sided
    // shuffle-and-match, and only the key + compared columns travel.
    "snapshot_diff_orders" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
      val old = o.filter(col("o_orderkey") % 13 =!= 0)
        .select(col("o_orderkey"), col("o_totalprice").as("price"),
          lit(1).as("side"))
      val nw = o.filter(col("o_orderkey") % 19 =!= 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 17 === 0, col("o_totalprice") + lit(1.0d))
            .otherwise(col("o_totalprice")).as("price"),
          lit(2).as("side"))
      old.unionByName(nw)
        .groupBy("o_orderkey")
        .agg(
          max(when(col("side") === 1, col("price"))).as("old_price"),
          max(when(col("side") === 2, col("price"))).as("new_price"))
        .select(
          when(col("old_price").isNull, lit("inserted"))
            .when(col("new_price").isNull, lit("deleted"))
            .when(col("old_price") =!= col("new_price"), lit("changed"))
            .otherwise(lit("unchanged")).as("verdict"))
        .groupBy("verdict").agg(count(lit(1)).as("n"))
        .orderBy("verdict")
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

    "orders_scd2_intervals" ->
      """SELECT o_orderkey, o_custkey, o_orderdate AS valid_from,
        |  o_totalprice,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey
        |                          ORDER BY o_orderdate, o_orderkey)
        |    AS valid_to,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey
        |                          ORDER BY o_orderdate, o_orderkey)
        |    IS NULL AS is_current
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "supplier_name_near_join" ->
      """WITH k AS (
        |  SELECT s_suppkey, s_name, unnest(list_append(
        |    list_transform(range(1, len(s_name) + 1),
        |      i -> substr(s_name, 1, i - 1)
        |           || substr(s_name, i + 1, len(s_name) - i)),
        |    s_name)) AS dkey
        |  FROM supplier
        |), pairs AS (
        |  SELECT DISTINCT a.s_suppkey AS a_key, b.s_suppkey AS b_key,
        |    a.s_name AS a_name, b.s_name AS b_name
        |  FROM k a JOIN k b ON a.dkey = b.dkey AND a.s_suppkey < b.s_suppkey
        |)
        |SELECT a_key, b_key, a_name, b_name,
        |  CAST(levenshtein(a_name, b_name) AS BIGINT) AS dist
        |FROM pairs WHERE levenshtein(a_name, b_name) <= 1
        |ORDER BY a_key, b_key""".stripMargin,

    "snapshot_diff_orders" ->
      """WITH old AS (
        |  SELECT o_orderkey, o_totalprice AS price FROM orders
        |  WHERE o_orderkey % 13 <> 0
        |), nw AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 17 = 0
        |         THEN o_totalprice + CAST(1.0 AS DOUBLE)
        |         ELSE o_totalprice END AS price
        |  FROM orders WHERE o_orderkey % 19 <> 0
        |), tagged AS (
        |  SELECT o_orderkey, price, 1 AS side FROM old
        |  UNION ALL
        |  SELECT o_orderkey, price, 2 AS side FROM nw
        |), merged AS (
        |  SELECT o_orderkey,
        |    max(CASE WHEN side = 1 THEN price END) AS old_price,
        |    max(CASE WHEN side = 2 THEN price END) AS new_price
        |  FROM tagged GROUP BY o_orderkey
        |)
        |SELECT CASE WHEN old_price IS NULL THEN 'inserted'
        |            WHEN new_price IS NULL THEN 'deleted'
        |            WHEN old_price <> new_price THEN 'changed'
        |            ELSE 'unchanged' END AS verdict,
        |  count(*) AS n
        |FROM merged GROUP BY 1 ORDER BY verdict""".stripMargin,
  )
}
