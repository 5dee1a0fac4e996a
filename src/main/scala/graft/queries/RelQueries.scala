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

    // TPC-H Q3-shaped shipping priority (o_orderpriority stands in for
    // the schema's absent o_shippriority): the segment-filtered
    // customer list joins orders on custkey, lineitem joins on the
    // order key — BOTH joins unhinted (customer and orders are
    // fact-scale at 100 TB; AQE broadcasts whichever side shrinks
    // enough after its filter). Revenue products run in double, the
    // sum through DECIMAL; top 10 is TakeOrdered with a key tiebreak.
    "q3_shipping" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ords = Tables.load(s, dir, "orders")
        .filter(expr("o_orderdate < TIMESTAMP '1998-01-01'"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = Tables.load(s, dir, "lineitem")
        .filter(expr("l_shipdate > TIMESTAMP '1998-01-01'"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ords.join(cust, col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum((col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .cast(DecimalType(18, 6))).cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5-shaped local-supplier volume — the classic co-location
    // query: lineitem→orders→customer shuffle on their keys; supplier
    // joins on suppkey with the LOCAL condition s_nationkey =
    // c_nationkey; only the constant-cardinality nation⨝region dim is
    // hinted broadcast (supplier is unhinted — AQE broadcasts it while
    // it fits, shuffles when a 100 TB run outgrows it).
    "q5_local_supplier" -> ((s, dir) => {
      val reg = Tables.load(s, dir, "region")
        .filter(col("r_name") === "ASIA")
      val asiaNations = broadcast(
        Tables.load(s, dir, "nation")
          .join(reg, col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name"))
      val cust = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_nationkey")
      val ords = Tables.load(s, dir, "orders")
        .filter(expr("o_orderdate >= TIMESTAMP '1996-01-01'") &&
          expr("o_orderdate < TIMESTAMP '1997-01-01'"))
        .select("o_orderkey", "o_custkey")
      val li = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val sup = Tables.load(s, dir, "supplier")
        .select("s_suppkey", "s_nationkey")
      li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .join(asiaNations, col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum((col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .cast(DecimalType(18, 6))).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q14-shaped promo revenue share: one month of lineitem
    // joined to part on the part key (unhinted — part grows with SF;
    // AQE broadcasts while it fits). Both conditional sums are
    // decimal-exact; the final share is one double ratio, trunc6.
    "q14_promo" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(expr("l_shipdate >= TIMESTAMP '1997-01-01'") &&
          expr("l_shipdate < TIMESTAMP '1997-02-01'"))
        .select("l_partkey", "l_extendedprice", "l_discount")
      val part = Tables.load(s, dir, "part").select("p_partkey", "p_type")
      val rev = (col("l_extendedprice") * (lit(1d) - col("l_discount")))
        .cast(DecimalType(18, 6))
      li.join(part, col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast(DecimalType(18, 6)))).as("promo_dec"),
          sum(rev).as("total_dec"),
          count(lit(1)).as("n_items"))
        .select(
          graft.ext.TextStats.trunc6(lit(100d) *
            col("promo_dec").cast(DoubleType) /
            col("total_dec").cast(DoubleType)).as("promo_share"),
          col("promo_dec").cast(DoubleType).as("promo_revenue"),
          col("total_dec").cast(DoubleType).as("total_revenue"),
          col("n_items"))
    }),

    // TPC-H Q4-shaped order-priority census: orders in one quarter with
    // at least one late-shipped line (shipdate > orderdate + 90 days —
    // the substrate's analog of commit<receipt, which these tables
    // don't carry). The EXISTS is a LEFT SEMI join on the order key
    // with the range predicate as join condition — the fact side is
    // probed once, never multiplied, and the date window pushes into
    // the orders scan.
    "q4_order_priority" -> ((s, dir) => {
      val ords = Tables.load(s, dir, "orders")
        .filter(expr("o_orderdate >= TIMESTAMP '1997-07-01' AND " +
          "o_orderdate < TIMESTAMP '1997-10-01'"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val li = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
      ords.join(li,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > expr("o_orderdate + INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q7-shaped volume shipping between two nations: the
    // four-fact join chain shuffles on its keys; both nation lookups
    // ride ONE broadcast dim; the pair filter keeps either direction
    // and the rollup is (supp_nation, cust_nation, year). Decimal
    // revenue sums like q3/q5.
    "q7_volume_shipping" -> ((s, dir) => {
      val nat = broadcast(Tables.load(s, dir, "nation")
        .filter(col("n_name").isin("NATION_2", "NATION_3"))
        .select("n_nationkey", "n_name"))
      val sup = Tables.load(s, dir, "supplier")
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.load(s, dir, "customer")
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val ords = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_custkey")
      val li = Tables.load(s, dir, "lineitem")
        .filter(expr("l_shipdate >= TIMESTAMP '1996-01-01' AND " +
          "l_shipdate < TIMESTAMP '1998-01-01'"))
        .select("l_orderkey", "l_suppkey", "l_shipdate",
          "l_extendedprice", "l_discount")
      li.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_3") ||
          (col("supp_nation") === "NATION_3" &&
            col("cust_nation") === "NATION_2"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum((col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .cast(DecimalType(18, 6))).cast(DoubleType).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q10-shaped returned-item report: which customers returned
    // the most revenue in one quarter. lineitem filters to
    // l_returnflag='R' BEFORE the join (the filter pushes to the scan,
    // so only ~25% of the fact shuffles); orders' date window also
    // pushes down. customer⨝nation rides one broadcast dim; the
    // customer join itself is unhinted (fact-scale at 100 TB — AQE
    // decides). Top-20 is TakeOrdered with a key tiebreak, never a
    // global sort.
    "q10_returned_revenue" -> ((s, dir) => {
      val ords = Tables.load(s, dir, "orders")
        .filter(expr("o_orderdate >= TIMESTAMP '1997-01-01' AND " +
          "o_orderdate < TIMESTAMP '1997-04-01'"))
        .select("o_orderkey", "o_custkey")
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val cust = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
      val nat = broadcast(Tables.load(s, dir, "nation")
        .select("n_nationkey", "n_name"))
      li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum((col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .cast(DecimalType(18, 6))).cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q18-shaped large-order census: orders whose total quantity
    // exceeds 250 (top ~1%). The HAVING aggregate runs FIRST on
    // lineitem alone — map-side combinable on l_orderkey, emitting a
    // tiny key list — and orders/customer join against that list, so
    // the wide fact never joins anything at full width. At 100 TB the
    // qualifying set is small enough that AQE broadcasts it into both
    // probe joins.
    "q18_large_orders" -> ((s, dir) => {
      val bigOrders = Tables.load(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(dec("l_quantity")).as("qty_dec"))
        .filter(col("qty_dec") > 250)
        .select(col("l_orderkey").as("big_okey"),
          col("qty_dec").cast(DoubleType).as("total_qty"))
      val ords = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val cust = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_name")
      ords.join(bigOrders, col("o_orderkey") === col("big_okey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q19-shaped disjunctive-predicate revenue: three (brand,
    // size-range, quantity-range) clauses OR'd together across the
    // part join. The quantity bounds live on lineitem and the
    // brand/size bounds on part, so each side's scan prunes with the
    // UNION of its own clauses (l_quantity <= 30, p_size <= 35 —
    // derivable supersets push down) while the exact disjunction
    // evaluates on the joined row. One aggregate row out.
    "q19_disjunctive" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      val part = Tables.load(s, dir, "part")
        .filter(col("p_size") >= 1 && col("p_size") <= 35)
        .select("p_partkey", "p_brand", "p_size")
      val clause =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#9" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30))
      li.join(part, col("l_partkey") === col("p_partkey"))
        .filter(clause)
        .agg(sum((col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .cast(DecimalType(18, 6))).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

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

    // TPC-H Q13-shaped order-count distribution: how many customers
    // placed 0, 1, 2, … qualifying orders. The scale-critical move is
    // aggregating ORDERS FIRST (map-side-combinable count per custkey,
    // one row per customer out) and LEFT-joining customer against that
    // count table — never customer ⟕ raw-orders, which would multiply
    // fact rows only to collapse them again. The second aggregation
    // runs on one row per customer; the priority-class filter stands
    // in for the reference schema's absent comment column.
    "q13_customer_distribution" -> ((s, dir) => {
      val ocnt = Tables.load(s, dir, "orders")
        .filter(!col("o_orderpriority").startsWith("4"))
        .groupBy("o_custkey").agg(count(lit(1)).as("c_count"))
      Tables.load(s, dir, "customer").select("c_custkey")
        .join(ocnt, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("c_count"), lit(0L)).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q16-shaped supplier census: distinct suppliers offering
    // qualifying parts by (brand, type, size), excluding negative-
    // balance suppliers via NOT IN → a BROADCAST anti join (the
    // excluded list is bounded). part's selective filter broadcasts
    // into the lineitem bridge so the fact prunes before anything
    // shuffles; COUNT(DISTINCT) is Spark's two-level expand aggregate,
    // both levels map-side combinable on (brand,type,size,suppkey).
    "q16_supplier_census" -> ((s, dir) => {
      val badSupp = Tables.load(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      val parts = Tables.load(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#9" &&
          !col("p_type").startsWith("MEDIUM") &&
          col("p_size").isin(1, 4, 7, 10, 15, 23))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      Tables.load(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(broadcast(badSupp),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc,
          col("p_brand"), col("p_type"), col("p_size"))
    }),

    // TPC-H Q17-shaped small-quantity revenue: lineitems under 20% of
    // their part's average quantity, one brand. The correlated scalar
    // subquery decorrelates into a per-part pre-aggregation — computed
    // AFTER the brand filter prunes the fact (the average is only
    // consulted for brand parts), so the heavy agg runs on ~1/25 of
    // lineitem. The threshold compare runs entirely in decimal/int
    // (qty·n·5 < Σqty ⟺ qty < 0.2·avg) — exact on every engine, no
    // float-boundary flips.
    "q17_small_qty_revenue" -> ((s, dir) => {
      val brandParts = Tables.load(s, dir, "part")
        .filter(col("p_brand") === "Brand#9").select("p_partkey")
      val liB = Tables.load(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(brandParts, col("l_partkey") === col("p_partkey"))
      val plim = liB.groupBy(col("l_partkey").as("ap"))
        .agg(sum(dec("l_quantity")).as("sum_qty"), count(lit(1)).as("n_li"))
      liB.join(plim, col("l_partkey") === col("ap"))
        .filter(dec("l_quantity") * col("n_li") * lit(5) < col("sum_qty"))
        .agg((sum(dec("l_extendedprice")).cast(DoubleType) / lit(7.0d))
          .as("avg_yearly"), count(lit(1)).as("n_items"))
    }),

    // TPC-H Q22-shaped dormant-customer census: above-average-balance
    // customers with NO orders since 2000, rolled up by nation. The
    // global scalar (avg positive balance) is a one-row broadcast; the
    // threshold compare is decimal-exact (bal·n > Σbal ⟺ bal > avg).
    // NOT EXISTS is a LEFT ANTI join against the date-pruned order
    // custkeys — the date bound pushes to the scan, and the only fact
    // columns read are the key + date.
    "q22_dormant_customers" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val bal = cust.filter(col("c_acctbal") > 0)
        .agg(sum(dec("c_acctbal")).as("sum_pos"), count(lit(1)).as("n_pos"))
      cust.crossJoin(broadcast(bal))
        .filter(dec("c_acctbal") * col("n_pos") > col("sum_pos"))
        .join(Tables.load(s, dir, "orders")
            .filter(expr("o_orderdate >= TIMESTAMP '2000-01-01'"))
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          sum(dec("c_acctbal")).cast(DoubleType).as("totacctbal"))
        .orderBy("c_nationkey")
    }),

    // TPC-H Q12-shaped late-shipment census (the schema has no
    // l_shipmode/commit/receipt dates, so the group key is a derived
    // lateness band on l_shipdate − o_orderdate and "late" means
    // shipped >30/>90 days after ordering). Scale shape: the ship-year
    // bound pushes to the lineitem scan; ONE unhinted fact⨝fact join
    // on the order key; the high/low priority split is a conditional
    // aggregation in the same pass — never two joins or two scans.
    "q12_late_shipping" -> ((s, dir) => {
      val ords = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val li = Tables.load(s, dir, "lineitem")
        .filter(expr("l_shipdate >= TIMESTAMP '1996-01-01'") &&
          expr("l_shipdate < TIMESTAMP '1997-01-01'"))
        .select("l_orderkey", "l_shipdate")
      li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .select(
          when(datediff(col("l_shipdate"), col("o_orderdate")) > 90,
            lit("very_late"))
            .when(datediff(col("l_shipdate"), col("o_orderdate")) > 30,
              lit("late"))
            .otherwise(lit("on_time")).as("lateness"),
          col("o_orderpriority"))
        .groupBy("lateness")
        .agg(
          count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            lit(1))).as("high_line_count"),
          count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            lit(1))).as("low_line_count"))
        .orderBy("lateness")
    }),

    // TPC-H Q15-shaped top-revenue supplier: quarterly revenue per
    // supplier, keep the max. The revenue view aggregates the
    // date-pruned fact ONCE (map-side combinable on suppkey); the
    // global max is a one-row broadcast probed with a decimal-exact
    // equality — never a rank-over-everything window (which would
    // single-partition the revenue table) and never a second scan of
    // lineitem. Supplier name attaches AFTER the max cut, so the dim
    // join touches ~1 row.
    "q15_top_supplier" -> ((s, dir) => {
      // the total+probe double reference would re-inline the whole
      // aggregate subtree (two fact scans) — cut it, as q11 does
      val rev = Tables.load(s, dir, "lineitem")
        .filter(expr("l_shipdate >= TIMESTAMP '1996-01-01'") &&
          expr("l_shipdate < TIMESTAMP '1996-04-01'"))
        .groupBy(col("l_suppkey"))
        .agg(sum((col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .cast(DecimalType(18, 6))).as("total_rev"))
        .localCheckpoint(false)
      val mx = rev.agg(max(col("total_rev")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_rev") === col("mx"))
        .join(Tables.load(s, dir, "supplier").select("s_suppkey", "s_name"),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast(DoubleType).as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q8-shaped market share: of all ECONOMY-part volume sold to
    // AMERICA-region customers in 1996–1997, what fraction shipped
    // from NATION_6's suppliers, per order year. The two dim chains
    // (region→nation→ broadcast into customer; selective part filter
    // into the fact) prune BEFORE the fact⨝fact joins; the share is a
    // conditional sum over one grouped pass — numerator and
    // denominator never scan separately. Decimal sums; the final
    // ratio is double division of two exact decimals.
    "q8_market_share" -> ((s, dir) => {
      val amerNations = broadcast(Tables.load(s, dir, "nation")
        .join(Tables.load(s, dir, "region")
            .filter(col("r_name") === "AMERICA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cn_key")))
      val cust = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(amerNations, col("c_nationkey") === col("cn_key"))
        .select("c_custkey")
      val ords = Tables.load(s, dir, "orders")
        .filter(expr("o_orderdate >= TIMESTAMP '1996-01-01'") &&
          expr("o_orderdate < TIMESTAMP '1998-01-01'"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("o_year"))
      val parts = Tables.load(s, dir, "part")
        .filter(col("p_type") === "ECONOMY").select("p_partkey")
      val sup = Tables.load(s, dir, "supplier")
        .select("s_suppkey", "s_nationkey")
      val target = Tables.load(s, dir, "nation")
        .filter(col("n_name") === "NATION_6")
        .select(col("n_nationkey").as("tn_key"))
      Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_extendedprice", "l_discount")
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(target),
          col("s_nationkey") === col("tn_key"), "left")
        .select(col("o_year"),
          (col("l_extendedprice") * (lit(1d) - col("l_discount")))
            .cast(DecimalType(18, 6)).as("volume"),
          col("tn_key").isNotNull.as("is_target"))
        .groupBy("o_year")
        .agg(
          (sum(when(col("is_target"), col("volume")).otherwise(lit(0)
            .cast(DecimalType(18, 6)))).cast(DoubleType) /
            sum(col("volume")).cast(DoubleType)).as("mkt_share"),
          count(lit(1)).as("n_items"))
        .orderBy("o_year")
    }),

    // TPC-H Q9-shaped profit by supplier nation and order year, for
    // parts whose name contains 'rod'. The schema has no partsupp /
    // ps_supplycost, so cost is modeled as 10% of p_retailprice per
    // unit (documented divergence — same join tree as Q9). The name
    // filter prunes part FIRST and carries retailprice into the fact
    // join; profit is one decimal expression per row, summed in one
    // grouped pass. Supplier⨝nation is dim-scale; orders joins on the
    // key only for the year.
    "q9_profit_by_nation" -> ((s, dir) => {
      val parts = Tables.load(s, dir, "part")
        .filter(col("p_name").contains("rod"))
        .select("p_partkey", "p_retailprice")
      val sup = Tables.load(s, dir, "supplier")
        .select("s_suppkey", "s_nationkey")
      val nat = broadcast(Tables.load(s, dir, "nation")
        .select("n_nationkey", "n_name"))
      val ords = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_discount")
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("o_year"),
          ((col("l_extendedprice") * (lit(1d) - col("l_discount")))
            .cast(DecimalType(18, 6)) -
            (col("p_retailprice") * col("l_quantity") * lit(0.1d))
              .cast(DecimalType(18, 6))).as("amount"))
        .groupBy("nation", "o_year")
        .agg(sum(col("amount")).cast(DoubleType).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // TPC-H Q20-shaped dominant-supplier census: suppliers who shipped
    // MORE THAN HALF of some cold-part's 1996 volume (the schema has
    // no partsupp, so Q20's availqty-vs-half-of-shipped threshold
    // becomes share-of-shipped — same nested-aggregate-then-probe
    // shape). Scale: name filter prunes part into the date-pruned
    // fact; per-(part,supplier) quantities aggregate the fact ONCE,
    // and the per-part total is a WINDOW sum over that aggregated
    // (part-bounded) output — referencing the aggregate twice as a
    // self-join would make Spark scan the fact twice; the window
    // re-exchanges only aggregated rows. The half compare is
    // decimal-exact (2·supp > part). The supplier dim joins only the
    // surviving keys.
    "q20_dominant_supplier" -> ((s, dir) => {
      val parts = Tables.load(s, dir, "part")
        .filter(col("p_name").startsWith("cold")).select("p_partkey")
      val perSupp = Tables.load(s, dir, "lineitem")
        .filter(expr("l_shipdate >= TIMESTAMP '1996-01-01'") &&
          expr("l_shipdate < TIMESTAMP '1997-01-01'"))
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(parts, col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(dec("l_quantity")).as("supp_qty"))
      perSupp
        .withColumn("part_qty",
          sum(col("supp_qty")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("l_partkey"))))
        .filter(col("supp_qty") * lit(2) > col("part_qty"))
        .select("l_suppkey").distinct()
        .join(Tables.load(s, dir, "supplier").select("s_suppkey", "s_name"),
          col("l_suppkey") === col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }),

    // TPC-H Q2-shaped min-price supplier per part (the schema has no
    // partsupp/ps_supplycost, so "minimum cost" becomes minimum
    // average sale price from lineitem). The correlated MIN subquery
    // decorrelates into a per-(part,supplier) aggregation + a per-part
    // struct-MIN — min_by over (price, suppkey) picks the cheapest
    // supplier with a deterministic key tiebreak in the SAME hash
    // aggregation, never a rank window over the price table. Dims
    // (supplier name, part name) join AFTER the min cut, touching one
    // row per part; top-100 is TakeOrdered.
    "q2_min_price_supplier" -> ((s, dir) => {
      val parts = Tables.load(s, dir, "part")
        .filter(col("p_type") === "STANDARD")
        .select("p_partkey", "p_name")
      val perPS = Tables.load(s, dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(parts.select("p_partkey"),
          col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(dec("l_extendedprice")).as("sp"), count(lit(1)).as("np"))
        .select(col("l_partkey"), col("l_suppkey"),
          graft.ext.TextStats.trunc6(col("sp").cast(DoubleType) / col("np"))
            .as("avg_price"))
      perPS.groupBy(col("l_partkey"))
        .agg(min_by(struct(col("l_suppkey"), col("avg_price")),
          struct(col("avg_price"), col("l_suppkey"))).as("b"))
        .select(col("l_partkey"), col("b.l_suppkey").as("l_suppkey"),
          col("b.avg_price").as("min_avg_price"))
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(Tables.load(s, dir, "supplier").select("s_suppkey", "s_name"),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
          col("s_name"), col("min_avg_price"))
        .orderBy(col("min_avg_price").desc, col("p_partkey"))
        .limit(100)
    }),

    // TPC-H Q11-shaped important-stock census: parts whose inventory
    // value (Σ qty·retailprice over one nation's suppliers; the schema
    // has no ps_availqty — shipped quantity stands in) exceeds 0.01%
    // of the nation's total. The HAVING-against-a-global-scalar shape:
    // the per-part value aggregates ONCE behind a lazy checkpoint
    // (referenced by the total AND the filter — without the cut Spark
    // re-inlines the whole join tree into both), the total is a
    // one-row broadcast, and the threshold compare is decimal-exact
    // (val·10000 > total).
    "q11_important_stock" -> ((s, dir) => {
      val natSupp = Tables.load(s, dir, "supplier")
        .join(broadcast(Tables.load(s, dir, "nation")
            .filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val perPart = Tables.load(s, dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(natSupp, col("l_suppkey") === col("s_suppkey"))
        .join(Tables.load(s, dir, "part")
            .select("p_partkey", "p_retailprice"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"))
        .agg(sum((col("l_quantity") * col("p_retailprice"))
          .cast(DecimalType(28, 6))).as("stock_value"))
        .localCheckpoint(false)
      val tot = perPart.agg(sum(col("stock_value")).as("tot"))
      perPart.crossJoin(broadcast(tot))
        .filter(col("stock_value") * lit(10000) > col("tot"))
        .select(col("l_partkey"),
          col("stock_value").cast(DoubleType).as("stock_value"))
        .orderBy(col("stock_value").desc, col("l_partkey"))
    }),

    // TPC-H Q21-shaped sole-late-supplier census: suppliers whose
    // shipment was the ONLY late one (>90 days after ordering) on a
    // multi-supplier order. Q21's double-correlated EXISTS / NOT
    // EXISTS lowers to ONE grouped pass over the fact: per
    // (order, supplier) keep the late flag, per order count suppliers
    // and late suppliers and remember the single late key — the two
    // correlated subqueries become three aggregates on data already
    // grouped, with no self-join of lineitem at all. Top-20 is
    // TakeOrdered with a name tiebreak.
    "q21_sole_late_supplier" -> ((s, dir) => {
      val ords = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderdate")
      // r17 (guide §2.4 "two operations keyed the same way can share
      // one exchange"): the per-(order, supplier) and per-order
      // aggregates both cluster by l_orderkey, so ONE explicit
      // repartition on it serves both — hash(l_orderkey) co-locates
      // every (l_orderkey, l_suppkey) group too, so neither groupBy
      // plans its own Exchange (plan: 3 Exchanges → 2; the late flag
      // projects to 3 narrow columns BEFORE the one wide exchange,
      // guide §2.3). Values unchanged: max over lines of
      // 1{diff > 90} ≡ 1{max(diff) > 90} since o_orderdate is
      // per-order constant.
      val perOrderSupp = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(ords, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          when(datediff(col("l_shipdate"), col("o_orderdate")) > 90, 1L)
            .otherwise(0L).as("l_late"))
        .repartition(col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max(col("l_late")).as("late"))
      val perOrder = perOrderSupp.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"), sum(col("late")).as("n_late"),
          max(when(col("late") === 1L, col("l_suppkey"))).as("late_supp"))
        .filter(col("n_supp") >= 2 && col("n_late") === 1L)
      // group on the supplier KEY (both engines; names need not be
      // unique) and keep s_suppkey in the ORDER BY so the limit-20
      // boundary is a total order even under duplicate names
      perOrder.groupBy(col("late_supp"))
        .agg(count(lit(1)).as("numwait"))
        .join(Tables.load(s, dir, "supplier").select("s_suppkey", "s_name"),
          col("late_supp") === col("s_suppkey"))
        .orderBy(col("numwait").desc, col("s_name"), col("s_suppkey"))
        .limit(20)
        .select(col("s_name"), col("numwait"))
    }),

    // Market-basket affinity at the brand grain: brand pairs that
    // co-occur in one order, with support and lift. r13 shape: ONE
    // shuffle — the fact collapses to a per-order sorted brand SET
    // (collect_set is bounded by the brand cardinality, ~25, never by
    // basket size), pairs expand NARROWLY from each set (k(k−1)/2 ≤
    // 300 structs per order), and the pair/support/total aggregates
    // all read that one grouped pass. The previous shape self-joined
    // the (order, brand) table on the ORDER key — a second shuffle of
    // the whole fact plus join fanout, which at sf1 made this the
    // board's slowest key (8.9 s). Values are identical: the sorted
    // set expansion enumerates exactly the a<b distinct pairs the
    // join+filter produced. Top-20 is TakeOrdered.
    "basket_brand_affinity" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      val sets = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .join(broadcast(Tables.load(s, dir, "part")
          .select(col("p_partkey").as("l_partkey"), col("p_brand"))),
          "l_partkey")
        .groupBy("l_orderkey")
        .agg(array_sort(collect_set(col("p_brand"))).as("bs"))
        .select("bs")
        .localCheckpoint(false) // pairs + supports + total share it
      val nOrders = sets.agg(count(lit(1)).as("n_orders"))
      val supp = sets.select(explode(col("bs")).as("p_brand"))
        .groupBy("p_brand").agg(count(lit(1)).as("n"))
      sets
        .select(explode(flatten(transform(col("bs"), (a, i) =>
          transform(slice(col("bs"), i + lit(2), size(col("bs"))),
            b => struct(a.as("a_brand"), b.as("b_brand")))))).as("pr"))
        .select(col("pr.a_brand").as("a_brand"),
          col("pr.b_brand").as("b_brand"))
        .groupBy("a_brand", "b_brand").agg(count(lit(1)).as("pair_n"))
        .join(broadcast(supp.select(col("p_brand").as("a_brand"),
          col("n").as("na"))), "a_brand")
        .join(broadcast(supp.select(col("p_brand").as("b_brand"),
          col("n").as("nb"))), "b_brand")
        .crossJoin(broadcast(nOrders))
        .select(col("a_brand"), col("b_brand"), col("pair_n"),
          t6((col("pair_n").cast("double") * col("n_orders")) /
            (col("na").cast("double") * col("nb"))).as("lift"))
        .orderBy(col("pair_n").desc, col("a_brand"), col("b_brand"))
        .limit(20)
    }),

    // Supply-concentration audit: per brand, the Herfindahl index of
    // supplier revenue shares ("is this brand single-sourced?"). One
    // fact aggregation to (brand, supplier) revenue; the brand total
    // is a window over that bounded aggregate (|brands|·|suppliers|
    // rows); Σ share² routes each term through DECIMAL so the float
    // sum has one association order on every engine.
    "supplier_share_hhi" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      val dec12 = DecimalType(38, 12)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("p_brand")
      val bs = Tables.load(s, dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(broadcast(Tables.load(s, dir, "part")
          .select(col("p_partkey").as("l_partkey"), col("p_brand"))),
          "l_partkey")
        .groupBy("p_brand", "l_suppkey")
        .agg(sum(dec("l_extendedprice")).as("rev"))
      bs.withColumn("tot", sum(col("rev")).over(w))
        .withColumn("share",
          col("rev").cast("double") / col("tot").cast("double"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_suppliers"),
          t6(sum((col("share") * col("share")).cast(dec12))
            .cast("double")).as("hhi"))
        .orderBy("p_brand")
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

    "q3_shipping" ->
      """SELECT l.l_orderkey,
        |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
        |                AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  o.o_orderdate, o.o_orderpriority
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l.l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n.n_name,
        |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
        |                AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  AND s.s_nationkey = c.c_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n.n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q14_promo" ->
      """WITH j AS (
        |  SELECT p.p_type,
        |    CAST(l.l_extendedprice * (1 - l.l_discount)
        |         AS DECIMAL(18,6)) AS rev
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l.l_shipdate < TIMESTAMP '1997-02-01'
        |), a AS (
        |  SELECT
        |    sum(CASE WHEN p_type = 'PROMO' THEN rev
        |             ELSE CAST(0 AS DECIMAL(18,6)) END) AS promo_dec,
        |    sum(rev) AS total_dec,
        |    count(*) AS n_items
        |  FROM j
        |)
        |SELECT
        |  floor((100 * CAST(promo_dec AS DOUBLE) / CAST(total_dec AS DOUBLE))
        |        * 1000000) / 1000000 AS promo_share,
        |  CAST(promo_dec AS DOUBLE) AS promo_revenue,
        |  CAST(total_dec AS DOUBLE) AS total_revenue,
        |  n_items
        |FROM a""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q7_volume_shipping" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
        |                AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_3') OR
        |       (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_2'))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q10_returned_revenue" ->
      """SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
        |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
        |                AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-04-01'
        |GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey AS big_okey,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250
        |)
        |SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        |  o.o_totalprice, CAST(b.qty_dec AS DOUBLE) AS total_qty
        |FROM orders o
        |JOIN big b ON o.o_orderkey = b.big_okey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q19_disjunctive" ->
      """SELECT
        |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
        |                AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
        |       AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
        |       AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 1 AND 35
        |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,

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

    "q13_customer_distribution" ->
      """WITH ocnt AS (
        |  SELECT o_custkey, count(*) AS c_count FROM orders
        |  WHERE o_orderpriority NOT LIKE '4%' GROUP BY o_custkey
        |)
        |SELECT c_count, count(*) AS custdist FROM (
        |  SELECT coalesce(ocnt.c_count, 0) AS c_count
        |  FROM customer LEFT JOIN ocnt ON c_custkey = o_custkey
        |)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q16_supplier_census" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#9' AND p_type NOT LIKE 'MEDIUM%'
        |  AND p_size IN (1, 4, 7, 10, 15, 23)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q17_small_qty_revenue" ->
      """WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#9'),
        |lb AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN bp ON p_partkey = l_partkey
        |), plim AS (
        |  SELECT l_partkey AS ap,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |    count(*) AS n_li
        |  FROM lb GROUP BY 1
        |)
        |SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(7.0 AS DOUBLE) AS avg_yearly,
        |  count(*) AS n_items
        |FROM lb JOIN plim ON l_partkey = ap
        |WHERE CAST(l_quantity AS DECIMAL(18,2)) * n_li * 5 < sum_qty""".stripMargin,

    "q22_dormant_customers" ->
      """WITH bal AS (
        |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_pos,
        |    count(*) AS n_pos
        |  FROM customer WHERE c_acctbal > 0
        |), rich AS (
        |  SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
        |  FROM customer c, bal
        |  WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * bal.n_pos > bal.sum_pos
        |    AND NOT EXISTS
        |      (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |       AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |)
        |SELECT c_nationkey, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM rich GROUP BY 1 ORDER BY c_nationkey""".stripMargin,

    "q12_late_shipping" ->
      """SELECT
        |  CASE WHEN datediff('day', o_orderdate, l_shipdate) > 90
        |         THEN 'very_late'
        |       WHEN datediff('day', o_orderdate, l_shipdate) > 30
        |         THEN 'late'
        |       ELSE 'on_time' END AS lateness,
        |  count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |             THEN 1 END) AS high_line_count,
        |  count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |             THEN 1 END) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY lateness""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
        |      AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey
        |)
        |SELECT s_suppkey, s_name,
        |  CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q8_market_share" ->
      """WITH vol AS (
        |  SELECT year(o_orderdate) AS o_year,
        |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
        |      AS volume,
        |    (SELECT n2.n_name FROM nation n2
        |     WHERE n2.n_nationkey = s.s_nationkey) = 'NATION_6'
        |      AS is_target
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN supplier s ON l_suppkey = s.s_suppkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |)
        |SELECT o_year,
        |  CAST(sum(CASE WHEN is_target THEN volume
        |                ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        |    / CAST(sum(volume) AS DOUBLE) AS mkt_share,
        |  count(*) AS n_items
        |FROM vol GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q9_profit_by_nation" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(sum(
        |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) -
        |    CAST(p_retailprice * l_quantity * 0.1 AS DECIMAL(18,6))
        |  ) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%rod%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q20_dominant_supplier" ->
      """WITH per_supp AS (
        |  SELECT l_partkey, l_suppkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'cold%'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1, 2
        |), shares AS (
        |  SELECT l_suppkey, supp_qty,
        |    sum(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
        |  FROM per_supp
        |)
        |SELECT DISTINCT s_suppkey, s_name
        |FROM shares JOIN supplier ON l_suppkey = s_suppkey
        |WHERE supp_qty * 2 > part_qty
        |ORDER BY s_suppkey""".stripMargin,

    "q2_min_price_supplier" ->
      """WITH parts AS (
        |  SELECT p_partkey, p_name FROM part WHERE p_type = 'STANDARD'
        |), per_ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |               AS DOUBLE) / count(*) * 1000000) / 1000000
        |      AS avg_price
        |  FROM lineitem JOIN parts ON l_partkey = p_partkey
        |  GROUP BY 1, 2
        |), best AS (
        |  SELECT l_partkey, l_suppkey, avg_price FROM (
        |    SELECT l_partkey, l_suppkey, avg_price,
        |      row_number() OVER (PARTITION BY l_partkey
        |        ORDER BY avg_price, l_suppkey) AS rn
        |    FROM per_ps) t
        |  WHERE rn = 1
        |)
        |SELECT p_partkey, p_name, s_suppkey, s_name,
        |  avg_price AS min_avg_price
        |FROM best
        |JOIN parts ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY min_avg_price DESC, p_partkey LIMIT 100""".stripMargin,

    "q11_important_stock" ->
      """WITH nat_supp AS (
        |  SELECT s_suppkey FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_3'
        |), per_part AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_quantity * p_retailprice AS DECIMAL(28,6)))
        |      AS stock_value
        |  FROM lineitem
        |  JOIN nat_supp ON l_suppkey = s_suppkey
        |  JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1
        |)
        |SELECT l_partkey, CAST(stock_value AS DOUBLE) AS stock_value
        |FROM per_part
        |WHERE stock_value * 10000 > (SELECT sum(stock_value) FROM per_part)
        |ORDER BY stock_value DESC, l_partkey""".stripMargin,

    "q21_sole_late_supplier" ->
      """WITH per_order_supp AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 90
        |             THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2
        |), per_order AS (
        |  SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late,
        |    max(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
        |  FROM per_order_supp GROUP BY 1
        |)
        |SELECT s_name, numwait FROM (
        |  SELECT s_suppkey, s_name, count(*) AS numwait
        |  FROM per_order JOIN supplier ON late_supp = s_suppkey
        |  WHERE n_supp >= 2 AND n_late = 1
        |  GROUP BY s_suppkey, s_name
        |  ORDER BY numwait DESC, s_name, s_suppkey LIMIT 20
        |)""".stripMargin,

    "basket_brand_affinity" ->
      """WITH ob AS (
        |  SELECT DISTINCT l_orderkey, p_brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |), n_ord AS (
        |  SELECT count(DISTINCT l_orderkey) AS n_orders FROM ob
        |), supp AS (
        |  SELECT p_brand, count(*) AS n FROM ob GROUP BY p_brand
        |), pairs AS (
        |  SELECT a.p_brand AS a_brand, b.p_brand AS b_brand,
        |    count(*) AS pair_n
        |  FROM ob a JOIN ob b
        |    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        |  GROUP BY a.p_brand, b.p_brand
        |)
        |SELECT a_brand, b_brand, pair_n,
        |  floor((CAST(pair_n AS DOUBLE) * n_orders)
        |        / (CAST(na.n AS DOUBLE) * nb.n) * 1000000) / 1000000
        |    AS lift
        |FROM pairs
        |JOIN supp na ON na.p_brand = a_brand
        |JOIN supp nb ON nb.p_brand = b_brand
        |CROSS JOIN n_ord
        |ORDER BY pair_n DESC, a_brand, b_brand LIMIT 20""".stripMargin,

    "supplier_share_hhi" ->
      """WITH bs AS (
        |  SELECT p_brand, l_suppkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, l_suppkey
        |), sh AS (
        |  SELECT p_brand,
        |    CAST(rev AS DOUBLE)
        |      / CAST(sum(rev) OVER (PARTITION BY p_brand) AS DOUBLE)
        |      AS share
        |  FROM bs
        |)
        |SELECT p_brand, count(*) AS n_suppliers,
        |  floor(CAST(sum(CAST(share * share AS DECIMAL(38,12))) AS DOUBLE)
        |        * 1000000) / 1000000 AS hhi
        |FROM sh GROUP BY p_brand ORDER BY p_brand""".stripMargin,
  )
}
