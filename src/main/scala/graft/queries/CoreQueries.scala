package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Registry.tbl

/** Batch SQL surface over the delivered lake (SURVEY.md §2.7): aggregation,
  * joins (broadcast/semi/anti), window functions, sorts/top-k, set ops,
  * rollup, scalar string/date/JSON functions. The star-schema TESTDATA
  * tables stand in for the reference's "hourly analytics" workload
  * (README.md:18, 38).
  *
  * Scale notes: filters sit directly on scans (parquet pushdown + pruning);
  * dimension tables are broadcast explicitly; aggregates go partial→final
  * automatically; top-k compiles to TakeOrderedAndProject (no full sort).
  */
object CoreQueries {

  /** Exact double sum: per-row cast to DECIMAL(18,4) → exact decimal sum →
    * back to double. Engine-order-independent, unlike naive double sums.
    */
  private def dsum(c: org.apache.spark.sql.Column) = Agg.moneySum(c)
  private def dsumSql(e: String) = Agg.moneySumSql(e)

  /** The money columns are exact 2-decimal values, so revenue/charge
    * products have exactly 4 resp. 6 decimals; Spark sums their scaled
    * cents with the custom CentSum128 aggregate (exact at any group size,
    * long-speed hot path — see functions/CentSum128), while the oracle
    * computes the same exact value with decimal arithmetic. Both equal the
    * exact mathematical sum, so they hash-match — PROVIDED the final
    * decimal→double conversion rounds once on both sides. Java's
    * BigDecimal.doubleValue() is correctly rounded at every magnitude, but
    * DuckDB's CAST(DECIMAL AS DOUBLE) converts the int128 then divides by
    * 10^scale (two roundings) — 1 ulp off once the unscaled sum passes
    * 2^52 (first seen at sf1: q01 sum_charge, maxdiff 2^-18). The oracle
    * therefore routes big decimal sums through VARCHAR
    * (CAST(CAST(... AS VARCHAR) AS DOUBLE)): decimal→string is exact,
    * string→double is one correctly-rounded parse, matching Java bit-for-
    * bit at any scale factor.
    */
  import graft.functions.CentSum128.centSum128
  private def discPriceSum = centSum128(
    floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 1e4 + 0.5).cast("long"), 4)
  private def chargeSum = centSum128(
    floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")) * 1e6 + 0.5).cast("long"), 6)
  private val discPriceSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l_discount AS DECIMAL(4,2)))"
  private val chargeSql = s"$discPriceSql * (1.00 + CAST(l_tax AS DECIMAL(4,2)))"

  val qs: Seq[Q] = Seq(

    // ---- Q1-style pricing summary: hash agg, partial+final, 8 aggregates
    Q("q01_pricing_summary", (s, d) => {
      tbl(s, d, "lineitem")
        .filter(col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          discPriceSum.as("sum_disc_price"),
          chargeSum.as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }, Some(
      s"""SELECT l_returnflag, l_linestatus,
         | ${dsumSql("l_quantity")} AS sum_qty,
         | ${dsumSql("l_extendedprice")} AS sum_base_price,
         | CAST(CAST(SUM($discPriceSql) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
         | CAST(CAST(SUM($chargeSql) AS VARCHAR) AS DOUBLE) AS sum_charge,
         | ROUND(AVG(l_quantity), 4) AS avg_qty,
         | ROUND(AVG(l_extendedprice), 4) AS avg_price,
         | ROUND(AVG(l_discount), 4) AS avg_disc,
         | CAST(COUNT(*) AS BIGINT) AS count_order
         |FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin),
      bench = true),

    // ---- point lookup (README.md:164 `WHERE id = 98765`): pushdown to scan
    Q("q02_point_lookup", (s, d) =>
      tbl(s, d, "orders")
        .filter(col("o_orderkey") === 42)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate")),
      Some("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate " +
        "FROM orders WHERE o_orderkey = 42")),

    // ---- projection + selective filter (T5/T6): pruned scan, pushed predicates
    Q("q03_filter_project", (s, d) =>
      tbl(s, d, "lineitem")
        .filter(col("l_quantity") >= 48 && col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_partkey"), col("l_linenumber")),
      Some("SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_extendedprice " +
        "FROM lineitem WHERE l_quantity >= 48 AND l_discount > 0.05 " +
        "ORDER BY l_orderkey, l_partkey, l_linenumber")),

    // ---- top-k revenue orders: agg + join + TakeOrderedAndProject
    Q("q04_topk_orders", (s, d) => {
      // per-order groups are ~7 rows — cent-long sums are overflow-safe at
      // any scale for high-cardinality keys, and 3× faster than decimal
      val rev = tbl(s, d, "lineitem").groupBy(col("l_orderkey"))
        .agg(Agg.money4Sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      // top-k BEFORE the join (r14): l_orderkey ⊆ o_orderkey with o_orderkey
      // unique (the star schema's FK), so the global top-10 by
      // (revenue, l_orderkey) IS the top-10 by (revenue, o_orderkey) after
      // the 1:1 inner join — TakeOrdered runs on the agg output and the
      // join broadcasts 10 rows against the orders scan, instead of
      // building a broadcast of the ENTIRE orders table (impossible at
      // 100 TB; the pre-r14 shape only worked because orders fit under the
      // broadcast threshold at bench SFs)
      val top = rev.orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
      broadcast(top).join(tbl(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
    }, Some(
      s"""SELECT o_orderkey, o_orderdate, o_orderpriority, revenue
         |FROM (SELECT l_orderkey, ${Agg.money4SumSql("l_extendedprice*(1.0-l_discount)")} AS revenue
         |      FROM lineitem GROUP BY l_orderkey) r
         |JOIN orders ON l_orderkey = o_orderkey
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin),
      bench = true),

    // ---- Q5-style star join: local-supplier revenue per nation
    Q("q05_nation_revenue", (s, d) => {
      val li = tbl(s, d, "lineitem")
      val o = tbl(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val c = tbl(s, d, "customer")
      val sup = broadcast(tbl(s, d, "supplier"))
      val n = broadcast(tbl(s, d, "nation"))
      val r = broadcast(tbl(s, d, "region"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(discPriceSum.as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    }, Some(
      s"""SELECT n_name, CAST(CAST(SUM($discPriceSql) AS VARCHAR) AS DOUBLE) AS revenue,
         | CAST(COUNT(*) AS BIGINT) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),
      bench = true),

    // ---- left-semi join (EXISTS): customers with ≥1 order, per segment
    Q("q06_segment_active", (s, d) =>
      tbl(s, d, "customer")
        .join(tbl(s, d, "orders").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment")),
      Some("SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers FROM customer " +
        "WHERE c_custkey IN (SELECT o_custkey FROM orders) " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment")),

    // ---- left-anti join (NOT EXISTS): customers with no orders, per nation
    Q("q07_inactive_by_nation", (s, d) =>
      tbl(s, d, "customer")
        .join(tbl(s, d, "orders").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(tbl(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n_inactive"))
        .orderBy(col("n_name")),
      Some("SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_inactive " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) " +
        "GROUP BY n_name ORDER BY n_name")),

    // ---- set op: INTERSECT (customers ordering in both halves of history)
    Q("q08_intersect_custkeys", (s, d) => {
      val o = tbl(s, d, "orders")
      val cut = lit("1998-01-01").cast("timestamp")
      o.filter(col("o_orderdate") < cut).select(col("o_custkey"))
        .intersect(o.filter(col("o_orderdate") >= cut).select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }, Some("SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' " +
      "INTERSECT SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01' " +
      "ORDER BY o_custkey")),

    // ---- set op: EXCEPT (customers active early but not late)
    Q("q09_except_custkeys", (s, d) => {
      val o = tbl(s, d, "orders")
      val cut = lit("1998-01-01").cast("timestamp")
      o.filter(col("o_orderdate") < cut).select(col("o_custkey"))
        .except(o.filter(col("o_orderdate") >= cut).select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }, Some("SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' " +
      "EXCEPT SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01' " +
      "ORDER BY o_custkey")),

    // ---- rollup over a join: subtotal lattice
    Q("q10_rollup_segment_nation", (s, d) =>
      tbl(s, d, "customer")
        .join(broadcast(tbl(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("c_mktsegment"), col("n_name"))
        .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("total_bal"))
        .orderBy(asc_nulls_first("c_mktsegment"), asc_nulls_first("n_name")),
      Some(s"""SELECT c_mktsegment, n_name, CAST(COUNT(*) AS BIGINT) AS n,
              | ${dsumSql("c_acctbal")} AS total_bal
              |FROM customer JOIN nation ON c_nationkey = n_nationkey
              |GROUP BY ROLLUP(c_mktsegment, n_name)
              |ORDER BY c_mktsegment NULLS FIRST, n_name NULLS FIRST""".stripMargin)),

    // ---- window functions: rank + running sum per customer order history
    Q("q11_window_order_rank", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      tbl(s, d, "orders")
        .filter(col("o_custkey") < 100)
        .withColumn("order_rank", row_number().over(w))
        .withColumn("running_spend",
          round(sum(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("order_rank"), col("running_spend"))
        .orderBy(col("o_custkey"), col("order_rank"))
    }, Some(
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | CAST(ROW_NUMBER() OVER w AS INT) AS order_rank,
        | ROUND(SUM(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, order_rank""".stripMargin)),

    // ---- date scalar functions + monthly agg
    Q("q12_monthly_orders", (s, d) =>
      tbl(s, d, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"),
          round(min(col("o_totalprice")), 4).as("min_price"),
          round(max(col("o_totalprice")), 4).as("max_price"))
        .orderBy(col("ym")),
      Some(s"""SELECT strftime(o_orderdate, '%Y-%m') AS ym,
              | CAST(COUNT(*) AS BIGINT) AS n_orders, ${dsumSql("o_totalprice")} AS total,
              | ROUND(MIN(o_totalprice), 4) AS min_price, ROUND(MAX(o_totalprice), 4) AS max_price
              |FROM orders GROUP BY ym ORDER BY ym""".stripMargin))
  )
}
