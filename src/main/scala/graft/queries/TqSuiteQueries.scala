package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** TPC-H suite completion — the ten classic shapes this schema supports that
  * the pack didn't yet carry (tq3/5/8/17/18/21 landed earlier). Each is the
  * SHAPE on this corpus's columns, not the literal benchmark: where TPC-H
  * uses a column this schema lacks (l_commitdate, partsupp, p_container),
  * the nearest semantically-equivalent predicate stands in, and the 100 TB
  * plan lesson the original query teaches is preserved and spec-asserted.
  *
  * Exactness contract (the j1/tq5/tq8 house rules):
  *  - money sums are exact integer cents / c4 (cents·(100−disc_c)) /
  *    c6 (·(100+tax_c)) — order-independent at any group size;
  *  - sums whose magnitude can pass 2^63 at large SF are cast-BEFORE-sum
  *    to decimal(38,0) (Spark) / HUGEINT (DuckDB);
  *  - every division is integral (`div` / `//`) on non-negative operands,
  *    so both engines truncate identically — no float ratio ever forms;
  *  - every result carries a total ORDER BY with a unique-key tie-break.
  */
object TqSuiteQueries {
  import Tables._

  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** c4 revenue unit: exact cents × (100 − discount-cents). */
  private def r4(price: Column, disc: Column): Column =
    cents(price) * (lit(100L) - cents(disc))

  def all: Seq[Q] = Seq(

    // ── TQ1: pricing summary (TPC-H Q1) — THE canonical full-scan rollup:
    // one pass over lineitem, six aggregates per (returnflag, linestatus)
    // cell. 100 TB: the scan is the query — map-side partial aggregation
    // into ≤ 6 cells means the shuffle carries O(cells·partitions) rows;
    // everything exact-integer so the per-cell sums are order-independent.
    // Magnitude ledger: charge_c6 ≤ ~1e13/row — a cell's sum passes 2^63
    // already at sf10, so c4/c6 sums ride decimal(38,0)/HUGEINT; the
    // EMITTED integers (cents grain) hold to ~9e18 ≈ 1e4× sf10. Averages
    // are integral divisions of exact sums (milli / ppm grain).
    Q("tq1_pricing_summary",
      """WITH l AS (SELECT l_returnflag, l_linestatus,
        |    CAST(round(l_quantity) AS BIGINT) AS qty,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
        |    CAST(round(l_discount * 100) AS BIGINT) AS dc,
        |    CAST(round(l_tax * 100) AS BIGINT) AS tc
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-12-01')
        |SELECT l_returnflag, l_linestatus,
        |  CAST(sum(qty) AS BIGINT) AS sum_qty,
        |  CAST(sum(c) AS BIGINT) AS sum_base_c,
        |  CAST(sum(CAST(c * (100 - dc) AS HUGEINT)) // 100 AS BIGINT) AS sum_disc_c,
        |  CAST(sum(CAST(c * (100 - dc) * (100 + tc) AS HUGEINT)) // 10000 AS BIGINT) AS sum_charge_c,
        |  CAST((sum(qty) * 1000) // count(*) AS BIGINT) AS avg_qty_milli,
        |  CAST((sum(c) * 10) // count(*) AS BIGINT) AS avg_price_milli,
        |  CAST((sum(dc) * 10000) // count(*) AS BIGINT) AS avg_disc_ppm,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM l GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      val l = lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-12-01").cast("timestamp"))
        .select(col("l_returnflag"), col("l_linestatus"),
          expr("cast(round(l_quantity) as bigint)").as("qty"),
          cents(col("l_extendedprice")).as("c"),
          cents(col("l_discount")).as("dc"),
          cents(col("l_tax")).as("tc"))
      l.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("qty").cast("long").as("sum_qty"),
          sum(col("c").cast("decimal(38,0)")).as("bsum"),
          sum((col("c") * (lit(100L) - col("dc"))).cast("decimal(38,0)")).as("d4sum"),
          sum((col("c") * (lit(100L) - col("dc")) * (lit(100L) + col("tc")))
            .cast("decimal(38,0)")).as("c6sum"),
          sum("dc").cast("long").as("dcsum"),
          count(lit(1)).as("cnt"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"),
          expr("cast(bsum as bigint)").as("sum_base_c"),
          expr("cast(d4sum div 100 as bigint)").as("sum_disc_c"),
          expr("cast(c6sum div 10000 as bigint)").as("sum_charge_c"),
          expr("cast((sum_qty * 1000) div cnt as bigint)").as("avg_qty_milli"),
          expr("cast((bsum * 10) div cnt as bigint)").as("avg_price_milli"),
          expr("cast((dcsum * 10000) div cnt as bigint)").as("avg_disc_ppm"),
          col("cnt").as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ── TQ4: order-priority checking (TPC-H Q4's shape) — how many orders
    // per priority, in one quarter, contained at least one RETURNED line
    // (this schema's stand-in for commitdate < receiptdate)? The EXISTS
    // decorrelates to a LEFT-SEMI join: the probe side is orders pruned to
    // (orderkey, priority) and pre-filtered to the quarter; the build side
    // is lineitem pruned to ONE column (orderkey) and pre-filtered to 'R' —
    // a semi join never duplicates orders, so no distinct is needed.
    Q("tq4_order_priority",
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-07-01'
        |  AND o_orderdate < TIMESTAMP '1995-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val o = orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1995-10-01").cast("timestamp"))
        .select("o_orderkey", "o_orderpriority")
      val ret = lineitem(s, d).filter(col("l_returnflag") === "R")
        .select("l_orderkey")
      o.join(ret, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("long").as("order_count"))
        .orderBy("o_orderpriority")
    },

    // ── TQ6: forecasting-revenue change (TPC-H Q6) — the pure
    // scan-plus-filter aggregate: revenue that would vanish if mid-band
    // discounts on small quantities were dropped for one year. 100 TB: the
    // whole query is ONE pushed-down scan (year + discount band + quantity
    // all arrive as PushedFilters on the parquet scan where physical types
    // allow, spec-asserted residual otherwise) into a 1-row aggregate.
    // revenue = Σ cents·disc_c is a c4 quantity summed in
    // decimal(38,0)/HUGEINT (passes 2^63 near 1e12 rows), emitted in cents.
    Q("tq6_forecast_revenue",
      """SELECT CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
        |         * CAST(round(l_discount * 100) AS BIGINT) AS HUGEINT)) // 100
        |         AS BIGINT) AS revenue_c,
        |       CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 4 AND 6
        |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          cents(col("l_discount")).between(4L, 6L) &&
          col("l_quantity") < 24.0)
        .agg(
          sum((cents(col("l_extendedprice")) * cents(col("l_discount")))
            .cast("decimal(38,0)")).as("rsum"),
          count(lit(1)).cast("long").as("n_items"))
        .select(expr("cast(rsum div 100 as bigint)").as("revenue_c"),
          col("n_items"))
    },

    // ── TQ7: volume shipping (TPC-H Q7's shape) — revenue flowing between
    // two nations, by direction and ship year. The honest 100 TB plan has
    // exactly TWO fact-fact shuffles (orders⋈customer on custkey, then
    // lineitem⋈that on orderkey) — customer is fact-sized/10, NOT
    // broadcastable; supplier⋈nation collapses to a broadcast because the
    // nation filter cuts it to 2 of 25 nations BEFORE the fact sees it.
    // Both fact scans are pruned and the customer side is pre-filtered to
    // the two nations (1/12.5 of customers) before its shuffle.
    Q("tq7_volume_shipping",
      """WITH cn AS (SELECT c_custkey, n_name AS cust_nation
        |            FROM customer JOIN nation ON c_nationkey = n_nationkey
        |            WHERE n_name IN ('NATION_1', 'NATION_2')),
        |  sn AS (SELECT s_suppkey, n_name AS supp_nation
        |         FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |         WHERE n_name IN ('NATION_1', 'NATION_2')),
        |  oc AS (SELECT o_orderkey, cust_nation
        |         FROM orders JOIN cn ON o_custkey = c_custkey),
        |  j AS MATERIALIZED (
        |    SELECT supp_nation, cust_nation,
        |           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
        |           CAST(round(l_extendedprice * 100) AS BIGINT)
        |             * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rc4
        |    FROM lineitem
        |    JOIN oc ON l_orderkey = o_orderkey
        |    JOIN sn ON l_suppkey = s_suppkey)
        |SELECT supp_nation, cust_nation, l_year,
        |       CAST(sum(rc4) AS BIGINT) AS revenue_c4
        |FROM j WHERE supp_nation <> cust_nation
        |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, d) =>
      // oracle note: the <> filter lives ABOVE a MATERIALIZED equi-join CTE
      // — written inline, DuckDB's optimizer used the inequality as the
      // only predicate between the order-flow and supplier branches and
      // planned a NESTED_LOOP_JOIN (~3M × 16k rows at sf10, >70 GB of
      // spill); the CTE pins the equi-joins first. Same rows either way.
      val n2 = nation(s, d).filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select("n_nationkey", "n_name")
      val cn = customer(s, d).select("c_custkey", "c_nationkey")
        .join(broadcast(n2), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val sn = supplier(s, d).select("s_suppkey", "s_nationkey")
        .join(broadcast(n2), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val oc = orders(s, d).select("o_orderkey", "o_custkey")
        .join(cn, col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "cust_nation")
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          r4(col("l_extendedprice"), col("l_discount")).as("rc4"))
        .join(oc, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum("rc4").cast("long").as("revenue_c4"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // ── TQ10: returned-item reporting (TPC-H Q10's shape) — which
    // customers returned the most revenue in one quarter? The 100 TB
    // lesson is AGGREGATE-BEFORE-JOIN: revenue is rolled up to customer
    // grain straight off the fact-fact join, and only the customer-grain
    // table (≤ |customer| rows) ever joins the customer dim — grouping
    // after the dim join would shuffle name/acctbal payload bytes through
    // the aggregate for no reason. nation broadcasts; the top-20 is
    // TakeOrdered on the (revenue desc, custkey) total order.
    Q("tq10_returned_items",
      """WITH r AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_c4
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1995-10-01'
        |    AND o_orderdate < TIMESTAMP '1996-01-01'
        |  GROUP BY 1)
        |SELECT c_custkey, c_name, n_name,
        |       CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c,
        |       revenue_c4
        |FROM r JOIN customer ON o_custkey = c_custkey
        |       JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue_c4 DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      val li = lineitem(s, d).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          r4(col("l_extendedprice"), col("l_discount")).as("rc4"))
      val o = orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val r = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum("rc4").cast("long").as("revenue_c4"))
      r.join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d).select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          cents(col("c_acctbal")).as("acctbal_c"), col("revenue_c4"))
        .orderBy(col("revenue_c4").desc, col("c_custkey"))
        .limit(20)
    },

    // ── TQ13: customer order-count distribution (TPC-H Q13's shape) — the
    // double-aggregation histogram: orders-per-customer (excluding urgent
    // ones), then customers-per-count. 100 TB: the fact collapses FIRST
    // (one keyed agg on o_custkey, map-side combinable), and the LEFT join
    // against customer runs at customer grain on both sides — the literal
    // outer-join-then-count form shuffles the full fact through the join.
    // Zero-order customers arrive via coalesce(cnt, 0) after the left join.
    Q("tq13_customer_distribution",
      """WITH co AS (
        |  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        |  FROM customer c
        |  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |                    AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY 1)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM co GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
      val perCust = orders(s, d)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
      customer(s, d).select("c_custkey")
        .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(coalesce(col("n"), lit(0L)).cast("long").as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).cast("long").as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // ── TQ14: promotion-effect share (TPC-H Q14's shape) — what fraction
    // of each 1996 month's revenue came from PROMO parts? The join is the
    // interesting part at 100 TB: part is fact-sized/30 — NOT broadcastable
    // unfiltered — so lineitem (pre-filtered to the year, pruned to 3
    // columns) shuffles against part (pruned to key+type) on partkey, and
    // the promo flag rides as a boolean into ONE conditional aggregate.
    // The share is integer ppm in decimal(38,0)/HUGEINT (tq8's device),
    // NULL symmetrically on a zero-revenue month.
    Q("tq14_promo_effect",
      """WITH j AS (
        |  SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
        |         CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rc4,
        |         CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS promo
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01')
        |SELECT month,
        |  CAST(sum(CASE WHEN promo = 1 THEN rc4 ELSE 0 END) AS BIGINT) AS promo_c4,
        |  CAST(sum(rc4) AS BIGINT) AS rev_c4,
        |  CASE WHEN sum(rc4) = 0 THEN NULL
        |       ELSE CAST((CAST(sum(CASE WHEN promo = 1 THEN rc4 ELSE 0 END) AS HUGEINT)
        |              * 1000000) // CAST(sum(rc4) AS HUGEINT) AS BIGINT) END AS promo_ppm
        |FROM j GROUP BY 1 ORDER BY month""".stripMargin) { (s, d) =>
      val li = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_partkey"),
          date_format(col("l_shipdate"), "yyyy-MM").as("month"),
          r4(col("l_extendedprice"), col("l_discount")).as("rc4"))
      val p = Tables.part(s, d)
        .select(col("p_partkey"), (col("p_type") === "PROMO").as("promo"))
      li.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("month")
        .agg(
          sum(when(col("promo"), col("rc4")).otherwise(0L)).cast("long").as("promo_c4"),
          sum("rc4").cast("long").as("rev_c4"))
        .select(col("month"), col("promo_c4"), col("rev_c4"),
          when(col("rev_c4") === 0L, lit(null).cast("long"))
            .otherwise(expr(
              "cast((cast(promo_c4 as decimal(38,0)) * 1000000) div rev_c4 as bigint)"))
            .as("promo_ppm"))
        .orderBy("month")
    },

    // ── TQ15: top supplier (TPC-H Q15's shape) — the supplier(s) whose
    // quarterly revenue equals the maximum. The correlated
    // "= (SELECT max(...))" decorrelates to the house 1-row-broadcast
    // device: the supplier-grain revenue table computes ONCE (keyed agg,
    // map-side combinable), its 1-row max broadcasts back over itself, and
    // the equality filter picks the argmax rows — no window over the whole
    // supplier table, no second fact scan. Supplier dim broadcasts.
    Q("tq15_top_supplier",
      """WITH r AS (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS total_c4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_c4
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_c4 = (SELECT max(total_c4) FROM r)
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val r = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("l_suppkey"),
          r4(col("l_extendedprice"), col("l_discount")).as("rc4"))
        .groupBy("l_suppkey")
        .agg(sum("rc4").cast("long").as("total_c4"))
      val mx = r.agg(max("total_c4").as("mx"))
      r.crossJoin(broadcast(mx))
        .filter(col("total_c4") === col("mx"))
        .join(broadcast(supplier(s, d).select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_c4"))
        .orderBy("s_suppkey")
    },

    // ── TQ19: discounted revenue (TPC-H Q19's shape) — revenue matching a
    // DISJUNCTION of (brand, size-band, quantity-band) triples. The 100 TB
    // lesson is predicate FACTORING: the common envelope (brand IN the
    // 3-set, size ≤ the max band) pre-filters the part side BEFORE the
    // join — cutting it to ~3/25 of brands — and the residual OR evaluates
    // after the keyed join; the naive form evaluates the OR only post-join
    // and ships every part row. Quantity bands are exact integers.
    Q("tq19_discounted_revenue",
      """SELECT
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_c4,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10
        |       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 15
        |       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 20 AND 30)""".stripMargin) { (s, d) =>
      val p = Tables.part(s, d)
        // factored envelope: pushes to the part scan; the residual OR
        // below needs only these survivors
        .filter(col("p_brand").isin("Brand#12", "Brand#15", "Brand#21") &&
          col("p_size").between(1, 15))
        .select("p_partkey", "p_brand", "p_size")
      val li = lineitem(s, d)
        .select(col("l_partkey"),
          expr("cast(round(l_quantity) as bigint)").as("qty"),
          r4(col("l_extendedprice"), col("l_discount")).as("rc4"))
      li.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("qty").between(1L, 11L)) ||
          (col("p_brand") === "Brand#15" && col("p_size").between(1, 10) &&
            col("qty").between(10L, 20L)) ||
          (col("p_brand") === "Brand#21" && col("p_size").between(1, 15) &&
            col("qty").between(20L, 30L)))
        .agg(sum("rc4").cast("long").as("revenue_c4"),
          count(lit(1)).cast("long").as("n_items"))
    },

    // ── TQ22: global sales opportunity (TPC-H Q22's shape) — dormant
    // well-funded customers per nation: above the global positive-balance
    // average, with NO order since 1999. Two decorrelations in one query:
    // the scalar subquery is the 1-row-broadcast average (exact cents,
    // truncating div — both engines floor the same non-negative value),
    // and NOT EXISTS is a LEFT-ANTI join against orders pre-filtered to
    // the window and pruned to ONE column. The anti probe carries only
    // the ~1/3 of customers above the average.
    Q("tq22_dormant_customers",
      """WITH ab AS (
        |  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
        |           // count(*) AS BIGINT) AS avg_c
        |  FROM customer WHERE c_acctbal > 0.0),
        |cand AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer, ab
        |  WHERE CAST(round(c_acctbal * 100) AS BIGINT) > avg_c
        |    AND NOT EXISTS (SELECT 1 FROM orders
        |                    WHERE o_custkey = c_custkey
        |                      AND o_orderdate >= TIMESTAMP '1999-01-01'))
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
        |       CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
        |FROM cand GROUP BY 1 ORDER BY c_nationkey""".stripMargin) { (s, d) =>
      val c = customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          cents(col("c_acctbal")).as("bal_c"))
      val ab = c.filter(col("bal_c") > 0L)
        .agg(sum(col("bal_c")).as("s"), count(lit(1)).as("n"))
        .select(expr("cast(s div n as bigint)").as("avg_c"))
      val recent = orders(s, d)
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
      c.crossJoin(broadcast(ab))
        .filter(col("bal_c") > col("avg_c"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).cast("long").as("numcust"),
          sum("bal_c").cast("long").as("totacctbal_c"))
        .orderBy("c_nationkey")
    },

    // ── TQ2: minimum-cost supplier (TPC-H Q2's shape) — for each small
    // LARGE-type part, the EUROPE supplier(s) with the minimum account
    // balance (this schema's supply-cost stand-in) among those who
    // actually supply it (supply = distinct (part, supplier) pairs off
    // lineitem). The correlated "= (SELECT min ...)" decorrelates to a
    // WINDOW MIN over the supply-pair table (tq17's lesson on a join
    // table): ONE partkey-keyed shuffle, no second scan, no per-part
    // join. Scale order matters: the part filter semi-prunes the supply
    // pairs BEFORE the window (pruning by part cannot change a part's
    // own min), so the window input is |filtered parts|·suppliers-per-
    // part, not the full supply relation.
    Q("tq2_min_cost_supplier",
      """WITH sup AS (SELECT s_suppkey, s_name, n_name,
        |               CAST(round(s_acctbal * 100) AS BIGINT) AS bal_c
        |             FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |                  JOIN region ON n_regionkey = r_regionkey
        |             WHERE r_name = 'EUROPE'),
        |supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |pl AS (SELECT p_partkey, p_name FROM part
        |       WHERE p_size <= 5 AND p_type = 'LARGE'),
        |j AS (SELECT pl.p_partkey, pl.p_name, sup.s_suppkey, sup.s_name,
        |             sup.n_name, sup.bal_c,
        |             min(sup.bal_c) OVER (PARTITION BY pl.p_partkey) AS min_c
        |      FROM supply JOIN pl ON l_partkey = p_partkey
        |                  JOIN sup ON l_suppkey = s_suppkey)
        |SELECT p_partkey, p_name, s_suppkey, s_name, n_name, bal_c
        |FROM j WHERE bal_c = min_c
        |ORDER BY bal_c DESC, p_partkey, s_suppkey LIMIT 100""".stripMargin) { (s, d) =>
      val nr = nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val sup = supplier(s, d)
        .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          cents(col("s_acctbal")).as("bal_c"))
      val pl = Tables.part(s, d)
        .filter(col("p_size") <= 5 && col("p_type") === "LARGE")
        .select("p_partkey", "p_name")
      // join the filtered part dim BELOW the distinct: the former plan
      // deduped every (partkey, suppkey) of the whole fact table and only
      // then joined the selective dim — here the dim prunes first (pl
      // stays UN-hinted: part is fact/30 at 100 TB, so the planner
      // broadcasts only while stats fit), and the explicit p_partkey
      // repartition satisfies the distinct AND the min window
      // (HashPartitioning(p_partkey) clusters the wider distinct key),
      // so one exchange serves both
      val supply = lineitem(s, d).select("l_partkey", "l_suppkey")
        .join(pl, col("l_partkey") === col("p_partkey"))
        .repartition(col("p_partkey"))
        .select("p_partkey", "p_name", "l_suppkey").distinct()
      val w = org.apache.spark.sql.expressions.Window.partitionBy("p_partkey")
      supply
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .withColumn("min_c", min("bal_c").over(w))
        .filter(col("bal_c") === col("min_c"))
        .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
          col("s_name"), col("n_name"), col("bal_c"))
        .orderBy(col("bal_c").desc, col("p_partkey"), col("s_suppkey"))
        .limit(100)
    },

    // ── TQ9: product-type profit (TPC-H Q9's shape) — profit on 'red'
    // parts per supplier nation and order year, cost standing in as
    // retail price × quantity (no partsupp on this schema). The full
    // star with BOTH big dims: part joins KEYED (fact/30, name-filtered
    // ~1/3 — still unbroadcastable at 100 TB), orders joins KEYED (the
    // year), supplier→nation broadcasts. profit_c4 = r4 − cost_c·qty·100
    // is exact integer; nation-year sums cast-BEFORE-sum decimal(38,0)/
    // HUGEINT (a year's profit passes 2^63 ~1e4× past sf10).
    Q("tq9_product_type_profit",
      """WITH j AS MATERIALIZED (
        |  SELECT l.l_orderkey, l.l_suppkey,
        |         CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
        |           - CAST(round(p.p_retailprice * 100) AS BIGINT)
        |             * CAST(round(l.l_quantity) AS BIGINT) * 100 AS profit_c4
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_name LIKE '%red%')
        |SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |       CAST(sum(CAST(profit_c4 AS HUGEINT)) AS BIGINT) AS profit_c4
        |FROM j JOIN orders ON l_orderkey = o_orderkey
        |       JOIN supplier ON l_suppkey = s_suppkey
        |       JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY n_name, o_year""".stripMargin) { (s, d) =>
      val p = Tables.part(s, d).filter(col("p_name").like("%red%"))
        .select(col("p_partkey"), cents(col("p_retailprice")).as("cost_c"))
      val li = lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          expr("cast(round(l_quantity) as bigint)").as("qty"),
          r4(col("l_extendedprice"), col("l_discount")).as("rc4"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("rc4") - col("cost_c") * col("qty") * lit(100L)).as("profit_c4"))
      val o = orders(s, d)
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
      val sn = supplier(s, d).select("s_suppkey", "s_nationkey")
        .join(broadcast(nation(s, d).select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "n_name")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .groupBy("n_name", "o_year")
        .agg(sum(col("profit_c4").cast("decimal(38,0)")).as("psum"))
        .select(col("n_name"), col("o_year"),
          expr("cast(psum as bigint)").as("profit_c4"))
        .orderBy("n_name", "o_year")
    },

    // ── TQ11: important stock (TPC-H Q11's shape) — parts whose
    // NATION_1-supplied inventory value (qty × retail, this schema's
    // supplycost×availqty stand-in) exceeds TWICE the average part's
    // value. The official Q11 divides its fraction by SF because a fixed
    // fraction DEGENERATES as the part table grows (the first cut here —
    // value·10⁴ > total — returned the empty set at sf10's 1.5M parts);
    // the scale-free restatement derives the threshold from the SAME
    // per-part table in-plan (dd9's self-sizing rule): value·n_parts >
    // 2·total, exact in decimal(38,0)/HUGEINT. Still the Q11 shape — a
    // scalar-subquery HAVING via the house 1-ROW-BROADCAST, computed
    // once, no second scan. Top-100 by (value desc, partkey) TakeOrdered.
    Q("tq11_important_stock",
      """WITH v AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(round(l_quantity) AS BIGINT)
        |           * CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS value_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |       JOIN supplier ON l_suppkey = s_suppkey
        |       JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_1'
        |  GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS HUGEINT) AS n_parts,
        |             CAST(sum(CAST(value_c AS HUGEINT)) AS HUGEINT) AS total FROM v)
        |SELECT l_partkey, value_c FROM v, t
        |WHERE CAST(value_c AS HUGEINT) * n_parts > 2 * total
        |ORDER BY value_c DESC, l_partkey LIMIT 100""".stripMargin) { (s, d) =>
      val sn = supplier(s, d).select("s_suppkey", "s_nationkey")
        .join(broadcast(nation(s, d).filter(col("n_name") === "NATION_1")
          .select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val p = Tables.part(s, d)
        .select(col("p_partkey"), cents(col("p_retailprice")).as("retail_c"))
      val v = lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"),
          expr("cast(round(l_quantity) as bigint)").as("qty"))
        .join(sn, col("l_suppkey") === col("s_suppkey"), "left_semi")
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey")
        .agg(sum(col("qty") * col("retail_c")).cast("long").as("value_c"))
      val tot = v.agg(count(lit(1)).cast("decimal(38,0)").as("n_parts"),
        sum(col("value_c").cast("decimal(38,0)")).as("total"))
      v.crossJoin(broadcast(tot))
        .filter(col("value_c").cast("decimal(38,0)") * col("n_parts")
          > lit(2) * col("total"))
        .select(col("l_partkey"), col("value_c"))
        .orderBy(col("value_c").desc, col("l_partkey"))
        .limit(100)
    },

    // ── TQ12: shipping-priority audit (TPC-H Q12's shape) — among lines
    // shipped LATE (>180 days after the order) during 1996, how many
    // belonged to high- vs low-priority orders, per return class (this
    // schema's shipmode stand-in)? ONE fact-fact join (both sides
    // pre-filtered + column-pruned) into ONE conditional aggregate over
    // ≤3 cells — Q12's lesson that the "two counts" are one pass, not two.
    Q("tq12_priority_lateness",
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 180 DAY
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val li = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_returnflag", "l_shipdate")
      val o = orders(s, d).select("o_orderkey", "o_orderdate", "o_orderpriority")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 180 DAYS"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).cast("long").as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).cast("long").as("low_line_count"))
        .orderBy("l_returnflag")
    },

    // ── TQ16: supplier-count by part attributes (TPC-H Q16's shape) —
    // how many DISTINCT suppliers stock each non-PROMO (brand, type,
    // size) combination, excluding complaint suppliers (stand-in:
    // negative account balance)? The NOT-IN decorrelates to a LEFT-ANTI
    // join against the (small, filtered) exclusion set; the supply
    // relation is the distinct (part, supplier) pair table off lineitem;
    // count(DISTINCT) runs keyed on the bounded attribute grid.
    Q("tq16_supplier_count",
      """WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |excl AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0),
        |j AS (SELECT p_brand, p_type, p_size, l_suppkey
        |      FROM supply JOIN part ON l_partkey = p_partkey
        |      WHERE p_type <> 'PROMO' AND p_size <= 25
        |        AND l_suppkey NOT IN (SELECT s_suppkey FROM excl))
        |SELECT p_brand, p_type, p_size,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM j GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 100""".stripMargin) { (s, d) =>
      val p = Tables.part(s, d)
        .filter(col("p_type") =!= "PROMO" && col("p_size") <= 25)
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val excl = supplier(s, d).filter(col("s_acctbal") < 0.0)
        .select("s_suppkey")
      // no pre-distinct: countDistinct's own two-level aggregate dedups
      // (brand, type, size, suppkey) map-side, so the former
      // distinct-(partkey, suppkey) exchange over the whole fact table was
      // a second full-fact shuffle for nothing; dims prune first (part
      // stays UN-hinted — fact/30 at 100 TB, the planner broadcasts it
      // only while its stats say it fits), then the single keyed agg is
      // the only remaining fact-sized exchange
      lineitem(s, d).select("l_partkey", "l_suppkey")
        .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").cast("long").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
        .limit(100)
    },

    // ── TQ20: potential promotion (TPC-H Q20's shape) — NATION_2
    // suppliers who moved real PROMO volume (>50 units of some promo part
    // in 1996): the nested semi-join CHAIN — part filter → per-(supplier,
    // part) HAVING agg → distinct supplier set → semi join the supplier
    // dim. Every level shrinks before the next touches it: the fact is
    // pre-filtered to the year and the promo semi-prune BEFORE its one
    // keyed agg, and the supplier dim probe is a semi join on the
    // qualifying-supplier set (never a fact shuffle).
    Q("tq20_potential_promotion",
      """WITH promo AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
        |q AS (SELECT l_suppkey
        |      FROM lineitem JOIN promo ON l_partkey = p_partkey
        |      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |        AND l_shipdate < TIMESTAMP '1997-01-01'
        |      GROUP BY l_suppkey, l_partkey
        |      HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 30),
        |nat AS (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_9')
        |SELECT DISTINCT s_suppkey, s_name
        |FROM supplier JOIN nat ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (SELECT l_suppkey FROM q)
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val promo = Tables.part(s, d).filter(col("p_type") === "PROMO")
        .select("p_partkey")
      val q = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_partkey"), col("l_suppkey"),
          expr("cast(round(l_quantity) as bigint)").as("qty"))
        .join(broadcast(promo), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum("qty").as("q"))
        .filter(col("q") > 30L)
        .select("l_suppkey").distinct()
      supplier(s, d)
        .join(broadcast(nation(s, d).filter(col("n_name") === "NATION_9")
          .select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .join(q, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    })
}
