package graft

import org.apache.spark.sql.functions._

/** Behavioral + plan invariants of the TPC-H suite-completion queries
  * (TqSuiteQueries): hand-computed fixtures pin the exact-integer money
  * semantics (c4/c6 sums, truncating integral divisions), and the plan
  * asserts pin each query's 100 TB design claim — pruned fact scans,
  * semi/anti decorrelations, aggregate-before-join, no window where the
  * 1-row-broadcast device stands in.
  */
class TqSuiteSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)

  private def tmpDir(prefix: String): String =
    CacheRegistry.trackPath(
      java.nio.file.Files.createTempDirectory(prefix).toString)

  private def plan(name: String): String =
    q(name)(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString

  /** Formatted physical plan: PushedFilters/ReadSchema UNtruncated (the
    * simple toString clips long field lists at ~100 chars). */
  private def fplan(name: String): String =
    q(name)(spark, "/root/testdata/sf0.001").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** Full-column lineitem rows: (okey, pkey, skey, qty, price, disc, tax,
    * rflag, lstatus, shipdate). */
  private def writeLineitem(dir: String,
      rows: Seq[(Long, Long, Long, Double, Double, Double, Double, String, String, String)]): Unit = {
    import spark.implicits._
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  private def writeOrders(dir: String,
      rows: Seq[(Long, Long, String, String)]): Unit = {
    import spark.implicits._
    rows.toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
  }

  private def writeCustomer(dir: String,
      rows: Seq[(Long, String, Int, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
  }

  private def writeDims(dir: String): Unit = {
    import spark.implicits._
    Seq((1L, "s1", 1), (2L, "s2", 2), (3L, "s3", 3))
      .toDF("s_suppkey", "s_name", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1, "NATION_1", 0), (2, "NATION_2", 0), (3, "NATION_3", 0), (7, "NATION_7", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
  }

  private def writePart(dir: String, rows: Seq[(Long, String, String, Int)]): Unit = {
    import spark.implicits._
    rows.toDF("p_partkey", "p_brand", "p_type", "p_size")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
  }

  // ── tq1 ──────────────────────────────────────────────────────────────────

  test("tq1: exact c4/c6 cell sums and truncating integral averages") {
    val dir = tmpDir("tq1a")
    writeLineitem(dir, Seq(
      (1L, 1L, 1L, 10.0, 100.00, 0.05, 0.02, "A", "F", "1997-01-01"),
      (2L, 1L, 1L, 20.0, 50.00, 0.10, 0.00, "A", "F", "1997-06-01"),
      (3L, 1L, 1L, 1.0, 10.00, 0.00, 0.08, "R", "O", "1998-12-01"),
      (4L, 1L, 1L, 99.0, 999.00, 0.10, 0.08, "R", "O", "1998-12-02"))) // past cutoff
    val rows = q("tq1_pricing_summary")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getLong(9)))
    // A/F: base 15000c; disc4 950000+450000 = 1.4e6 -> 14000c;
    // charge6 96.9e6+45e6 = 141.9e6 -> 14190c; avgs over cnt=2
    // R/O: one 10.00 line, no discount, 8% tax -> charge 1080c
    assert(rows.toSeq == Seq(
      ("A", "F", 30L, 15000L, 14000L, 14190L, 15000L, 75000L, 75000L, 2L),
      ("R", "O", 1L, 1000L, 1000L, 1080L, 1000L, 10000L, 0L, 1L)),
      s"got ${rows.toSeq}")
  }

  test("tq1: the scan IS the query — one FileScan, no join, partial agg") {
    val p = plan("tq1_pricing_summary")
    assert("FileScan parquet".r.findAllIn(p).size == 1, s"expected 1 scan:\n$p")
    assert(!p.contains("Join"), s"tq1 must not join:\n$p")
    assert(p.contains("HashAggregate"), s"no hash aggregate:\n$p")
  }

  // ── tq4 ──────────────────────────────────────────────────────────────────

  test("tq4: EXISTS counts an order once regardless of matching lines") {
    val dir = tmpDir("tq4a")
    writeOrders(dir, Seq(
      (1L, 10L, "3-MEDIUM", "1995-08-01"),  // two R lines -> counted ONCE
      (2L, 10L, "3-MEDIUM", "1995-08-15"),  // only N lines -> not counted
      (3L, 20L, "1-URGENT", "1995-09-30"),  // one R line -> counted
      (4L, 20L, "3-MEDIUM", "1995-06-30"))) // R line but outside quarter
    writeLineitem(dir, Seq(
      (1L, 1L, 1L, 1.0, 1.00, 0.0, 0.0, "R", "O", "1995-09-01"),
      (1L, 1L, 1L, 1.0, 1.00, 0.0, 0.0, "R", "O", "1995-09-02"),
      (2L, 1L, 1L, 1.0, 1.00, 0.0, 0.0, "N", "O", "1995-09-03"),
      (3L, 1L, 1L, 1.0, 1.00, 0.0, 0.0, "R", "O", "1995-10-05"),
      (4L, 1L, 1L, 1.0, 1.00, 0.0, 0.0, "R", "O", "1995-07-15")))
    val rows = q("tq4_order_priority")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("1-URGENT", 1L), ("3-MEDIUM", 1L)), s"got ${rows.toSeq}")
  }

  test("tq4: the EXISTS is a left-semi join probing a one-column build side") {
    val p = plan("tq4_order_priority")
    assert(p.contains("LeftSemi"), s"EXISTS not decorrelated to a semi join:\n$p")
    // the lineitem scan reads exactly the key + the filter column
    assert(p.contains("struct<l_orderkey:bigint,l_returnflag:string>"),
      s"lineitem scan not pruned to (orderkey, returnflag):\n$p")
  }

  // ── tq6 ──────────────────────────────────────────────────────────────────

  test("tq6: only the year × discount-band × quantity-band survivors sum") {
    val dir = tmpDir("tq6a")
    writeLineitem(dir, Seq(
      (1L, 1L, 1L, 10.0, 100.00, 0.05, 0.0, "N", "O", "1996-06-01"), // in
      (2L, 1L, 1L, 24.0, 100.00, 0.05, 0.0, "N", "O", "1996-06-01"), // qty out
      (3L, 1L, 1L, 10.0, 100.00, 0.07, 0.0, "N", "O", "1996-06-01"), // disc out
      (4L, 1L, 1L, 10.0, 100.00, 0.05, 0.0, "N", "O", "1995-06-01"))) // year out
    val r = q("tq6_forecast_revenue")(spark, dir).collect()(0)
    // 10000c * 5 = 50000 c4 -> 500 cents
    assert((r.getLong(0), r.getLong(1)) == (500L, 1L), s"got $r")
  }

  test("tq6: one pushed-down scan into a 1-row aggregate") {
    val p = fplan("tq6_forecast_revenue")
    assert("Scan parquet".r.findAllIn(p).size >= 1 && !p.contains("Join"),
      s"tq6 must be a single-scan aggregate:\n$p")
    // the date+quantity predicates reach the scan (discount's round() is a
    // residual — pushdown can't see through arithmetic)
    assert(p.contains("LessThan(l_shipdate,1997-01-01") &&
      p.contains("LessThan(l_quantity,24.0)"),
      s"range predicates not pushed to the scan:\n$p")
  }

  // ── tq7 ──────────────────────────────────────────────────────────────────

  test("tq7: revenue splits by direction and ship year; same-nation flows drop") {
    val dir = tmpDir("tq7a")
    writeDims(dir)
    writeCustomer(dir, Seq(
      (10L, "c10", 2, 0.0), (20L, "c20", 1, 0.0), (30L, "c30", 3, 0.0)))
    writeOrders(dir, Seq(
      (1L, 10L, "5-LOW", "1996-01-01"),
      (2L, 20L, "5-LOW", "1997-01-01"),
      (3L, 30L, "5-LOW", "1996-01-01")))
    writeLineitem(dir, Seq(
      (1L, 1L, 1L, 1.0, 100.00, 0.0, 0.0, "N", "O", "1996-03-01"), // N1 -> N2
      (1L, 1L, 2L, 1.0, 77.00, 0.0, 0.0, "N", "O", "1996-03-02"),  // N2 -> N2: same, drop
      (2L, 1L, 2L, 1.0, 50.00, 0.0, 0.0, "N", "O", "1997-04-01"),  // N2 -> N1
      (3L, 1L, 1L, 1.0, 33.00, 0.0, 0.0, "N", "O", "1996-05-01"))) // cust N3: drop
    val rows = q("tq7_volume_shipping")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      ("NATION_1", "NATION_2", 1996L, 1000000L),
      ("NATION_2", "NATION_1", 1997L, 500000L)), s"got ${rows.toSeq}")
  }

  test("tq7: the fact scan is pruned to the five columns the flow needs") {
    val p = fplan("tq7_volume_shipping")
    assert(p.contains("struct<l_orderkey:bigint,l_suppkey:bigint," +
      "l_extendedprice:double,l_discount:double,l_shipdate:timestamp"),
      s"lineitem scan not pruned:\n$p")
  }

  // ── tq10 ─────────────────────────────────────────────────────────────────

  test("tq10: returned revenue rolls up per customer inside the quarter") {
    val dir = tmpDir("tq10a")
    writeDims(dir)
    writeCustomer(dir, Seq(
      (10L, "c10", 1, -10.50), (20L, "c20", 2, 7.25), (30L, "c30", 3, 0.0)))
    writeOrders(dir, Seq(
      (1L, 10L, "5-LOW", "1995-11-01"),
      (2L, 20L, "5-LOW", "1995-11-02"),
      (3L, 30L, "5-LOW", "1996-02-01"))) // outside quarter
    writeLineitem(dir, Seq(
      (1L, 1L, 1L, 1.0, 100.00, 0.00, 0.0, "R", "O", "1995-11-10"),
      (1L, 1L, 1L, 1.0, 999.00, 0.00, 0.0, "N", "O", "1995-11-10"), // not returned
      (2L, 1L, 1L, 1.0, 50.00, 0.10, 0.0, "R", "O", "1995-11-11"),
      (3L, 1L, 1L, 1.0, 77.00, 0.00, 0.0, "R", "O", "1996-02-02")))
    val rows = q("tq10_returned_items")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (10L, "c10", "NATION_1", -1050L, 1000000L),
      (20L, "c20", "NATION_2", 725L, 450000L)), s"got ${rows.toSeq}")
  }

  test("tq10: revenue aggregates to customer grain BEFORE the customer join") {
    // optimized-plan sandwich: the customer join (on c_custkey) sits ABOVE
    // the per-customer Aggregate, which sits ABOVE the fact-fact join (on
    // o_orderkey) — parents print before children in the tree
    val p = q("tq10_returned_items")(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan.toString
    val custJoin = p.indexOf("= c_custkey")
    val agg = p.indexOf("Aggregate [")
    val factJoin = p.indexOf("= o_orderkey")
    assert(custJoin >= 0 && agg > custJoin && factJoin > agg,
      s"per-customer aggregate not between the dim join and the fact join:\n$p")
  }

  // ── tq13 ─────────────────────────────────────────────────────────────────

  test("tq13: zero-order and urgent-only customers land in the 0 bucket") {
    val dir = tmpDir("tq13a")
    writeCustomer(dir, Seq(
      (10L, "c10", 1, 0.0), (20L, "c20", 1, 0.0),
      (30L, "c30", 1, 0.0), (40L, "c40", 1, 0.0)))
    writeOrders(dir, Seq(
      (1L, 10L, "5-LOW", "1995-01-01"), (2L, 10L, "3-MEDIUM", "1995-01-02"),
      (3L, 10L, "1-URGENT", "1995-01-03"), // urgent excluded -> c10 counts 2
      (4L, 20L, "1-URGENT", "1995-01-04"), // urgent-only -> 0
      (5L, 40L, "5-LOW", "1995-01-05"), (6L, 40L, "5-LOW", "1995-01-06")))
    val rows = q("tq13_customer_distribution")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((2L, 2L), (0L, 2L)), s"got ${rows.toSeq}")
  }

  test("tq13: the fact collapses first — orders scan pruned to two columns") {
    val p = plan("tq13_customer_distribution")
    assert(p.contains("struct<o_custkey:bigint,o_orderpriority:string>"),
      s"orders scan not pruned to (custkey, priority):\n$p")
  }

  // ── tq14 ─────────────────────────────────────────────────────────────────

  test("tq14: promo share is exact integer ppm per month") {
    val dir = tmpDir("tq14a")
    writePart(dir, Seq((1L, "Brand#1", "PROMO", 5), (2L, "Brand#2", "STANDARD", 5)))
    writeLineitem(dir, Seq(
      (1L, 1L, 1L, 1.0, 100.00, 0.0, 0.0, "N", "O", "1996-03-10"),
      (2L, 2L, 1L, 1.0, 300.00, 0.0, 0.0, "N", "O", "1996-03-20"),
      (3L, 2L, 1L, 1.0, 999.00, 0.0, 0.0, "N", "O", "1995-03-20"))) // year out
    val rows = q("tq14_promo_effect")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 1e6 / 4e6 of the month's c4 revenue = 250000 ppm
    assert(rows.toSeq == Seq(("1996-03", 1000000L, 4000000L, 250000L)),
      s"got ${rows.toSeq}")
  }

  // ── tq15 ─────────────────────────────────────────────────────────────────

  test("tq15: ties at the max all return; outside-window revenue is ignored") {
    val dir = tmpDir("tq15a")
    writeDims(dir)
    writeLineitem(dir, Seq(
      (1L, 1L, 1L, 1.0, 100.00, 0.0, 0.0, "N", "O", "1996-02-01"),
      (2L, 1L, 1L, 1.0, 50.00, 0.0, 0.0, "N", "O", "1996-02-02"),  // s1: 1.5e6
      (3L, 1L, 2L, 1.0, 150.00, 0.0, 0.0, "N", "O", "1996-03-01"), // s2: 1.5e6 tie
      (4L, 1L, 3L, 1.0, 100.00, 0.0, 0.0, "N", "O", "1996-01-15"), // s3: 1.0e6
      (5L, 1L, 3L, 1.0, 999.00, 0.0, 0.0, "N", "O", "1996-06-01"))) // outside Q1
    val rows = q("tq15_top_supplier")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, "s1", 1500000L), (2L, "s2", 1500000L)),
      s"got ${rows.toSeq}")
  }

  test("tq15: the max is the 1-row-broadcast device — no window in the plan") {
    val p = plan("tq15_top_supplier")
    assert(!p.contains("Window"), s"tq15 must not sort a window:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"1-row max not broadcast:\n$p")
  }

  // ── tq19 ─────────────────────────────────────────────────────────────────

  test("tq19: the OR-of-ANDs admits exactly the in-band (brand, size, qty) triples") {
    val dir = tmpDir("tq19a")
    writePart(dir, Seq(
      (1L, "Brand#12", "PROMO", 3), (2L, "Brand#15", "PROMO", 8),
      (3L, "Brand#21", "PROMO", 12), (4L, "Brand#12", "PROMO", 20))) // size out
    writeLineitem(dir, Seq(
      (1L, 1L, 1L, 5.0, 100.00, 0.0, 0.0, "N", "O", "1996-01-01"),  // band 1 in
      (2L, 1L, 1L, 12.0, 999.00, 0.0, 0.0, "N", "O", "1996-01-01"), // qty out
      (3L, 2L, 1L, 15.0, 50.00, 0.0, 0.0, "N", "O", "1996-01-01"),  // band 2 in
      (4L, 3L, 1L, 25.0, 10.00, 0.0, 0.0, "N", "O", "1996-01-01"),  // band 3 in
      (5L, 3L, 1L, 5.0, 999.00, 0.0, 0.0, "N", "O", "1996-01-01"),  // qty out
      (6L, 4L, 1L, 5.0, 999.00, 0.0, 0.0, "N", "O", "1996-01-01"))) // part out
    val r = q("tq19_discounted_revenue")(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1)) == (1600000L, 3L), s"got $r")
  }

  test("tq19: the factored brand/size envelope reaches the part scan") {
    val p = fplan("tq19_discounted_revenue")
    assert(p.contains("In(p_brand") && p.contains("LessThanOrEqual(p_size,15)"),
      s"brand/size envelope not pushed to the part scan:\n$p")
  }

  // ── tq22 ─────────────────────────────────────────────────────────────────

  test("tq22: above-average balance AND no recent order, grouped by nation") {
    val dir = tmpDir("tq22a")
    writeCustomer(dir, Seq(
      (10L, "c10", 1, 100.00),  // above avg, but has a recent order
      (20L, "c20", 7, 90.00),   // above avg, dormant -> the one survivor
      (30L, "c30", 1, -20.00),  // negative: excluded from avg AND candidacy
      (40L, "c40", 1, 30.00)))  // below avg
    writeOrders(dir, Seq(
      (1L, 10L, "5-LOW", "1999-06-01"),   // recent -> kills c10
      (2L, 20L, "5-LOW", "1998-01-01")))  // old -> c20 stays dormant
    // positive avg = (10000 + 9000 + 3000) // 3 = 7333 cents
    val rows = q("tq22_dormant_customers")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((7, 1L, 9000L)), s"got ${rows.toSeq}")
  }

  test("tq22: the NOT EXISTS is a left-anti join on a one-column probe") {
    val p = plan("tq22_dormant_customers")
    assert(p.contains("LeftAnti"), s"NOT EXISTS not decorrelated to anti join:\n$p")
    assert(p.contains("struct<o_custkey:bigint,o_orderdate:timestamp"),
      s"orders scan not pruned to (custkey, orderdate):\n$p")
  }

  // ── tq2 ──────────────────────────────────────────────────────────────────

  private def writeRegionNation(dir: String): Unit = {
    import spark.implicits._
    Seq((0, "EUROPE"), (1, "ASIA")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    Seq((1, "NATION_1", 0), (2, "NATION_2", 0), (3, "NATION_3", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
  }

  test("tq2: per-part minimum over EUROPE suppliers; min ties all return") {
    import spark.implicits._
    val dir = tmpDir("tq2a")
    writeRegionNation(dir)
    // s1/s2 EUROPE (bal 5.00 / 3.00), s3 ASIA (bal 1.00 — cheapest but
    // outside the region, must not win)
    Seq((1L, "s1", 1, 5.00), (2L, "s2", 2, 3.00), (3L, "s3", 3, 1.00))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, "big bolt", "LARGE", 3), (2L, "odd nut", "LARGE", 30))
      .toDF("p_partkey", "p_name", "p_type", "p_size")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    // part 1 supplied by all three (twice by s1 — supply must distinct)
    writeLineitem(dir, Seq(
      (1L, 1L, 1L, 1.0, 1.00, 0.0, 0.0, "N", "O", "1996-01-01"),
      (2L, 1L, 1L, 1.0, 1.00, 0.0, 0.0, "N", "O", "1996-01-02"),
      (3L, 1L, 2L, 1.0, 1.00, 0.0, 0.0, "N", "O", "1996-01-03"),
      (4L, 1L, 3L, 1.0, 1.00, 0.0, 0.0, "N", "O", "1996-01-04"),
      (5L, 2L, 1L, 1.0, 1.00, 0.0, 0.0, "N", "O", "1996-01-05"))) // size-30 part: out
    val rows = q("tq2_min_cost_supplier")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(5)))
    assert(rows.toSeq == Seq((1L, 2L, 300L)), s"got ${rows.toSeq}")
  }

  test("tq2: the correlated min is a window — one supply-pair shuffle, no self-join") {
    val p = plan("tq2_min_cost_supplier")
    assert(p.contains("Window"), s"per-part min not a window:\n$p")
  }

  // ── tq9 ──────────────────────────────────────────────────────────────────

  test("tq9: profit = revenue minus retail cost, by nation and year") {
    import spark.implicits._
    val dir = tmpDir("tq9a")
    writeRegionNation(dir)
    Seq((1L, "s1", 1), (2L, "s2", 2)).toDF("s_suppkey", "s_name", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, "red widget", "PROMO", 1.00), (2L, "blue bolt", "PROMO", 9.00))
      .toDF("p_partkey", "p_name", "p_type", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    writeOrders(dir, Seq(
      (1L, 10L, "5-LOW", "1996-03-01"), (2L, 10L, "5-LOW", "1997-03-01")))
    writeLineitem(dir, Seq(
      // red part, qty 2, price 10.00, no disc: r4 = 1000*100 = 100000 c4;
      // cost = 100c*2*100 = 20000 c4 -> profit 80000
      (1L, 1L, 1L, 2.0, 10.00, 0.0, 0.0, "N", "O", "1996-04-01"),
      // blue part: name has no 'red' -> excluded
      (2L, 2L, 2L, 1.0, 50.00, 0.0, 0.0, "N", "O", "1997-04-01")))
    val rows = q("tq9_product_type_profit")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("NATION_1", 1996L, 80000L)), s"got ${rows.toSeq}")
  }

  // ── tq11 ─────────────────────────────────────────────────────────────────

  test("tq11: only parts above twice the average part value survive") {
    import spark.implicits._
    val dir = tmpDir("tq11a")
    writeRegionNation(dir)
    Seq((1L, "s1", 1), (2L, "s2", 2)).toDF("s_suppkey", "s_name", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    // 10001 parts of value 100c each + one of 10000c: total = 1010100,
    // n = 10002. value·n > 2·total: 100·10002 = 1000200 < 2020200 fails;
    // 10000·10002 = 100020000 passes — ONLY the big part survives
    val parts = (1L to 10001L).map(i => (i, 1.00)) :+ (20000L, 100.00)
    parts.toDF("p_partkey", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val lines = (1L to 10001L).map(i =>
      (i, i, 1L, 1.0, 1.00, 0.0, 0.0, "N", "O", "1996-01-01")) :+
      ((20000L, 20000L, 1L, 1.0, 1.00, 0.0, 0.0, "N", "O", "1996-01-01"))
    writeLineitem(dir, lines)
    val rows = q("tq11_important_stock")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((20000L, 10000L)), s"got ${rows.toSeq}")
  }

  // ── tq12 ─────────────────────────────────────────────────────────────────

  test("tq12: late 1996 lines split into high/low priority per return class") {
    val dir = tmpDir("tq12a")
    writeOrders(dir, Seq(
      (1L, 10L, "1-URGENT", "1995-06-01"),
      (2L, 10L, "5-LOW", "1995-06-01"),
      (3L, 10L, "2-HIGH", "1996-05-01")))
    writeLineitem(dir, Seq(
      (1L, 1L, 1L, 1.0, 1.00, 0.0, 0.0, "R", "O", "1996-03-01"), // late, high
      (2L, 1L, 1L, 1.0, 1.00, 0.0, 0.0, "R", "O", "1996-03-02"), // late, low
      (2L, 1L, 1L, 1.0, 1.00, 0.0, 0.0, "N", "O", "1996-03-03"), // late, low, class N
      (3L, 1L, 1L, 1.0, 1.00, 0.0, 0.0, "R", "O", "1996-06-01"), // NOT late (31d)
      (1L, 1L, 1L, 1.0, 1.00, 0.0, 0.0, "R", "O", "1997-03-01"))) // outside 1996
    val rows = q("tq12_priority_lateness")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("N", 0L, 1L), ("R", 1L, 1L)), s"got ${rows.toSeq}")
  }

  // ── tq16 ─────────────────────────────────────────────────────────────────

  test("tq16: distinct suppliers per attribute triple, complaints excluded") {
    import spark.implicits._
    val dir = tmpDir("tq16a")
    Seq((1L, "s1", 1, 5.00), (2L, "s2", 1, -1.00), (3L, "s3", 1, 2.00))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, "Brand#1", "SMALL", 5), (2L, "Brand#1", "SMALL", 5),
        (3L, "Brand#2", "PROMO", 5))
      .toDF("p_partkey", "p_brand", "p_type", "p_size")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    writeLineitem(dir, Seq(
      (1L, 1L, 1L, 1.0, 1.00, 0.0, 0.0, "N", "O", "1996-01-01"),
      (2L, 1L, 1L, 1.0, 1.00, 0.0, 0.0, "N", "O", "1996-01-02"), // dup pair
      (3L, 2L, 1L, 1.0, 1.00, 0.0, 0.0, "N", "O", "1996-01-03"),
      (4L, 2L, 3L, 1.0, 1.00, 0.0, 0.0, "N", "O", "1996-01-04"),
      (5L, 1L, 2L, 1.0, 1.00, 0.0, 0.0, "N", "O", "1996-01-05"), // s2: excluded
      (6L, 3L, 1L, 1.0, 1.00, 0.0, 0.0, "N", "O", "1996-01-06"))) // PROMO: excluded
    val rows = q("tq16_supplier_count")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    // (Brand#1, SMALL, 5): suppliers {s1 (parts 1+2), s3 (part 2)} = 2
    assert(rows.toSeq == Seq(("Brand#1", "SMALL", 5, 2L)), s"got ${rows.toSeq}")
  }

  // ── tq20 ─────────────────────────────────────────────────────────────────

  test("tq20: only NATION_9 suppliers with >30 promo units on ONE part qualify") {
    import spark.implicits._
    val dir = tmpDir("tq20a")
    Seq((9, "NATION_9", 0), (1, "NATION_1", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, "s1", 9, 1.0), (2L, "s2", 9, 1.0), (3L, "s3", 1, 1.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, "a", "PROMO", 1), (2L, "b", "STANDARD", 1))
      .toDF("p_partkey", "p_name", "p_type", "p_size")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    writeLineitem(dir, Seq(
      // s1: 20+20 = 40 promo units on part 1 -> qualifies
      (1L, 1L, 1L, 20.0, 1.00, 0.0, 0.0, "N", "O", "1996-02-01"),
      (2L, 1L, 1L, 20.0, 1.00, 0.0, 0.0, "N", "O", "1996-03-01"),
      // s2: 40 units but split 20 promo / 20 STANDARD -> promo only 20: out
      (3L, 1L, 2L, 20.0, 1.00, 0.0, 0.0, "N", "O", "1996-04-01"),
      (4L, 2L, 2L, 20.0, 1.00, 0.0, 0.0, "N", "O", "1996-05-01"),
      // s3: 40 promo units but NATION_1 -> out
      (5L, 1L, 3L, 40.0, 1.00, 0.0, 0.0, "N", "O", "1996-06-01")))
    val rows = q("tq20_potential_promotion")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "s1")), s"got ${rows.toSeq}")
  }
}
