package graft

import org.apache.spark.sql.functions._

/** Behavioral + plan invariants of the two decorrelation-showcase star
  * queries (tq18_big_orders, tq21_late_supplier, RelationalQueries): the
  * hand fixtures pin the HAVING / exactly-one-late semantics, and the plan
  * asserts pin what the 100 TB claims rest on — the lineitem scan pruned to
  * the columns the aggregate needs, the HAVING applied before any join
  * (tq18), one fact-fact shuffle with the supplier dim broadcast (tq21).
  */
class TqDecorrelationSpec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)

  private def tmpDir(prefix: String): String =
    CacheRegistry.trackPath(
      java.nio.file.Files.createTempDirectory(prefix).toString)

  private def writeStar(dir: String,
      li: Seq[(Long, Long, Double, String)],
      ords: Seq[(Long, Long, String, Double)]): Unit = {
    import spark.implicits._
    li.toDF("l_orderkey", "l_suppkey", "l_quantity", "l_shipdate")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    ords.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, "c10"), (20L, "c20")).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, "s1"), (2L, "s2")).toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
  }

  // ── tq18 ─────────────────────────────────────────────────────────────────

  test("tq18: only orders whose TOTAL quantity tops 250 survive the having") {
    val dir = tmpDir("tq18a")
    writeStar(dir,
      li = Seq(
        (1L, 1L, 100.0, "2020-02-01"), (1L, 2L, 200.0, "2020-02-01"), // 300 ✓
        (2L, 1L, 100.0, "2020-02-01"), (2L, 2L, 50.0, "2020-02-01"),  // 150 ✗
        (3L, 1L, 260.0, "2020-02-01")),                               // 260 ✓
      ords = Seq(
        (1L, 10L, "1995-01-02", 1234.56),
        (2L, 10L, "1995-01-03", 50.00),
        (3L, 20L, "1996-05-05", 99.99)))
    val rows = q("tq18_big_orders")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.toSeq == Seq(
      ("c10", 10L, 1L, "1995-01-02", 123456L, 300L),
      ("c20", 20L, 3L, "1996-05-05", 9999L, 260L)), s"got ${rows.toSeq}")
  }

  test("tq18: the lineitem scan is pruned to (orderkey, quantity) and the " +
      "having runs before any join") {
    val p = q("tq18_big_orders")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // column pruning reached the fact scan — the 100 TB claim: the agg
    // reads 2 of 11 lineitem columns
    assert(p.contains("struct<l_orderkey:bigint,l_quantity:double>"),
      s"lineitem scan not pruned to the aggregate's columns:\n$p")
    // the sum_qty filter sits between the aggregate and the scan side of
    // the join tree (never above a join): in the printed tree every join
    // row precedes its children, so the LAST join must appear before the
    // first sum_qty filter
    val firstFilter = p.indexOf("> 250")
    val lastJoin = math.max(p.lastIndexOf("SortMergeJoin"),
      math.max(p.lastIndexOf("ShuffledHashJoin"), p.lastIndexOf("BroadcastHashJoin")))
    assert(firstFilter >= 0, s"no having filter found:\n$p")
    assert(lastJoin < firstFilter,
      s"having filter not below the joins:\n$p")
  }

  // ── tq17 ─────────────────────────────────────────────────────────────────

  test("tq17: only sub-20%-of-part-average quantities count, exactly") {
    import spark.implicits._
    val dir = tmpDir("tq17a")
    // part 1: qtys {1,10,10,10} -> sum 31, cnt 4; qty 1: 1*5*4 = 20 < 31
    // qualifies (1 < 31/20 = 1.55), qty 10: 200 > 31 does not.
    // part 2: qtys {5,5} -> 50 > 10: nothing qualifies.
    Seq(
      (1L, 1L, 1.0, 2.50), (2L, 1L, 10.0, 9.99),
      (3L, 1L, 10.0, 9.99), (4L, 1L, 10.0, 9.99),
      (5L, 2L, 5.0, 1.00), (6L, 2L, 5.0, 1.00))
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = q("tq17_small_qty_revenue")(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (1L, 250L, 35L), s"got $r")
  }

  test("tq17: the correlated average is a window — ONE lineitem scan in the plan") {
    val p = q("tq17_small_qty_revenue")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected a single lineitem scan, found $scans:\n$p")
    assert(p.contains("Window"), s"per-part average not a window aggregate:\n$p")
  }

  // ── tq21 ─────────────────────────────────────────────────────────────────

  test("tq21: exactly-one-late on a multi-supplier order; 2-late and " +
      "single-supplier orders are excluded") {
    val dir = tmpDir("tq21a")
    // 1000 days past 2020-01-01 is 2022-09-27 — "2023-06-01" is late,
    // "2020-02-01" is not
    writeStar(dir,
      li = Seq(
        (1L, 1L, 1.0, "2023-06-01"), // order 1: s1 late...
        (1L, 1L, 1.0, "2020-03-01"), // ...and also an on-time line (still late)
        (1L, 2L, 1.0, "2020-02-01"), // s2 on-time -> order 1 qualifies for s1
        (2L, 1L, 1.0, "2023-06-01"), // order 2: both late -> excluded
        (2L, 2L, 1.0, "2023-06-01"),
        (3L, 1L, 1.0, "2023-06-01")), // order 3: single supplier -> excluded
      ords = Seq(
        (1L, 10L, "2020-01-01", 1.0),
        (2L, 10L, "2020-01-01", 1.0),
        (3L, 20L, "2020-01-01", 1.0)))
    val rows = q("tq21_late_supplier")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, "s1", 1L)), s"got ${rows.toSeq}")
  }

  test("tq21: supplier broadcasts and lineitem-orders is the one shuffle join") {
    val p = q("tq21_late_supplier")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"supplier dim not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // lineitem pruned to the three columns the lateness agg needs
    // (the shipdate physical type is timestamp or timestamp_ntz depending
    // on the corpus generation era — prune check is era-agnostic)
    assert(p.contains("struct<l_orderkey:bigint,l_suppkey:bigint,l_shipdate:timestamp"),
      s"lineitem scan not pruned:\n$p")
  }
}
