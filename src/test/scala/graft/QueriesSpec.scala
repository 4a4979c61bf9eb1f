package graft

/** Smoke: every declared query executes at sf0.001 and oracle coverage is
  * complete. Value-level correctness is the DuckDB oracle gate
  * (tools/check_oracle.py at sf0.01) — this spec guards executability and
  * the queries↔oracle contract shape.
  */
class QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every query executes and the flagship entry returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle (or is explicitly unchecked)") {
    val unchecked = // approximate by design
      Set("sim3_ann_lsh", "agg4_approx_distinct", "dd5b_embedding_neardup_lsh",
        "agg6_approx_quantiles")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == unchecked, s"queries without oracle SQL: $missing")
    assert(SparkEntry.queries.size >= 98)
  }

  test("GK approx quantiles sit within the exact per-group value range") {
    val exact = SparkEntry.queries("agg5_percentiles")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    SparkEntry.queries("agg6_approx_quantiles")(spark, sf).collect().foreach { r =>
      val (p50e, p90e) = exact(r.getString(0))
      // GK with accuracy 1000 on ~thousands of rows: rank error <= n/1000;
      // quantity is integer-valued 1..50, so the value error stays small
      assert(math.abs(r.getDouble(1) - p50e) <= 2.0, s"p50 off: $r vs $p50e")
      assert(math.abs(r.getDouble(2) - p90e) <= 2.0, s"p90 off: $r vs $p90e")
    }
  }

  test("HLL approx distinct is within 5% of exact") {
    SparkEntry.queries("agg4_approx_distinct")(spark, sf).collect().foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"approx $approx vs exact $exact")
    }
  }
}
