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
      Set("sim3_ann_lsh", "agg4_approx_distinct", "dd5b_embedding_neardup_lsh")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == unchecked, s"queries without oracle SQL: $missing")
    assert(SparkEntry.queries.size >= 62)
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
