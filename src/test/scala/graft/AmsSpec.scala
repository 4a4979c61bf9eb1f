package graft

/** ams1's Tug-of-War F2: the exact companion is a pure function of the
  * frequency table, the md5-parity sign family is balanced enough for the
  * 64-counter mean to land inside the asserted 2x envelope, and sketch
  * counters merge by addition (computed here by splitting the input).
  */
class AmsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("exact F2, estimate, and bound flag on testdata") {
    val r = SparkEntry.queries("ams1_second_moment")(spark, sf).head()
    val (exact, est, ok) = (r.getLong(0), r.getLong(1), r.getInt(2))
    // independent exact computation via SQL on the same table
    val f2 = Tables.lineitem(spark, sf).groupBy("l_partkey").count()
      .selectExpr("cast(sum(cast(count as decimal(38,0)) * count) as bigint)")
      .head().getLong(0)
    assert(exact == f2, s"exact F2: $exact vs independent $f2")
    assert(ok == 1, s"estimate $est should sit within 2x of exact $exact")
    assert(math.abs(est - exact) < exact / 2, "estimator landed far off")
  }

  test("ams1 on testdata is deterministic across runs") {
    val a = SparkEntry.queries("ams1_second_moment")(spark, sf)
    val b = SparkEntry.queries("ams1_second_moment")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
