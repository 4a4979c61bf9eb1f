package graft

import graft.queries.AnalyticsQueries

/** dq4's first-digit audit on a hand-computed 100-amount fixture: observed
  * shares, deviations, and chi-square contributions in exact integers.
  */
class BenfordSpec extends SparkSpec {

  test("hand-computed digit shares, deviations, and chi2 on 100 amounts") {
    import spark.implicits._
    // 30 x $1.00 (digit 1), 18 x $2.00 (digit 2), 52 x $9.00 (digit 9)
    val amounts = (Seq.fill(30)(1.0) ++ Seq.fill(18)(2.0) ++ Seq.fill(52)(9.0))
      .toDF("amt")
    val out = AnalyticsQueries.benfordAudit(amounts, "amt").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    // digit 1: n=30, obs 300000 ppm, dev |300000-301030|=1030,
    //          e_cnt = 301030*100 div 1e6 = 30, diff 0 -> chi2 0
    assert(out(1L) == ((30L, 300000L, 1030L, 0L)), s"digit 1: ${out(1L)}")
    // digit 2: e_cnt = 17, diff 1 -> chi2 = 1 div 17 = 0
    assert(out(2L) == ((18L, 180000L, 3909L, 0L)), s"digit 2: ${out(2L)}")
    // digit 9: e_cnt = 4, diff 48 -> chi2 = 2304 div 4 = 576
    assert(out(9L) == ((52L, 520000L, 474243L, 576L)), s"digit 9: ${out(9L)}")
    assert(out.size == 3, "only observed digits appear")
  }

  test("dq4 on testdata is deterministic across runs") {
    val sf = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("dq4_benford")(spark, sf)
    val b = SparkEntry.queries("dq4_benford")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
