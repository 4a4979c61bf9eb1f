package graft

/** rk1's leaderboard diff: structural invariants (each side contributes
  * exactly its top-20; statuses partition the union; held means identical
  * rank) plus determinism.
  */
class RankChurnSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("statuses partition the union of both top-20s") {
    val rows = SparkEntry.queries("rk1_rank_churn")(spark, sf).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getString(3)))
    val k = math.min(20L,
      Tables.lineitem(spark, sf).select("l_suppkey").distinct().count())
    val withRa = rows.flatMap(_._2)
    val withRb = rows.flatMap(_._3)
    assert(withRa.sorted.toSeq == (1L to k),
      s"period A must contribute ranks 1..$k exactly once")
    assert(withRb.sorted.toSeq == (1L to k),
      s"period B must contribute ranks 1..$k exactly once")
    rows.foreach {
      case (_, None, Some(_), s) => assert(s == "entered")
      case (_, Some(_), None, s) => assert(s == "exited")
      case (_, Some(a), Some(b), s) =>
        assert(if (a == b) s == "held" else s == "moved")
      case (sk, None, None, _) => fail(s"$sk has no rank on either side")
    }
    assert(rows.map(_._1).distinct.length == rows.length, "suppliers unique")
  }

  test("rk1 on testdata is deterministic across runs") {
    val a = SparkEntry.queries("rk1_rank_churn")(spark, sf)
    val b = SparkEntry.queries("rk1_rank_churn")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
