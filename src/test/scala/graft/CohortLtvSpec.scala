package graft

import org.apache.spark.sql.functions._

/** ltv1's conservation and monotonicity: cohort cents partition total
  * purchase revenue, cum_cents is the running sum of its cohort's cents
  * (so it never decreases with age), and age 0 always exists per cohort
  * (a user's first purchase is in their cohort week).
  */
class CohortLtvSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("revenue conserves, cum is monotone, age 0 exists per cohort") {
    val rows = SparkEntry.queries("ltv1_cohort_ltv")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum(expr("cast(round(value * 100) as bigint)"))).head().getLong(0)
    assert(rows.map(_._4).sum == total, "cohort cents must partition revenue")
    rows.groupBy(_._1).foreach { case (ck, rs) =>
      val byAge = rs.sortBy(_._2)
      assert(byAge.head._2 == 0L, s"cohort $ck must have an age-0 row")
      assert(byAge.map(_._4).scanLeft(0L)(_ + _).tail.sameElements(byAge.map(_._5)),
        s"cohort $ck cum_cents must be the running sum")
    }
  }

  test("ltv1 on testdata is deterministic across runs") {
    val a = SparkEntry.queries("ltv1_cohort_ltv")(spark, sf)
    val b = SparkEntry.queries("ltv1_cohort_ltv")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
