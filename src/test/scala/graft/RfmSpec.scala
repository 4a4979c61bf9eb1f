package graft

/** seg1's conservation and scoring invariants: segment counts and cents
  * partition the purchasing-user population exactly, and every segment
  * code decodes to digits in 1..5.
  */
class RfmSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private val sf = "/root/testdata/sf0.001"

  test("segments partition users and revenue; codes decode to 1..5 digits") {
    val rows = SparkEntry.queries("seg1_rfm_segments")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
    val nUsers = purchases.select("user_id").distinct().count()
    val cents = purchases
      .agg(sum(expr("cast(round(value * 100) as bigint)"))).head().getLong(0)
    assert(rows.map(_._2).sum == nUsers, "user counts must partition the population")
    assert(rows.map(_._3).sum == cents, "cent totals must partition total revenue")
    rows.foreach { case (rfm, _, _) =>
      val (r, f, m) = (rfm / 100, rfm / 10 % 10, rfm % 10)
      assert(Seq(r, f, m).forall(d => d >= 1 && d <= 5), s"bad code $rfm")
    }
  }

  test("seg1 on testdata is deterministic across runs") {
    val a = SparkEntry.queries("seg1_rfm_segments")(spark, sf)
    val b = SparkEntry.queries("seg1_rfm_segments")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
