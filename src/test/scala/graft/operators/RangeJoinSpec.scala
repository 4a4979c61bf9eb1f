package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("binned range join equals the brute-force theta join (no keys)") {
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-03 12:00:00")),
      (3L, ts("2024-01-07 00:00:00")), (4L, ts("2024-02-01 08:30:00")),
      (5L, ts("2024-01-05 23:59:59"))).toDF("pid", "t")
    val ivs = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-06 00:00:00")),
      (11L, ts("2024-01-05 00:00:00"), ts("2024-01-08 00:00:00")),
      (12L, ts("2024-03-01 00:00:00"), ts("2024-03-02 00:00:00"))).toDF("iid", "s", "e")
    val binned = RangeJoin.binned(points, ivs, "t", "s", "e", binSeconds = 86400L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = points.join(ivs, col("t") >= col("s") && col("t") < col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == brute)
    assert(brute == Set((1L, 10L), (2L, 10L), (5L, 10L), (5L, 11L), (3L, 11L)))
  }

  test("boundary semantics: start inclusive, end exclusive") {
    val points = Seq((1L, ts("2024-01-06 00:00:00"))).toDF("pid", "t")
    val ivs = Seq((10L, ts("2024-01-01 00:00:00"), ts("2024-01-06 00:00:00")),
      (11L, ts("2024-01-06 00:00:00"), ts("2024-01-07 00:00:00"))).toDF("iid", "s", "e")
    val got = RangeJoin.binned(points, ivs, "t", "s", "e", binSeconds = 3600L)
      .select("iid").collect().map(_.getLong(0)).toSet
    assert(got == Set(11L)) // not 10: end is exclusive
  }

  test("each matching pair appears exactly once despite multi-bin intervals") {
    val points = Seq((1L, ts("2024-01-04 00:00:00"))).toDF("pid", "t")
    // interval spans 9 bins at 1-day width
    val ivs = Seq((10L, ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00"))).toDF("iid", "s", "e")
    val got = RangeJoin.binned(points, ivs, "t", "s", "e", binSeconds = 86400L)
    assert(got.count() == 1)
  }
}
