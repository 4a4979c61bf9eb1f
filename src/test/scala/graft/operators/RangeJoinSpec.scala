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

  test("intervalOverlap: equals brute force, each pair exactly once, " +
    "adjacency excluded (half-open)") {
    val as = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-12 00:00:00")), // spans many bins
      (2L, ts("2024-01-05 00:00:00"), ts("2024-01-06 00:00:00")),
      (3L, ts("2024-02-01 00:00:00"), ts("2024-02-02 00:00:00"))).toDF("aid", "as_", "ae")
    val bs = Seq(
      (10L, ts("2024-01-03 00:00:00"), ts("2024-01-20 00:00:00")), // overlaps 1 in many bins
      (11L, ts("2024-01-06 00:00:00"), ts("2024-01-07 00:00:00")), // adjacent to 2: NO overlap
      (12L, ts("2023-12-25 00:00:00"), ts("2024-01-02 00:00:00"))).toDF("bid", "bs_", "be")
    val got = RangeJoin.intervalOverlap(as, bs, "as_", "ae", "bs_", "be",
        binSeconds = 86400L)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // no duplicates even though (1,10) share 9 one-day bins
    assert(got.size == got.toSet.size, s"pair counted twice: $got")
    val brute = as.join(bs, col("as_") < col("be") && col("bs_") < col("ae"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.toSet == brute)
    assert(brute == Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L)))
  }

  test("property: intervalOverlap == brute force over random intervals/bins") {
    val rnd = new scala.util.Random(29)
    val base = ts("2024-01-01 00:00:00").getTime
    (1 to 3).foreach { trial =>
      def mk(n: Int, tag: Long) = (1 to n).map { i =>
        val s0 = base + rnd.nextInt(30 * 86400) * 1000L
        (tag + i, new java.sql.Timestamp(s0),
          new java.sql.Timestamp(s0 + (1 + rnd.nextInt(6 * 86400)) * 1000L))
      }
      val as = mk(40, 0L).toDF("aid", "as_", "ae")
      val bs = mk(25, 100L).toDF("bid", "bs_", "be")
      val binSeconds = Seq(3600L, 86400L, 7L * 86400)(trial % 3)
      val got = RangeJoin.intervalOverlap(as, bs, "as_", "ae", "bs_", "be",
          binSeconds = binSeconds)
        .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val brute = as.join(bs, col("as_") < col("be") && col("bs_") < col("ae"))
        .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == brute, s"trial $trial, bin $binSeconds")
    }
  }

  test("property: binned == brute force over random points/intervals/bin widths") {
    val rnd = new scala.util.Random(13)
    val base = ts("2024-01-01 00:00:00").getTime
    (1 to 3).foreach { trial =>
      val points = (1 to 60).map(i =>
        (i.toLong, new java.sql.Timestamp(base + rnd.nextInt(30 * 86400) * 1000L)))
        .toDF("pid", "t")
      val ivs = (1 to 25).map { i =>
        val s0 = base + rnd.nextInt(30 * 86400) * 1000L
        (100L + i, new java.sql.Timestamp(s0),
          new java.sql.Timestamp(s0 + (1 + rnd.nextInt(5 * 86400)) * 1000L))
      }.toDF("iid", "s", "e")
      val binSeconds = Seq(3600L, 86400L, 7L * 86400)(trial % 3)
      val binned = RangeJoin.binned(points, ivs, "t", "s", "e", binSeconds = binSeconds)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val brute = points.join(ivs, col("t") >= col("s") && col("t") < col("e"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(binned == brute, s"trial $trial, bin $binSeconds")
    }
  }
}
