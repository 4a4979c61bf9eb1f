package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: updates win on key, other base rows kept, new keys appended") {
    val base = Seq((1, "a", 10), (2, "b", 20), (3, "c", 30)).toDF("k", "name", "v")
    val upd  = Seq((2, "B", 99), (4, "d", 40)).toDF("k", "name", "v")
    val got = Merge.upsert(base, upd, Seq("k"))
      .orderBy("k").as[(Int, String, Int)].collect().toSeq
    assert(got == Seq((1, "a", 10), (2, "B", 99), (3, "c", 30), (4, "d", 40)))
  }

  test("upsert with empty updates is identity") {
    val base = Seq((1, "a", 10), (2, "b", 20)).toDF("k", "name", "v")
    val upd = base.filter(lit(false))
    assert(Merge.upsert(base, upd, Seq("k")).count() == 2)
  }

  test("composite keys: collision requires ALL key columns to match") {
    val base = Seq((1, "x", 10), (1, "y", 20)).toDF("k1", "k2", "v")
    val upd  = Seq((1, "x", 99)).toDF("k1", "k2", "v")
    val got = Merge.upsert(base, upd, Seq("k1", "k2"))
      .orderBy("k1", "k2").as[(Int, String, Int)].collect().toSeq
    assert(got == Seq((1, "x", 99), (1, "y", 20)))
  }

  test("pk1 packing invariant: every pack except a source's last fills past its boundary") {
    // fixed-offset packing: pack p spans token offsets [512p, 512(p+1));
    // each non-final pack's cumulative token count must reach its boundary
    val packs = graft.SparkEntry.queries("pk1_seq_pack")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val bySource = packs.groupBy(_._1)
    bySource.foreach { case (src, ps) =>
      val sorted = ps.sortBy(_._2)
      // pack ids are contiguous from 0
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong), src)
      // cumulative totals cross each non-final pack boundary
      val cum = sorted.map(_._3).scanLeft(0L)(_ + _).drop(1)
      cum.dropRight(1).zipWithIndex.foreach { case (c, i) =>
        assert(c >= 512L * (i + 1), s"$src pack $i underfilled: $c")
      }
    }
  }
}
