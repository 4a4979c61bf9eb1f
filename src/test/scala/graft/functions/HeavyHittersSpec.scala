package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("MG summary keeps items above the n/capacity bound under overflow") {
    // 1 item at 40% + 600 singletons; capacity 16 << 601 distinct
    val words = (Seq.fill(400)("heavy") ++ (1 to 600).map(i => s"rare$i"))
    val df = words.toDF("w").repartition(8) // force partial merges
    val m = df.agg(HeavyHitters.misraGries(16)(col("w")))
      .as[Map[String, Long]].first()
    assert(m.size <= 16)
    assert(m.contains("heavy"))
    // lower-bound property: stored count never exceeds the true count
    assert(m("heavy") <= 400)
  }

  test("two-pass top-k equals exact top-k when heads are above the bound") {
    val words = (Seq.fill(300)("a") ++ Seq.fill(200)("b") ++ Seq.fill(100)("c")
      ++ (1 to 400).map(i => s"tail$i"))
    val df = words.toDF("w").repartition(8)
    val got = HeavyHitters.topkExact(df, "w", k = 3, capacity = 16)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 300L), ("b", 200L), ("c", 100L)))
  }

  test("deterministic tie-break: equal counts order by word") {
    val words = Seq.fill(5)("x") ++ Seq.fill(5)("m") ++ Seq.fill(5)("z")
    val got = HeavyHitters.topkExact(words.toDF("w"), "w", k = 3, capacity = 8)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("m", 5L), ("x", 5L), ("z", 5L)))
  }

  test("certified top-k self-corrects when the starting capacity is too small") {
    // the sf1 regression in miniature: heads are NOT above n/capacity0, so
    // plain two-pass MG at capacity0 may return wrong rows — the certified
    // variant detects the failed guarantee (k-th count <= n/cap) and grows
    // capacity until the result is provably exact
    val words = (Seq.fill(60)("a") ++ Seq.fill(50)("b") ++ Seq.fill(40)("c")
      ++ (1 to 3000).map(i => s"tail$i"))
    val df = words.toDF("w").repartition(8)
    // n = 3150, capacity0 = 2 → n/cap = 1575 >> 60: certificate must fail
    // and force growth (2 → 16 → 128; 3150/128 = 24 < 40 certifies)
    val got = HeavyHitters.topkExactCertified(df, "w", k = 3, capacity0 = 2)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 60L), ("b", 50L), ("c", 40L)))
  }

  test("certified top-k stays exact on adversarially flat data (fallback path)") {
    // near-uniform data: every count is 2, so no k-th count can ever exceed
    // n/cap until cap ~ n/2 — with maxRounds=1 pinned at capacity0=2 the
    // certificate CANNOT hold, and the uncertified sketch rows must never
    // leak out. The fallback is the plain exact groupBy top-k, so the
    // result is still exact: top-3 by (count desc, word asc).
    val words = (1 to 500).flatMap(i => Seq(f"flat$i%04d", f"flat$i%04d"))
    val df = words.toDF("w").repartition(8)
    val got = HeavyHitters.topkExactCertified(df, "w", k = 3,
      capacity0 = 2, maxRounds = 1)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("flat0001", 2L), ("flat0002", 2L), ("flat0003", 2L)))
  }

  test("fallback engagement is observable, certification is signalled when it holds") {
    // flat data, maxRounds=1: the fallback MUST engage and say so
    val flat = (1 to 500).flatMap(i => Seq(f"flat$i%04d", f"flat$i%04d"))
      .toDF("w").repartition(8)
    val fb = HeavyHitters.topkExactCertifiedWithStats(flat, "w", k = 3,
      capacity0 = 2, maxRounds = 1)
    assert(fb.fellBack)
    assert(fb.certifiedRounds == 1)
    assert(fb.result.as[(String, Long)].collect().toSeq ==
      Seq(("flat0001", 2L), ("flat0002", 2L), ("flat0003", 2L)))
    // skewed data: certification holds, no fallback, capacity reported
    val skew = (Seq.fill(300)("a") ++ Seq.fill(200)("b") ++ Seq.fill(100)("c")
      ++ (1 to 400).map(i => s"tail$i")).toDF("w").repartition(8)
    val ok = HeavyHitters.topkExactCertifiedWithStats(skew, "w", k = 3, capacity0 = 16)
    assert(!ok.fellBack)
    assert(ok.certifiedRounds >= 1 && ok.finalCapacity >= 16)
    assert(ok.result.as[(String, Long)].collect().toSeq ==
      Seq(("a", 300L), ("b", 200L), ("c", 100L)))
  }
}
