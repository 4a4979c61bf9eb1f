package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The Bloom-filter operator behind bf1_bloom_semijoin: the no-false-
  * negatives guarantee, a bounded false-positive rate, determinism, and
  * the 1-row broadcastable shape.
  */
class BloomFilterSpec extends SparkSpec {

  private def df(keys: Seq[Long]) = {
    import spark.implicits._
    keys.toDF("k")
  }

  test("no false negatives: every built key passes the probe") {
    val keys = (0L until 500L).map(_ * 7919 + 13)
    val bits = BloomFilter.build(df(keys), "k")
    val misses = df(keys).crossJoin(broadcast(bits))
      .filter(!BloomFilter.mightContain(col("bloom_bits"), col("k")))
      .count()
    assert(misses == 0)
  }

  test("false-positive rate on disjoint probes is near (1-e^(-kn/m))^k") {
    val built = (0L until 300L)
    val probes = (100000L until 110000L) // disjoint from built
    val bits = BloomFilter.build(df(built), "k")
    val fp = df(probes).crossJoin(broadcast(bits))
      .filter(BloomFilter.mightContain(col("bloom_bits"), col("k")))
      .count()
    // m=2048, k=3, n=300 → p ≈ (1-e^(-0.439))^3 ≈ 0.045; allow 3× slack
    assert(fp.toDouble / probes.size < 0.15, s"fp rate ${fp / 10000.0}")
  }

  test("build is deterministic and partitioning-invariant") {
    val keys = (0L until 1000L).map(_ * 31 + 7)
    val a = BloomFilter.build(df(keys), "k").head().getSeq[Int](0)
    val b = BloomFilter.build(df(keys).repartition(13), "k").head().getSeq[Int](0)
    assert(a == b)
    assert(a == a.sorted, "positions not sorted")
  }

  test("filter state is one row, bounded by the bit-space size") {
    val bits = BloomFilter.build(df(0L until 100000L), "k", bits = 512)
    val rows = bits.collect()
    assert(rows.length == 1)
    assert(rows(0).getSeq[Int](0).size <= 512)
  }
}
