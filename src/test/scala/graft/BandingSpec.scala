package graft

import org.apache.spark.sql.functions._
import graft.dedup.Banding
import graft.queries.TextQueries

/** The 64-bit banded Hamming device behind dd4/mm4: banded join ≡ the
  * literal quadratic filter (pigeonhole over 4×16-bit bands), and the
  * first-shared-band predicate emits each qualifying pair exactly ONCE —
  * no distinct-shuffle — even when pairs share all four bands.
  */
class BandingSpec extends SparkSpec {

  private def sigDf(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "sig")
  }

  private def quadratic(sig: org.apache.spark.sql.DataFrame) =
    sig.as("p").join(sig.as("q"), col("p.doc_id") < col("q.doc_id"))
      .select(col("p.doc_id").as("a"), col("q.doc_id").as("b"),
        bit_count(col("p.sig").bitwiseXOR(col("q.sig"))).as("hamming"))
      .filter(col("hamming") <= 3)

  test("banded pairs equal the quadratic filter on adversarial 64-bit sigs") {
    // crafted around the band boundaries: bit 63 (sign bit), bits that
    // straddle bands, hd exactly 3 vs exactly 4, and full-agreement pairs
    val sigs = sigDf(Seq(
      1L -> 0L,
      2L -> 0L,                       // identical: hd 0, shares all 4 bands
      3L -> 7L,                       // hd 3 vs doc 1 (band 0 differs only)
      4L -> (1L | (1L << 16) | (1L << 32)), // hd 3, three bands touched
      5L -> (1L | (1L << 16) | (1L << 32) | (1L << 48)), // hd 4 vs doc 1: must NOT pair
      6L -> Long.MinValue,            // sign bit only: hd 1 vs doc 1
      7L -> (Long.MinValue | (1L << 62) | (1L << 61)), // hd 3 vs doc 1, all in band 3
      8L -> -1L))                     // far from everything
    val banded = Banding.hammingPairs64(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val quad = quadratic(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(banded.toSet == quad.toSet,
      s"banded ${banded.toSet} vs quadratic ${quad.toSet}")
    assert(banded.length == banded.toSet.size,
      s"first-shared-band emitted a duplicate: ${banded.toList.sorted}")
    // spot expectations computed by hand
    val m = banded.map(t => (t._1, t._2) -> t._3).toMap
    assert(m((1L, 2L)) == 0 && m((1L, 3L)) == 3 && m((1L, 6L)) == 1)
    assert(!m.contains((1L, 5L)), "hd-4 pair leaked through banding")
  }

  test("dd4: banded join equals the quadratic Hamming filter on testdata") {
    val sig = TextQueries.simhashSignatures(spark, "/root/testdata/sf0.001")
    val banded = SparkEntry.queries("dd4_simhash")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val quad = quadratic(sig).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(banded.toSet == quad.toSet,
      s"banded ${banded.length} vs quadratic ${quad.length}")
    assert(banded.length == banded.toSet.size, "duplicate pair emitted")
  }

  test("simhash signatures use the full 64-bit domain") {
    // every one of the 4 bands must vary across the corpus — the regression
    // this guards: a 32-bit signature whose top half is constant zero would
    // collapse band domains (the r12 `weak` grade)
    val sig = TextQueries.simhashSignatures(spark, "/root/testdata/sf0.001")
    val bands = Banding.bands64(sig)
      .groupBy("bi").agg(countDistinct(col("bv")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until 4).foreach { b =>
      assert(bands(b) > 1, s"band $b is degenerate: ${bands(b)} distinct value(s)")
    }
  }
}
