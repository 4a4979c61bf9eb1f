package graft

/** ng1's pairing contract: every vector is an anchor exactly once, no pair
  * is a self-pair (the offset range [1, n-1] excludes 0 by construction),
  * and the pairing replays identically across runs.
  */
class NegativeSamplingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every vector anchors exactly once and never pairs with itself") {
    val rows = SparkEntry.queries("ng1_negative_sampling")(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.length == n, s"expected $n pairs, got ${rows.length}")
    assert(rows.map(_.getLong(0)).distinct.length == n, "anchors must be unique")
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)),
      "a negative must never equal its anchor")
  }

  test("ng1 on testdata is deterministic across runs") {
    val a = SparkEntry.queries("ng1_negative_sampling")(spark, sf)
    val b = SparkEntry.queries("ng1_negative_sampling")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
