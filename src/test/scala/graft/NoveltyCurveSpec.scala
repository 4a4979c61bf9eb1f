package graft

/** nv2's training-order novelty curve: conservation (every distinct shingle
  * is first-seen exactly once; every occurrence lands in exactly one
  * decile) and the shuffle signature (novelty decays front to back).
  */
class NoveltyCurveSpec extends SparkSpec {

  test("conservation and decay on testdata") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("nv2_novelty_curve")(spark, sf).collect()
    assert(rows.length == 10, s"expected 10 deciles, got ${rows.length}")

    val nNew = rows.map(_.getLong(1)).sum
    val nOcc = rows.map(_.getLong(2)).sum
    val sh = graft.queries.TextQueries.shinglesDf(spark, sf)
    assert(nNew == sh.select("m").distinct().count(),
      "sum of first-seen counts must equal the distinct shingle count")
    assert(nOcc == sh.count(),
      "sum of per-decile occurrences must equal total (doc, shingle) incidences")

    val ppm = rows.sortBy(_.getLong(0)).map(_.getLong(3))
    assert(ppm.head > ppm.last,
      s"a uniform shuffle's novelty must decay: first=${ppm.head} last=${ppm.last}")
    graft.queries.TextQueries.clearCaches()
  }

  test("nv2 on testdata is deterministic across runs") {
    val sf = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("nv2_novelty_curve")(spark, sf)
    val b = SparkEntry.queries("nv2_novelty_curve")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    graft.queries.TextQueries.clearCaches()
  }
}
