package graft

import graft.queries.EvalQueries

/** sc1's tie-corrected Spearman: perfect monotone (any shape) scores ±1, a
  * hand-computed tied fixture reproduces the textbook average-rank value
  * (0.833333), and a zero-variance side yields NULL rather than a division
  * artifact.
  */
class SpearmanSpec extends SparkSpec {

  private def run(rows: Seq[(String, Long, Long)]): Map[String, Option[Double]] = {
    import spark.implicits._
    val df = rows.toDF("g", "x", "y")
    EvalQueries.spearmanByGroup(df, "g", "x", "y").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
  }

  test("monotone but non-linear relation scores exactly 1; inverse scores -1") {
    val out = run(
      Seq[(String, Long, Long)](
        ("up", 1L, 1L), ("up", 2L, 10L), ("up", 3L, 100L), ("up", 4L, 10000L),
        ("dn", 1L, 50L), ("dn", 2L, 7L), ("dn", 3L, 6L), ("dn", 4L, 1L)))
    assert(out("up").contains(1.0), s"monotone: ${out("up")}")
    assert(out("dn").contains(-1.0), s"inverse: ${out("dn")}")
  }

  test("average-rank tie correction reproduces the textbook value") {
    // x = [1, 2, 2, 3] -> avg ranks [1, 2.5, 2.5, 4]
    // y = [10, 20, 30, 30] -> avg ranks [1, 2, 3.5, 3.5]
    // Pearson on those ranks = 3.75 / 4.5 = 0.833333 (scipy.spearmanr agrees)
    val out = run(Seq[(String, Long, Long)](
      ("t", 1L, 10L), ("t", 2L, 20L), ("t", 2L, 30L), ("t", 3L, 30L)))
    assert(out("t").contains(0.833333), s"tied: ${out("t")}")
  }

  test("a constant side yields NULL, not NaN/Inf") {
    val out = run(Seq[(String, Long, Long)](
      ("c", 5L, 1L), ("c", 5L, 2L), ("c", 5L, 3L)))
    assert(out("c").isEmpty, s"constant x: ${out("c")}")
  }

  test("sc1 on testdata is deterministic across runs") {
    val sf = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("sc1_spearman")(spark, sf)
    val b = SparkEntry.queries("sc1_spearman")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
