package graft

import org.apache.spark.sql.functions._

/** Wave-12 fixtures: a hand-built triangle+pendant graph for gr4's local
  * clustering coefficients, a literal sequential G² replay for llr1, a
  * perfectly-correlated (and a degenerate) CUPED fixture for cuped1, a
  * hand-mapped two-source quantile normalization for qn1, and two planted
  * perceptual-dup components for mm5.
  */
class Wave12Spec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    CacheRegistry.trackPath(
      java.nio.file.Files.createTempDirectory(prefix).toString)

  private def writeLineitem(dir: String,
      rows: Seq[(Long, Long, Double)]): Unit = {
    import spark.implicits._
    rows.map { case (o, s, q) => (o, s, s, q) }
      .toDF("l_orderkey", "l_suppkey", "l_partkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  private def writeDocs(dir: String,
      rows: Seq[(Long, String, String)]): Unit = { // (doc_id, source, text)
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def writeEvents(dir: String,
      rows: Seq[(Long, Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.map { case (id, uid, ts, v) => (id, ts, uid, "purchase", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  // ── gr4 ──────────────────────────────────────────────────────────────────

  test("gr4: triangle nodes score 1e6; the triangle vertex with a pendant " +
      "scores 333333; pendants are excluded") {
    val dir = tmpDir("gr4a")
    // order 1 links suppliers {1,2,3} (a triangle); order 2 links {3,4}
    // (a pendant edge). deg: 1→2, 2→2, 3→3, 4→1. tri(1)=tri(2)=tri(3)=1.
    // coeff_ppm: 1,2 → 2e6·1/(2·1)=1,000,000; 3 → 2e6·1/(3·2)=333,333;
    // 4 has deg 1 → not a row.
    writeLineitem(dir, Seq(
      (1L, 1L, 40.0), (1L, 2L, 40.0), (1L, 3L, 40.0),
      (2L, 3L, 40.0), (2L, 4L, 40.0)))
    val out = SparkEntry.queries("gr4_clustering_coeff")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, 1000000L), (2L, 2L, 1L, 1000000L),
      (3L, 3L, 1L, 333333L)), s"got ${out.toSeq}")
  }

  test("gr4: the sub-cut quantity rows are invisible") {
    val dir = tmpDir("gr4b")
    // same triangle but one edge's rows fall below the l_quantity >= 40
    // cut: suppliers 1-2 only co-occur on order 3 at quantity 10
    writeLineitem(dir, Seq(
      (1L, 1L, 40.0), (1L, 3L, 40.0),
      (2L, 2L, 40.0), (2L, 3L, 40.0),
      (3L, 1L, 10.0), (3L, 2L, 10.0)))
    val out = SparkEntry.queries("gr4_clustering_coeff")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    // path 1-3-2: no triangles anywhere; node 3 deg 2 coeff 0
    assert(out.forall(_._2 == 0L), s"got ${out.toSeq}")
  }

  test("gr4: the multiply-consumed edge/orientation subtrees plan as " +
      "ReusedExchange, not recomputes") {
    // e feeds deg + the orientation join + the final coefficient join and
    // dir feeds three wedge-join sides — none are persisted because
    // Catalyst dedups the identical exchanges (a round-13 sf10 A/B
    // measured explicit persists 20% SLOWER than the reused exchanges).
    // This pins the dedup so a refactor that breaks subtree identity
    // (e.g. a non-deterministic expression creeping into the build)
    // surfaces as a failed plan assertion, not a silent 5x recompute.
    val df = SparkEntry.queries("gr4_clustering_coeff")(
      spark, "/root/testdata/sf0.001")
    df.collect() // AQE inserts the reuse nodes at stage materialization
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"no ReusedExchange in gr4's final plan:\n${plan.take(2000)}")
  }

  // ── llr1 ─────────────────────────────────────────────────────────────────

  test("llr1: equals a literal sequential G² replay and ranks the " +
      "source-exclusive token first") {
    val dir = tmpDir("llr1a")
    writeDocs(dir, Seq(
      (1L, "A", "alpha alpha alpha shared shared"),
      (2L, "A", "alpha shared"),
      (3L, "B", "beta beta shared shared"),
      (4L, "B", "beta shared gamma")))
    val out = SparkEntry.queries("llr1_keywords")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // literal replay: token counts per source from the raw fixture
    val counts = Map(
      ("A", "alpha") -> 4L, ("A", "shared") -> 3L,
      ("B", "beta") -> 3L, ("B", "shared") -> 3L, ("B", "gamma") -> 1L)
    val rTot = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cTot = counts.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = counts.values.sum
    def lnMicro(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    def term(k: Long, r: Long, c: Long): Long =
      if (k > 0) k * (lnMicro(k) + lnMicro(n) - lnMicro(r) - lnMicro(c)) else 0L
    def g2(s: String, t: String): Long = {
      val k11 = counts.getOrElse((s, t), 0L)
      val r = rTot(s); val c = cTot(t)
      2 * (term(k11, r, c) + term(c - k11, n - r, c)
        + term(r - k11, r, n - c) + term(n - r - c + k11, n - r, n - c))
    }
    out.foreach { case (s, t, k, g) =>
      assert(g == g2(s, t), s"($s,$t): got $g, replay says ${g2(s, t)}")
      assert(k == counts((s, t)))
    }
    // the source-exclusive frequent token is each source's top keyword
    val top = out.groupBy(_._1).view.mapValues(_.maxBy(_._4)._2).toMap
    assert(top("A") == "alpha" && top("B") == "beta", s"got $top")
    // 'shared' sits exactly at its pooled rate in B (3/7 = 6/14, so
    // k11·N = R·C — not strictly positive) — it must not appear as a
    // B keyword
    assert(!out.exists(r => r._1 == "B" && r._2 == "shared"),
      "under-represented token leaked through the positive-association cut")
  }

  // ── cuped1 ───────────────────────────────────────────────────────────────

  test("cuped1: perfectly-correlated pre/post gives theta 2.0 and " +
      "variance reduction 1e6 ppm") {
    val dir = tmpDir("cuped1a")
    // pre on Jan 1, post on Jan 4 (midpoint split lands Jan 3-4 post);
    // post = 2·pre exactly -> theta = 2, rho^2 = 1
    writeEvents(dir, Seq(
      (1L, 1L, "2024-01-01 09:00:00", 1.00), (2L, 1L, "2024-01-04 09:00:00", 2.00),
      (3L, 2L, "2024-01-01 09:00:00", 2.00), (4L, 2L, "2024-01-04 09:00:00", 4.00),
      (5L, 3L, "2024-01-01 09:00:00", 3.00), (6L, 3L, "2024-01-04 09:00:00", 6.00)))
    val r = SparkEntry.queries("cuped1_variance_reduction")(spark, dir).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 600L && r.getLong(2) == 1200L)
    assert(r.getDouble(3) == 2.0, s"theta ${r.getDouble(3)}")
    assert(r.getLong(4) == 1000000L, s"ppm ${r.getLong(4)}")
  }

  test("cuped1: zero pre-period variance guards theta and ppm to NULL") {
    val dir = tmpDir("cuped1b")
    // identical pre for every user -> var(pre) = 0
    writeEvents(dir, Seq(
      (1L, 1L, "2024-01-01 09:00:00", 1.00), (2L, 1L, "2024-01-04 09:00:00", 2.00),
      (3L, 2L, "2024-01-01 09:00:00", 1.00), (4L, 2L, "2024-01-04 09:00:00", 9.00)))
    val r = SparkEntry.queries("cuped1_variance_reduction")(spark, dir).collect()(0)
    assert(r.isNullAt(3) && r.isNullAt(4), s"got $r")
  }

  // ── qn1 ──────────────────────────────────────────────────────────────────

  test("qn1: hand-mapped two-source normalization onto the pooled " +
      "midpoint quantiles") {
    val dir = tmpDir("qn1a")
    // n_chars: A -> [10, 20], B -> [10, 30, 50]; pooled sorted
    // [10, 10, 20, 30, 50] (ties by doc_id). Expected pooled ranks:
    // A r=1: (1·5)//4+1 = 2 -> 10;  A r=2: (3·5)//4+1 = 4 -> 30
    // B r=1: (1·5)//6+1 = 1 -> 10;  B r=2: (3·5)//6+1 = 3 -> 20
    // B r=3: (5·5)//6+1 = 5 -> 50
    def s(n: Int) = "x" * n
    writeDocs(dir, Seq(
      (1L, "A", s(10)), (2L, "A", s(20)),
      (3L, "B", s(10)), (4L, "B", s(30)), (5L, "B", s(50))))
    val out = SparkEntry.queries("qn1_quantile_normalize")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(out == Map(1L -> 10L, 2L -> 30L, 3L -> 10L, 4L -> 20L, 5L -> 50L),
      s"got $out")
  }

  test("qn1: a single source is a fixpoint (normalization maps every " +
      "value to itself)") {
    val dir = tmpDir("qn1b")
    def s(n: Int) = "x" * n
    writeDocs(dir, (1 to 7).map(i => (i.toLong, "only", s(i * 3))))
    val out = SparkEntry.queries("qn1_quantile_normalize")(spark, dir).collect()
    out.foreach(r => assert(r.getLong(2) == r.getLong(3),
      s"doc ${r.getLong(0)}: ${r.getLong(2)} -> ${r.getLong(3)}"))
  }

  // ── mm5 ──────────────────────────────────────────────────────────────────

  test("mm5: two planted perceptual-dup components get min-id keepers; " +
      "the singleton is absent") {
    val dir = tmpDir("mm5a")
    val p1 = ("the quick brown fox jumps over the lazy dog. " * 60).trim
    val p2 = ("pack my box with five dozen liquor jugs today! " * 60).trim
    val solo = ("sphinx of black quartz judge my vow forever more " * 60).trim
    writeDocs(dir, Seq(
      (1L, "s", p1), (2L, "s", p1), (3L, "s", p1),
      (4L, "s", p2), (5L, "s", p2),
      (6L, "s", solo)))
    val out = SparkEntry.queries("mm5_phash_clusters")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L),
      s"got $out")
  }
}
