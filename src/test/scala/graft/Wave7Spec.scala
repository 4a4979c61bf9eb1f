package graft

import org.apache.spark.sql.functions._

/** Wave-7 fixtures: hand-computed PR points (prc1), an exact trimmed mean
  * with a planted outlier (tm1), a 2×2 kappa table plus both degeneracy
  * guards (ka1), a BigInt-Cramer replay of the ridge solve (rg1), a
  * two-class Naive Bayes corpus incl. the OOV-only tie-break (nb1), a
  * hand-scored modularity partition (gm1), and path/triangle/hub-cap
  * link-prediction graphs (lk1). Plus the bounded-window contracts on the
  * operators that window (prc1/tm1).
  */
class Wave7Spec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    CacheRegistry.trackPath(
      java.nio.file.Files.createTempDirectory(prefix).toString)

  private def writeDocs(dir: String,
      rows: Seq[(Long, String, String, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text", "n_chars")
      .withColumn("source", lit("s"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def writeEvents(dir: String, rows: Seq[(Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.map { case (id, ts, v) => (id, ts, id, "purchase", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** Minimal lineitem for the graph queries: only (orderkey, partkey,
    * suppkey, quantity) are read by gm1/lk1.
    */
  private def writeLineitem(dir: String,
      rows: Seq[(Long, Long, Long, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  private def writePart(dir: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
  }

  // ── prc1 ─────────────────────────────────────────────────────────────────

  test("prc1: hand-computed precision/recall points") {
    val dir = tmpDir("prc1a")
    // scores desc: 5 -> tp 1 fp 1; 3 -> tp 2 fp 1; 1 -> tp 2 fp 2
    writeDocs(dir, Seq(
      (1L, "en", "x", 5L), (2L, "en", "x", 3L),
      (3L, "de", "x", 5L), (4L, "de", "x", 1L)))
    val out = SparkEntry.queries("prc1_pr_curve")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (5L, 1L, 1L, 500000L, 500000L),
      (3L, 2L, 1L, 666666L, 1000000L),
      (1L, 2L, 2L, 500000L, 1000000L)), s"got ${out.toSeq}")
  }

  test("prc1: zero positives guards recall to NULL, precision stays exact") {
    val dir = tmpDir("prc1b")
    writeDocs(dir, Seq((1L, "de", "x", 5L), (2L, "fr", "x", 3L)))
    val out = SparkEntry.queries("prc1_pr_curve")(spark, dir).collect()
    assert(out.forall(r => r.getLong(1) == 0L && r.isNullAt(4)), s"got ${out.toSeq}")
    assert(out.forall(r => r.getLong(3) == 0L), s"precision of tp=0 is 0: ${out.toSeq}")
  }

  test("prc1: the only window runs over the distinct-score table (bounded)") {
    val df = SparkEntry.queries("prc1_pr_curve")(spark, "/root/testdata/sf0.001")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    assert(docs.select("n_chars").distinct().count() < docs.count(),
      "fixture degenerate: score domain not smaller than the corpus")
    // prc1 has no aggregate above its window (rows out = curve points), so
    // the bounded-window proof is the reverse of mwu1's: the Window must sit
    // ABOVE (earlier in the top-down plan text than) the distinct-score
    // Aggregate — the window input is the post-aggregate table, not the scan
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.contains("Window") && p.contains("Aggregate")
      && p.indexOf("Window") < p.indexOf("Aggregate"),
      s"window not fed by the distinct-score aggregate:\n$p")
  }

  // ── tm1 ──────────────────────────────────────────────────────────────────

  test("tm1: a planted outlier is trimmed away exactly") {
    val dir = tmpDir("tm1a")
    // en: 1..9 plus outlier 1000 -> n 10, k 1, kept 8; the trim drops the
    // 1 and the 1000, keeping 2..9 -> sum 44, mean_milli 5500
    val en = (1L to 9L).map(v => (v, "en", "x", v)) :+ (10L, "en", "x", 1000L)
    // de: 5 values, k = 0 -> nothing trimmed, mean_milli = 15/5 = 3000
    val de = (11L to 15L).map(i => (i, "de", "x", i - 10L))
    writeDocs(dir, en ++ de)
    val out = SparkEntry.queries("tm1_trimmed_mean")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("de", 5L, 0L, 5L, 15L, 3000L),
      ("en", 10L, 1L, 8L, 44L, 5500L)), s"got ${out.toSeq}")
  }

  test("tm1: duplicate values straddling the cut keep partial multiplicity") {
    val dir = tmpDir("tm1b")
    // ten 5s and ten 7s in one lang: n 20, k 2, kept 16; value 5 has
    // cum 10 -> kept copies min(10,18)-max(0,2) = 8; value 7 kept
    // min(20,18)-max(10,2) = 8 -> sum 8*5+8*7 = 96, mean_milli 6000
    writeDocs(dir, (1L to 10L).map(i => (i, "en", "x", 5L))
      ++ (11L to 20L).map(i => (i, "en", "x", 7L)))
    val r = SparkEntry.queries("tm1_trimmed_mean")(spark, dir).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      == (20L, 2L, 16L, 96L, 6000L), s"got $r")
  }

  test("tm1: windows run over the distinct (lang, score) table (bounded)") {
    val df = SparkEntry.queries("tm1_trimmed_mean")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.indexOf("Window") > p.indexOf("Aggregate"),
      s"window not above the distinct-score aggregate:\n$p")
  }

  // ── ka1 ──────────────────────────────────────────────────────────────────

  test("ka1: hand-computed 2x2 kappa") {
    val dir = tmpDir("ka1a")
    // A = n_chars >= 500, B = >= 80 ws tokens. text80 trips B only.
    val text80 = Seq.fill(80)("w").mkString(" ")
    val docs =
      Seq((1L, "en", text80, 600L), (2L, "en", text80, 600L)) ++ // n11 = 2
        Seq((3L, "en", "a b", 600L)) ++                          // n10 = 1
        Seq((4L, "en", text80, 100L)) ++                         // n01 = 1
        (5L to 8L).map(i => (i, "en", "a b", 100L))              // n00 = 4
    writeDocs(dir, docs)
    val r = SparkEntry.queries("ka1_cohens_kappa")(spark, dir).collect()(0)
    // n 8; po-term n*(n11+n00) = 48; pe-term a1*b1 + a0*b0 = 3*3 + 5*5 = 34
    // kappa = (48-34)/(64-34) -> 14e6 // 30 = 466666
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == (8L, 2L, 1L, 1L, 4L), s"got $r")
    assert(r.getLong(5) == 466666L, s"got $r")
  }

  test("ka1: one constant rater with a mixed partner gives exactly 0") {
    val dir = tmpDir("ka1b")
    val text80 = Seq.fill(80)("w").mkString(" ")
    // A constant-no; B half yes -> chance-level agreement, kappa = 0
    writeDocs(dir, Seq(
      (1L, "en", text80, 100L), (2L, "en", "a b", 100L)))
    val r = SparkEntry.queries("ka1_cohens_kappa")(spark, dir).collect()(0)
    assert(r.getLong(5) == 0L, s"got $r")
  }

  test("ka1: both raters constant (pe = 1) guards kappa to NULL") {
    val dir = tmpDir("ka1c")
    writeDocs(dir, Seq((1L, "en", "a b", 100L), (2L, "en", "a b", 100L)))
    val r = SparkEntry.queries("ka1_cohens_kappa")(spark, dir).collect()(0)
    assert(r.isNullAt(5), s"got $r")
  }

  // ── rg1 ──────────────────────────────────────────────────────────────────

  /** The query's exact integer solve, replayed on BigInt: same sufficient
    * statistics, same ridge diagonal, same sign·(abs div d) emission.
    */
  private def ridgeExpected(days: Seq[(Long, Long, Long)]): (Long, Long, Long) = {
    val n = BigInt(days.size)
    val st = days.map(d => BigInt(d._1)).sum
    val stt = days.map(d => BigInt(d._1) * d._1).sum
    val sw = days.map(d => BigInt(d._2)).sum
    val stw = days.map(d => BigInt(d._1) * d._2).sum
    val sy = days.map(d => BigInt(d._3)).sum
    val sty = days.map(d => BigInt(d._1) * d._3).sum
    val swy = days.map(d => BigInt(d._2) * d._3).sum
    val a22 = stt + 1; val a33 = sw + 1
    val det = n * (a22 * a33 - stw * stw) - st * (st * a33 - stw * sw) +
      sw * (st * stw - a22 * sw)
    val d0 = sy * (a22 * a33 - stw * stw) - st * (sty * a33 - stw * swy) +
      sw * (sty * stw - a22 * swy)
    val d1 = n * (sty * a33 - swy * stw) - sy * (st * a33 - stw * sw) +
      sw * (st * swy - sty * sw)
    val d2 = n * (a22 * swy - stw * sty) - st * (st * swy - sw * sty) +
      sy * (st * stw - a22 * sw)
    def emit(num: BigInt): Long =
      (num.signum * det.signum * ((num.abs * 1000) / det.abs)).toLong
    (emit(d0), emit(d1), emit(d2))
  }

  test("rg1: a planted trend + weekend uplift is recovered (BigInt Cramer replay)") {
    val dir = tmpDir("rg1a")
    // 2020-01-06 is a Monday. y = 10000 + 500*t + 2000*w cents, exact.
    val days = (0 to 13).map { t =>
      val w = if (t % 7 >= 5) 1L else 0L
      (t.toLong, w, 10000L + 500L * t + 2000L * w)
    }
    writeEvents(dir, days.zipWithIndex.map { case ((t, _, y), i) =>
      val date = java.time.LocalDate.of(2020, 1, 6).plusDays(t)
      (i.toLong + 1, s"$date 12:00:00", y / 100.0)
    })
    val r = SparkEntry.queries("rg1_ridge_regression")(spark, dir).collect()(0)
    val (b0, b1, b2) = ridgeExpected(days)
    assert(r.getLong(0) == 14L && r.getLong(1) == 1L, s"got $r")
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == (b0, b1, b2), s"got $r vs ($b0,$b1,$b2)")
    // ridge shrinks toward — but lands NEAR — the planted coefficients
    assert(math.abs(r.getLong(2) - 10000L * 1000) < 2000L * 1000, s"b0: $r")
    assert(math.abs(r.getLong(3) - 500L * 1000) < 200L * 1000, s"b1: $r")
    assert(math.abs(r.getLong(4) - 2000L * 1000) < 2000L * 1000, s"b2: $r")
  }

  test("rg1: a single day solves (lambda makes A' nonsingular) and is exact") {
    val dir = tmpDir("rg1b")
    writeEvents(dir, Seq((1L, "2020-01-06 12:00:00", 123.0)))
    val r = SparkEntry.queries("rg1_ridge_regression")(spark, dir).collect()(0)
    val (b0, b1, b2) = ridgeExpected(Seq((0L, 0L, 12300L)))
    assert(r.getLong(0) == 1L &&
      (r.getLong(2), r.getLong(3), r.getLong(4)) == (b0, b1, b2), s"got $r")
  }

  test("rg1: weekend flag matches ISO day-of-week on both engines' formula") {
    val dir = tmpDir("rg1c")
    // Sat 2020-01-11 and Sun 2020-01-12 are weekend; Mon 2020-01-13 is not.
    // Planted: weekend days pay +5000 over an otherwise flat 10000.
    writeEvents(dir, Seq(
      (1L, "2020-01-10 12:00:00", 100.0),  // Fri  t=0 w=0
      (2L, "2020-01-11 12:00:00", 150.0),  // Sat  t=1 w=1
      (3L, "2020-01-12 12:00:00", 150.0),  // Sun  t=2 w=1
      (4L, "2020-01-13 12:00:00", 100.0))) // Mon  t=3 w=0
    val r = SparkEntry.queries("rg1_ridge_regression")(spark, dir).collect()(0)
    val (b0, b1, b2) = ridgeExpected(Seq(
      (0L, 0L, 10000L), (1L, 1L, 15000L), (2L, 1L, 15000L), (3L, 0L, 10000L)))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == (b0, b1, b2), s"got $r")
    // with only 2 weekend of 4 days, ridge splits the 5000c uplift with the
    // intercept — half (2500c) lands on w; the sign and scale are what matter
    assert(r.getLong(4) >= 2000L * 1000, s"weekend uplift not attributed to w: $r")
  }

  // ── nb1 ──────────────────────────────────────────────────────────────────

  test("nb1: a separable two-class corpus classifies both held-out docs") {
    val dir = tmpDir("nb1a")
    writeDocs(dir, Seq(
      (1L, "en", "cat dog", 7L), (2L, "en", "cat cat", 7L),
      (3L, "de", "hund katze", 10L), (4L, "de", "hund hund", 9L),
      (10L, "en", "cat dog dog", 11L),  // held out (doc_id % 10 = 0)
      (20L, "de", "hund oov", 8L)))     // OOV token dropped, hund decides
    val out = SparkEntry.queries("nb1_naive_bayes")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(("de", "de", 1L), ("en", "en", 1L)), s"got $out")
  }

  test("nb1: an OOV-only test doc falls to the prior and ties break to the smallest lang") {
    val dir = tmpDir("nb1b")
    // equal priors (2 train docs each), test doc has no in-vocab tokens ->
    // score(en) = score(de) = prior -> deterministic tie-break: 'de'
    writeDocs(dir, Seq(
      (1L, "en", "cat dog", 7L), (2L, "en", "cat cat", 7L),
      (3L, "de", "hund katze", 10L), (4L, "de", "hund hund", 9L),
      (30L, "en", "zzz qqq", 7L)))
    val out = SparkEntry.queries("nb1_naive_bayes")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(("en", "de", 1L)), s"got $out")
  }

  test("nb1: unbalanced priors decide when likelihoods cancel") {
    val dir = tmpDir("nb1c")
    // both classes train the SAME token table {tok}, so likelihood terms
    // cancel exactly; en has 3 train docs vs de's 1 -> prior picks en
    writeDocs(dir, Seq(
      (1L, "en", "tok", 3L), (2L, "en", "tok", 3L), (3L, "en", "tok", 3L),
      (4L, "de", "tok", 3L),
      (40L, "de", "tok", 3L)))
    val out = SparkEntry.queries("nb1_naive_bayes")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(("de", "en", 1L)), s"got $out")
  }

  // ── gm1 ──────────────────────────────────────────────────────────────────

  test("gm1: hand-scored two-community partition") {
    val dir = tmpDir("gm1a")
    // edges (via co-purchase orders): 1-2 intra B1, 3-4 intra B2, 2-3 inter
    // m 3; d_B1 = 1+2 = 3, d_B2 = 2+1 = 3; e_B1 = e_B2 = 1
    // num = (4*3*1 - 9) + (4*3*1 - 9) = 6; q_ppm = 6e6 // 36 = 166666
    writeLineitem(dir, Seq(
      (1L, 1L, 1L, 1.0), (1L, 2L, 1L, 1.0),
      (2L, 3L, 1L, 1.0), (2L, 4L, 1L, 1.0),
      (3L, 2L, 1L, 1.0), (3L, 3L, 1L, 1.0)))
    writePart(dir, Seq((1L, "B1"), (2L, "B1"), (3L, "B2"), (4L, "B2")))
    val r = SparkEntry.queries("gm1_modularity")(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == (4L, 3L, 2L, 166666L), s"got $r")
  }

  test("gm1: a single community scores negative (all degree, no contrast)") {
    val dir = tmpDir("gm1b")
    // one community holding everything: q = e/m - (d/2m)^2 = 1 - 1 = 0
    // ... minus nothing else; with a dangling inter-community-free pair
    // split into two brands it goes negative. Here: one brand, q = 0.
    writeLineitem(dir, Seq((1L, 1L, 1L, 1.0), (1L, 2L, 1L, 1.0)))
    writePart(dir, Seq((1L, "B1"), (2L, "B1")))
    val r = SparkEntry.queries("gm1_modularity")(spark, dir).collect()(0)
    // m 1, d_B1 4? no: deg(1)=deg(2)=1, d=2, e=1 -> num = 4*1*1 - 4 = 0
    assert(r.getLong(3) == 0L, s"got $r")
    // two brands, one cross edge: e_c = 0 each, d_c = 1 each ->
    // num = -1 -1 = -2, q_ppm = -(2e6 // 4) = -500000
    val dir2 = tmpDir("gm1c")
    writeLineitem(dir2, Seq((1L, 1L, 1L, 1.0), (1L, 2L, 1L, 1.0)))
    writePart(dir2, Seq((1L, "B1"), (2L, "B2")))
    val r2 = SparkEntry.queries("gm1_modularity")(spark, dir2).collect()(0)
    assert(r2.getLong(3) == -500000L, s"got $r2")
  }

  // ── lk1 ──────────────────────────────────────────────────────────────────

  test("lk1: a path predicts its closure with the exact 1/ln(2) score") {
    val dir = tmpDir("lk1a")
    // suppliers 1-2 (order 1), 2-3 (order 2), qty >= 48: candidate (1,3)
    // via mid 2 (deg 2): aa = 1e12 div lnMicro(2) = 1e12 / 693147
    writeLineitem(dir, Seq(
      (1L, 1L, 1L, 48.0), (1L, 1L, 2L, 48.0),
      (2L, 1L, 2L, 48.0), (2L, 1L, 3L, 48.0)))
    val out = SparkEntry.queries("lk1_adamic_adar")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val aa = 1000000000000L / 693147L
    assert(out == Seq((1L, 3L, 1L, aa)), s"got $out vs aa=$aa")
  }

  test("lk1: an existing edge is never predicted") {
    val dir = tmpDir("lk1b")
    // triangle 1-2-3: (1,3) has a common neighbor but IS an edge -> empty
    writeLineitem(dir, Seq(
      (1L, 1L, 1L, 48.0), (1L, 1L, 2L, 48.0),
      (2L, 1L, 2L, 48.0), (2L, 1L, 3L, 48.0),
      (3L, 1L, 1L, 48.0), (3L, 1L, 3L, 48.0)))
    assert(SparkEntry.queries("lk1_adamic_adar")(spark, dir).count() == 0L)
  }

  test("lk1: a mid over the degree cap contributes no wedge") {
    val dir = tmpDir("lk1c")
    // hub 100 linked to 10..60 (deg 51 > 50) plus a DISJOINT path 1-200-2
    // (mid deg 2): only the path mid scores; the hub's (i,j) wedges all
    // drop, and its degree-1 spokes cannot be mids themselves
    val hub = (10L to 60L).map(i => (i, 1L, 100L, 48.0) :: (i, 1L, i, 48.0) :: Nil).flatten
    val path = Seq((70L, 1L, 1L, 48.0), (70L, 1L, 200L, 48.0),
      (71L, 1L, 200L, 48.0), (71L, 1L, 2L, 48.0))
    writeLineitem(dir, hub ++ path)
    val out = SparkEntry.queries("lk1_adamic_adar")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L, 1L)), s"got $out")
  }
}
