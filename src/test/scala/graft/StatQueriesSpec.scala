package graft

import org.apache.spark.sql.functions._

/** Behavioral invariants of graft.queries.StatQueries — the six
  * distribution-testing / corpus-statistics operators (ks1, mi1, gt1,
  * zipf1, sur1, tq8). The DuckDB oracle gates cross-engine equality on the
  * driver corpus; these pin the SEMANTICS on fixtures where the right
  * answer is computable by hand, plus the two plan contracts the family's
  * 100 TB claims rest on: sur1's single-orders-scan (the horizon is derived
  * from the checkpointed distinct table) and the bounded-window inputs of
  * ks1 (distinct-score table) and zipf1 (LIMIT-512 table).
  */
class StatQueriesSpec extends SparkSpec {

  private def q(name: String) =
    graft.queries.StatQueries.all.find(_.name == name).get

  private def tmpDir(prefix: String): String =
    CacheRegistry.trackPath(
      java.nio.file.Files.createTempDirectory(prefix).toString)

  private def writeDocs(dir: String, rows: Seq[(Long, String, String, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def writeOrders(dir: String, rows: Seq[(Long, Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("o_orderkey", "o_custkey", "o_orderdate")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_totalprice", lit(1.0))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
  }

  // ── ks1 ──────────────────────────────────────────────────────────────────

  test("ks1: hand-computed two-sample D — en {1,2} vs fr {2,3} gives D = 1/2") {
    val dir = tmpDir("ks1a")
    // ECDF table (score, cum_a, cum_b), n_a = n_b = 2:
    //   1: (1,0) -> |1*2-0*2| = 2 ; 2: (2,1) -> |4-2| = 2 ; 3: (2,2) -> 0
    // d_scaled = 2, d_ppm = 2e6 div 4 = 500000.
    writeDocs(dir, Seq(
      (1L, "a", "en", "s"), (2L, "aa", "en", "s"),
      (3L, "bb", "fr", "s"), (4L, "bbb", "fr", "s")))
    val r = q("ks1_ks_test").run(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (2L, 2L, 2L, 500000L))
  }

  test("ks1: identical distributions give D = 0") {
    val dir = tmpDir("ks1b")
    writeDocs(dir, Seq(
      (1L, "a", "en", "s"), (2L, "aa", "en", "s"),
      (3L, "b", "fr", "s"), (4L, "bb", "fr", "s")))
    val r = q("ks1_ks_test").run(spark, dir).collect()(0)
    assert((r.getLong(2), r.getLong(3)) == (0L, 0L))
  }

  test("ks1: the ECDF window input is the DISTINCT-score table, not the corpus") {
    // the bounded-window contract — the unpartitioned window is safe only
    // because its input has one row per distinct n_chars value; this fails
    // if the window ever moves upstream of the score-grain aggregation
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf).count()
    val scores = Tables.documents(spark, sf).select("n_chars").distinct().count()
    // the bound is the DOMAIN (max doc length), not the corpus: 311 distinct
    // lengths at 500 docs here, still <= 8192 at 2e9 docs
    assert(scores <= 8192, s"score domain unbounded: $scores distinct lengths")
    assert(scores < docs, s"window input ($scores) not below corpus ($docs)")
    // and the plan reflects it: the window's child contains the HashAggregate
    val p = q("ks1_ks_test").run(spark, sf).queryExecution.executedPlan.toString
    val winAt = p.indexOf("Window")
    assert(winAt >= 0 && p.indexOf("HashAggregate", winAt) >= 0,
      s"score-grain aggregate not upstream of the ECDF window:\n$p")
  }

  // ── mi1 ──────────────────────────────────────────────────────────────────

  test("mi1: perfectly dependent 2x2 has MI = H = ln 2; independent has MI = 0") {
    val dep = tmpDir("mi1a")
    writeDocs(dep, (1L to 10L).map(i => (i, "x", "en", "s1")) ++
      (11L to 20L).map(i => (i, "x", "de", "s2")))
    val r = q("mi1_feature_mi").run(spark, dep).collect()(0)
    // ln2*1e6 = 693147 via the integer formula's exact micro-ln arithmetic
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (20L, 2L, 693147L, 693147L, 693147L))

    val ind = tmpDir("mi1b")
    writeDocs(ind,
      (1L to 5L).map(i => (i, "x", "en", "s1")) ++
      (6L to 10L).map(i => (i, "x", "en", "s2")) ++
      (11L to 15L).map(i => (i, "x", "de", "s1")) ++
      (16L to 20L).map(i => (i, "x", "de", "s2")))
    val r2 = q("mi1_feature_mi").run(spark, ind).collect()(0)
    assert(r2.getLong(2) == 0L, s"independent MI should be 0, got ${r2.getLong(2)}")
    assert(r2.getLong(3) == 693147L && r2.getLong(4) == 693147L)
  }

  test("mi1: spark result replays the integer formula (BigInt reference fold)") {
    val sf = "/root/testdata/sf0.001"
    val cells = Tables.documents(spark, sf)
      .groupBy("lang", "source").agg(count(lit(1)).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    def lnMicro(c: Long): Long = math.round(math.log(c.toDouble) * 1e6)
    val n = cells.map(_._3).sum
    val cx = cells.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val cy = cells.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    val nmiSum = cells.map { case (l, s, c) =>
      BigInt(c) * (lnMicro(c) + lnMicro(n) - lnMicro(cx(l)) - lnMicro(cy(s)))
    }.sum
    val expectMi = (nmiSum.sign * (nmiSum.abs / n)).toLong
    val r = q("mi1_feature_mi").run(spark, sf).collect()(0)
    assert(r.getLong(2) == expectMi, s"mi_micro ${r.getLong(2)} != fold $expectMi")
  }

  // ── gt1 ──────────────────────────────────────────────────────────────────

  test("gt1: Good 1953 toy — counts {a:3,b:2,c:1,d:1,e:1}") {
    val dir = tmpDir("gt1")
    writeDocs(dir, Seq((1L, "a a a b b c d e", "en", "s")))
    // N = 8 tokens, N1 = 3 -> unseen = 375000 ppm; r* in micro:
    //   r=1: 2*N2/N1 = 2e6 div 3 = 666666 ; r=2: 3*N3/N2 = 3000000 ; r=3: 0
    val rows = q("gt1_good_turing").run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows == Map(
      1L -> (3L, 1L, 666666L, 8L, 375000L),
      2L -> (1L, 1L, 3000000L, 8L, 375000L),
      3L -> (1L, 0L, 0L, 8L, 375000L)))
  }

  // ── zipf1 ────────────────────────────────────────────────────────────────

  test("zipf1: a planted 1/r power law fits slope ~ -1; a flat corpus fits 0") {
    val planted = tmpDir("zipf1a")
    // counts 840/r for r = 1..8 — exact integers, all distinct
    val text = (1 to 8).flatMap(r => Seq.fill(840 / r)(s"w$r")).mkString(" ")
    writeDocs(planted, Seq((1L, text, "en", "s")))
    val r1 = q("zipf1_zipf_slope").run(spark, planted).collect()(0)
    assert(r1.getLong(0) == 8L)
    val slope = r1.getLong(3)
    // the div-by-(den div 1e6) truncation bounds precision at ~0.5% for an
    // 8-point fit; the planted law must land within 3% of -1e6
    assert(slope > -1030000L && slope < -970000L, s"slope_micro = $slope")

    val flat = tmpDir("zipf1b")
    writeDocs(flat, Seq((1L, (1 to 8).flatMap(r => Seq.fill(5)(s"w$r")).mkString(" "), "en", "s")))
    val r2 = q("zipf1_zipf_slope").run(spark, flat).collect()(0)
    assert(r2.getLong(1) == 0L && r2.getLong(3) == 0L, s"flat corpus: $r2")
  }

  test("zipf1: the rank window input is the LIMIT-512 table (bounded-window contract)") {
    val sf = "/root/testdata/sf0.001"
    val p = q("zipf1_zipf_slope").run(spark, sf)
      .queryExecution.optimizedPlan.toString
    // the limit must sit UPSTREAM of the window in the optimized plan: the
    // plan reads Window(... child ... Limit/TakeOrdered ...), so the first
    // Window node appears BEFORE (above) a limit node in the tree print
    val winAt = p.indexOf("Window")
    val limAt = math.max(p.indexOf("GlobalLimit", winAt),
      p.indexOf("Limit", winAt))
    assert(winAt >= 0 && limAt > winAt,
      s"rank window not fed by the LIMIT-512 table:\n$p")
  }

  // ── sur1 ─────────────────────────────────────────────────────────────────

  test("sur1: three-customer life table with a same-day duplicate order") {
    val dir = tmpDir("sur1")
    writeOrders(dir, Seq(
      // c1: duplicate same-day orders (distinct collapses), repeat at day 45
      (1L, 1L, "2024-01-01"), (2L, 1L, "2024-01-01"), (3L, 1L, "2024-02-15"),
      // c2: single order -> right-censored at dmax (2024-02-15, day 45)
      (4L, 2L, "2024-01-01"),
      // c3: repeat at day 10 -> bucket 0 event
      (5L, 3L, "2024-01-01"), (6L, 3L, "2024-01-11")))
    val rows = q("sur1_life_table").run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows == Map(
      0L -> (1L, 0L, 3L, 333333L),
      1L -> (1L, 1L, 2L, 500000L)))
  }

  test("sur1: orders is scanned once — the horizon rides the checkpointed distinct") {
    val p = q("sur1_life_table").run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val scans = "FileScan".r.findAllIn(p).size
    assert(scans == 0,
      s"orders parquet re-scanned $scans times past the checkpoint:\n$p")
  }

  // ── tq8 ──────────────────────────────────────────────────────────────────

  test("tq8: hand-computed market share on a two-year star") {
    import spark.implicits._
    val dir = tmpDir("tq8")
    Seq((0, "EUROPE"), (1, "ASIA")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    Seq((3, "NATION_3", 0), (4, "NATION_4", 0), (9, "NATION_9", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, "s1", 3), (2L, "s2", 4), (3L, "s3", 9))
      .toDF("s_suppkey", "s_name", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, "PROMO"), (2L, "STANDARD")).toDF("p_partkey", "p_type")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((1L, "1995-03-15"), (2L, "1996-07-01")).toDF("o_orderkey", "o_orderdate")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(
      (1L, 1L, 1L, 10.0, 0.10), // 1995, NATION_3: 1000 * 90 = 90000
      (1L, 1L, 2L, 20.0, 0.00), // 1995, NATION_4 (EUROPE, not n3): 200000
      (1L, 2L, 1L, 99.0, 0.00), // STANDARD part -> excluded
      (1L, 1L, 3L, 99.0, 0.00), // ASIA supplier -> excluded
      (2L, 1L, 1L, 5.0, 0.02))  // 1996, NATION_3: 500 * 98 = 49000
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = q("tq8_market_share").run(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // 1995: 90000e6 div 290000 = 310344 ; 1996: all revenue is NATION_3
    assert(rows == Map(
      1995L -> (290000L, 90000L, 310344L),
      1996L -> (49000L, 49000L, 1000000L)))
    // revenue conservation: the nation slice never exceeds the region total
    rows.values.foreach { case (all, nat, _) => assert(nat <= all && all > 0) }
  }

  test("tq8: dimensions broadcast; the only shuffle join is lineitem-orders") {
    val p = q("tq8_market_share").run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"part/supplier dims not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  // ── emd1 ─────────────────────────────────────────────────────────────────

  test("emd1: en {1,2} vs fr {2,3} is a unit shift — W1 = 1; identical gives 0") {
    val dir = tmpDir("emd1a")
    // ECDF gaps: score 1: |F_a-F_b| = 1/2 over gap 1; score 2: 1/2 over
    // gap 1; last score contributes nothing -> W1 = 1 exactly (the
    // distributions are unit translates)
    writeDocs(dir, Seq(
      (1L, "a", "en", "s"), (2L, "aa", "en", "s"),
      (3L, "bb", "fr", "s"), (4L, "bbb", "fr", "s")))
    val r = q("emd1_wasserstein").run(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (2L, 2L, 1000000L))

    val same = tmpDir("emd1b")
    writeDocs(same, Seq(
      (1L, "a", "en", "s"), (2L, "aa", "en", "s"),
      (3L, "b", "fr", "s"), (4L, "bb", "fr", "s")))
    assert(q("emd1_wasserstein").run(spark, same).collect()(0).getLong(2) == 0L)
  }

  test("emd1 vs ks1: the broad-shift case W1 integrates, KS saturates") {
    // interleaved en {1,5} / fr {3,7}: the ECDF gap is 1/2 on [1,3) and
    // [5,7) and 0 on [3,5) — KS reads 1/2 (its max) while W1 reads 2
    // (1/2 x 2 + 1/2 x 2) — the monitoring rationale for carrying both
    val dir = tmpDir("emd1c")
    writeDocs(dir, Seq(
      (1L, "a", "en", "s"), (2L, "a" * 5, "en", "s"),
      (3L, "b" * 3, "fr", "s"), (4L, "b" * 7, "fr", "s")))
    assert(q("ks1_ks_test").run(spark, dir).collect()(0).getLong(3) == 500000L)
    assert(q("emd1_wasserstein").run(spark, dir).collect()(0).getLong(2) == 2000000L)
  }

  // ── wt1 ──────────────────────────────────────────────────────────────────

  test("wt1: hand-computed Welch t on {10,12} vs {1,3}") {
    val dir = tmpDir("wt1a")
    // m_a=11 va=2, m_b=2 vb=2 -> se2 = 1+1 = 2, t = 9/sqrt(2) = 6.363961,
    // df = 4/(1+1) = 2, pooled var = 2 -> d = t
    writeDocs(dir, Seq(
      (1L, "a" * 10, "en", "s"), (2L, "a" * 12, "en", "s"),
      (3L, "b", "fr", "s"), (4L, "bbb", "fr", "s")))
    val r = q("wt1_welch_ttest").run(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1)) == (2L, 2L))
    assert(r.getDouble(2) == 6.363961 && r.getDouble(3) == 2.0 &&
      r.getDouble(4) == 6.363961, s"got $r")
  }

  test("wt1: zero variance on both sides guards to NULL, never divides by zero") {
    val dir = tmpDir("wt1b")
    writeDocs(dir, Seq(
      (1L, "aaaaa", "en", "s"), (2L, "aaaaa", "en", "s"),
      (3L, "bbbbb", "fr", "s"), (4L, "bbbbb", "fr", "s")))
    val r = q("wt1_welch_ttest").run(spark, dir).collect()(0)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4), s"got $r")
  }

  // ── sd1 ──────────────────────────────────────────────────────────────────

  test("sd1: weekday means and residuals on a hand-built two-weekday series") {
    import spark.implicits._
    val dir = tmpDir("sd1")
    // three Mondays-alike (2024-01-01/08/15 share epoch-dow) at 100/200/350
    // cents, one lone 2024-01-02 at 500 cents
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "purchase", 1.00),
      (2L, "2024-01-08 10:00:00", 1L, "purchase", 2.00),
      (3L, "2024-01-15 10:00:00", 1L, "purchase", 3.50),
      (4L, "2024-01-02 10:00:00", 1L, "purchase", 5.00))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = q("sd1_weekday_decomp").run(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    // mean for the shared dow: 650e6 div 3 = 216666666
    assert(rows("2024-01-01") == (100L, 216666666L, -116666666L))
    assert(rows("2024-01-08") == (200L, 216666666L, -16666666L))
    assert(rows("2024-01-15") == (350L, 216666666L, 133333334L))
    // a singleton weekday is its own mean: residual 0
    assert(rows("2024-01-02") == (500L, 500000000L, 0L))
    // same dow value for the three aligned days, different for the lone day
    val dows = q("sd1_weekday_decomp").run(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(dows("2024-01-01") == dows("2024-01-08") &&
      dows("2024-01-08") == dows("2024-01-15") &&
      dows("2024-01-01") != dows("2024-01-02"))
  }

  private def writeEvents(dir: String, rows: Seq[(Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.map { case (id, ts, v) => (id, ts, 1L, "purchase", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  // ── js1 ──────────────────────────────────────────────────────────────────

  test("js1: disjoint supports give the ln 2 maximum; identical give 0") {
    val dir = tmpDir("js1a")
    // en lengths {1,1} vs fr {2,2}: every cell is one-sided, so
    // KL(P||M) = KL(Q||M) = JS = ln 2 = 693147 micro exactly
    writeDocs(dir, Seq(
      (1L, "a", "en", "s"), (2L, "b", "en", "s"),
      (3L, "cc", "fr", "s"), (4L, "dd", "fr", "s")))
    val r = q("js1_jensen_shannon").run(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (2L, 2L, 2L))
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) ==
      (693147L, 693147L, 693147L), s"got $r")

    val same = tmpDir("js1b")
    // en {1,2} vs fr {1,2}: ai = bi in every cell -> each micro-ln term is
    // exactly 693147 + 693147 - 1386294 = 0
    writeDocs(same, Seq(
      (1L, "a", "en", "s"), (2L, "aa", "en", "s"),
      (3L, "b", "fr", "s"), (4L, "bb", "fr", "s")))
    val r2 = q("js1_jensen_shannon").run(spark, same).collect()(0)
    assert((r2.getLong(3), r2.getLong(4), r2.getLong(5)) == (0L, 0L, 0L))
  }

  test("js1: an empty side guards to NULL, never divides by zero") {
    val dir = tmpDir("js1c")
    writeDocs(dir, Seq((1L, "a", "en", "s"), (2L, "aa", "en", "s")))
    val r = q("js1_jensen_shannon").run(spark, dir).collect()(0)
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5), s"got $r")
  }

  test("js1: the cell table is score-grain bounded, not corpus-sized") {
    // same bounded contract as ks1 — js1's only intermediate is the
    // distinct-score cell table; no window at all in the plan
    val sf = "/root/testdata/sf0.001"
    val scores = Tables.documents(spark, sf).select("n_chars").distinct().count()
    assert(scores <= 8192)
    val p = q("js1_jensen_shannon").run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"unexpected window in js1 plan:\n$p")
  }

  // ── acf1 ─────────────────────────────────────────────────────────────────

  test("acf1: hand-computed ACF on cents {1000,2000,3000,4000}") {
    val dir = tmpDir("acf1a")
    // n=4, S=10000; centered n*x-S = {-6000,-2000,2000,6000},
    // den = 2*(36e6+4e6) = 8e7 -> den div 1e6 = 80... no: den = 72e6+8e6?
    // 36e6 + 4e6 + 4e6 + 36e6 = 80e6 -> den div 1e6 = 80
    // lag1: 12e6 - 4e6 + 12e6 = 20e6 -> 20e6 div 80 = 250000
    // lag2: -12e6 - 12e6 = -24e6 -> -300000
    // lag3: -36e6 -> -450000; lags 4..7 have no pairs -> no rows
    writeEvents(dir, Seq(
      (1L, "2024-01-01 10:00:00", 10.00), (2L, "2024-01-02 10:00:00", 20.00),
      (3L, "2024-01-03 10:00:00", 30.00), (4L, "2024-01-04 10:00:00", 40.00)))
    val rows = q("acf1_autocorrelation").run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows(1L) == (4L, 3L, 250000L), s"got ${rows(1L)}")
    assert(rows(2L) == (4L, 2L, -300000L))
    assert(rows(3L) == (4L, 1L, -450000L))
  }

  test("acf1: a constant series (den = 0) guards acf to NULL") {
    val dir = tmpDir("acf1b")
    writeEvents(dir, Seq(
      (1L, "2024-01-01 10:00:00", 10.00), (2L, "2024-01-02 10:00:00", 10.00),
      (3L, "2024-01-03 10:00:00", 10.00)))
    val rows = q("acf1_autocorrelation").run(spark, dir).collect()
    assert(rows.nonEmpty && rows.forall(_.isNullAt(3)))
  }

  test("acf1: the lag grid input is the day table, not the corpus") {
    val sf = "/root/testdata/sf0.001"
    val days = Tables.events(spark, sf)
      .select(date_trunc("day", col("ts"))).distinct().count()
    val events = Tables.events(spark, sf).count()
    assert(days < events, s"day table ($days) not below corpus ($events)")
    // the day-grain HashAggregate sits upstream of the row_number window
    val p = q("acf1_autocorrelation").run(spark, sf)
      .queryExecution.executedPlan.toString
    val winAt = p.indexOf("Window")
    assert(winAt >= 0 && p.indexOf("HashAggregate", winAt) >= 0,
      s"day-grain aggregate not upstream of the window:\n$p")
  }

  // ── ab2 ──────────────────────────────────────────────────────────────────

  test("ab2: SPRT walks continue -> accept_h1 on a conversion surge") {
    val dir = tmpDir("ab2a")
    // day 1: k=1/n=2 -> llr = (ln5-ln4) + (ln15-ln16) micro = 158605:
    // inside (-ln19, ln19) = (-2944439, 2944439) -> continue.
    // day 2: 20 straight conversions -> +20*(ln5-ln4) = +4462880 ->
    // cumulative 4621485 >= ln19 -> accept_h1
    def ev(id: Long, day: Int, et: String) =
      (id, f"2024-01-$day%02d 09:00:00", 1L, et, 1.0)
    val rows =
      Seq(ev(1L, 1, "purchase"), ev(2L, 1, "view")) ++
        (0 until 20).map(i => ev(10L + i, 2, "purchase"))
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    def lnm(x: Int) = math.round(math.log(x) * 1e6)
    val out = q("ab2_sprt").run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getString(4))).toMap
    val day1 = (lnm(5) - lnm(4)) + (lnm(15) - lnm(16))
    assert(out("2024-01-01") == (day1, "continue"), s"got $out")
    assert(out("2024-01-02") == (day1 + 20 * (lnm(5) - lnm(4)), "accept_h1"))
  }

  test("ab2: a zero-conversion run crosses the lower boundary to accept_h0") {
    val dir = tmpDir("ab2b")
    import spark.implicits._
    // 50 views, no purchase: llr = 50*(ln15-ln16) = -3226950 <= -ln19
    (0 until 50).map(i => (i.toLong, "2024-01-01 09:00:00", 1L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = q("ab2_sprt").run(spark, dir).collect()(0)
    assert(r.getString(4) == "accept_h0", s"got $r")
  }

  // ── qq1 ──────────────────────────────────────────────────────────────────

  test("qq1: hand-computed ventiles — en {1,2,3,4} vs fr {2,4}") {
    val dir = tmpDir("qq1a")
    // qa: 20*cum >= 4j <=> 5*cum >= j -> score 1 for j<=5, 2 for j<=10,
    // 3 for j<=15, 4 above; qb: 10*cum >= j -> 2 for j<=10, 4 above
    writeDocs(dir, Seq(
      (1L, "a", "en", "s"), (2L, "aa", "en", "s"),
      (3L, "aaa", "en", "s"), (4L, "aaaa", "en", "s"),
      (5L, "bb", "fr", "s"), (6L, "bbbb", "fr", "s")))
    val rows = q("qq1_quantile_drift").run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.size == 19)
    (1L to 19L).foreach { j =>
      val qa = if (j <= 5) 1L else if (j <= 10) 2L else if (j <= 15) 3L else 4L
      val qb = if (j <= 10) 2L else 4L
      assert(rows(j) == (qa, qb), s"level $j: got ${rows(j)}, want ($qa, $qb)")
    }
  }

  test("qq1: an empty side is NULL at every level, never a fake quantile") {
    val dir = tmpDir("qq1b")
    writeDocs(dir, Seq((1L, "a", "en", "s"), (2L, "aa", "en", "s")))
    val rows = q("qq1_quantile_drift").run(spark, dir).collect()
    assert(rows.length == 19 && rows.forall(_.isNullAt(2)))
  }

  // ── theil1 ───────────────────────────────────────────────────────────────

  test("theil1: hand-computed median slope and intercept on {100,300,200,400}") {
    val dir = tmpDir("th1a")
    // pairwise slopes (micro): 200e6, 50e6, 100e6, -100e6, 50e6, 200e6;
    // sorted with (ti,tj) ties: -100e6, 50e6(1,3), 50e6(2,4), 100e6,
    // 200e6(1,2), 200e6(3,4) -> rn (6+1)//2 = 3 -> slope = 50e6.
    // residuals cents*1e6 - 50e6*t = {50e6, 200e6, 50e6, 200e6};
    // sorted by (resid, t): rn (4+1)//2 = 2 -> icept = 50e6 (t=3)
    writeEvents(dir, Seq(
      (1L, "2024-01-01 10:00:00", 1.00), (2L, "2024-01-02 10:00:00", 3.00),
      (3L, "2024-01-03 10:00:00", 2.00), (4L, "2024-01-04 10:00:00", 4.00)))
    val r = q("theil1_theil_sen").run(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (4L, 6L, 50000000L, 50000000L), s"got $r")
  }

  test("theil1: one outlier day does not move the median slope (OLS would)") {
    val dir = tmpDir("th1b")
    // clean trend 100 cents/day for t=1..4, then a 5000-cent day-5 spike:
    // the four spike pairs rank above the six clean 100e6 slopes, and the
    // lower median (rn 5 of 10) still reads 100e6
    writeEvents(dir, Seq(
      (1L, "2024-01-01 10:00:00", 1.00), (2L, "2024-01-02 10:00:00", 2.00),
      (3L, "2024-01-03 10:00:00", 3.00), (4L, "2024-01-04 10:00:00", 4.00),
      (5L, "2024-01-05 10:00:00", 50.00)))
    val r = q("theil1_theil_sen").run(spark, dir).collect()(0)
    assert((r.getLong(1), r.getLong(2)) == (10L, 100000000L), s"got $r")
  }

  // ── determinism across runs (the family is all exact integers) ──────────

  for (name <- Seq("ks1_ks_test", "mi1_feature_mi", "gt1_good_turing",
                   "zipf1_zipf_slope", "sur1_life_table", "tq8_market_share",
                   "emd1_wasserstein", "wt1_welch_ttest", "sd1_weekday_decomp",
                   "js1_jensen_shannon", "acf1_autocorrelation",
                   "theil1_theil_sen")) {
    test(s"$name on testdata is deterministic across runs") {
      val sf = "/root/testdata/sf0.001"
      val a = SparkEntry.queries(name)(spark, sf)
      val b = SparkEntry.queries(name)(spark, sf)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    }
  }
}
