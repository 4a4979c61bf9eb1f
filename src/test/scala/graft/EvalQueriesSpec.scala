package graft

import org.apache.spark.sql.functions._

/** Behavioral invariants of the round-10 evaluation/monitoring operators
  * (graft.queries.EvalQueries). The DuckDB oracle gates cross-engine
  * equality; these pin the SEMANTICS on fixtures where the right answer is
  * computable by hand — plus the CUSUM closed-form-vs-recursion identity
  * and the KMV error envelope on a synthetic population.
  */
class EvalQueriesSpec extends SparkSpec {

  private def q(name: String) =
    graft.queries.EvalQueries.all.find(_.name == name).get

  private def tmpDir(prefix: String): String =
    CacheRegistry.trackPath(
      java.nio.file.Files.createTempDirectory(prefix).toString)

  private def writeDocs(dir: String, rows: Seq[(Long, String, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def writeEvents(dir: String,
      rows: Seq[(Long, String, Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  // ── auc1 ────────────────────────────────────────────────────────────────

  test("auc1: hand-checked 2U with a tie — AUC = 5/8") {
    val dir = tmpDir("auc1a")
    // scores via n_chars = length(text): pos(en) {3, 5}, neg(fr) {3, 4}.
    // Pairs: (3,3) tie=1, (3,4) loss=0, (5,3) win=2, (5,4) win=2 ⇒ 2U=5.
    writeDocs(dir, Seq(
      (1L, "aaa", "en"), (2L, "aaaaa", "en"),
      (3L, "bbb", "fr"), (4L, "bbbb", "fr")))
    val r = q("auc1_rank_auc").run(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (2L, 2L, 5L, 625000L))
  }

  test("auc1: perfect separation gives AUC 1, inverted gives 0") {
    val dir = tmpDir("auc1b")
    writeDocs(dir, Seq(
      (1L, "aaaaaa", "en"), (2L, "aaaaaaa", "en"),
      (3L, "b", "fr"), (4L, "bb", "fr")))
    assert(q("auc1_rank_auc").run(spark, dir).collect()(0).getLong(3) == 1000000L)
    val dir2 = tmpDir("auc1c")
    writeDocs(dir2, Seq(
      (1L, "a", "en"), (2L, "bbbbb", "fr")))
    assert(q("auc1_rank_auc").run(spark, dir2).collect()(0).getLong(3) == 0L)
  }

  // ── cal1 ────────────────────────────────────────────────────────────────

  test("cal1: bins clamp at 10; rates are exact integer ppm") {
    val dir = tmpDir("cal1")
    // u1: 2 clicks + purchase; u2: 2 clicks, no purchase; u3: 12 clicks +
    // purchase (clamps into bin 10).
    val clicks = (1 to 2).map(i => (i.toLong, s"2024-01-01 00:0$i:00", 1L, "click", 0.0)) ++
      (3 to 4).map(i => (i.toLong, s"2024-01-01 00:0$i:00", 2L, "click", 0.0)) ++
      (10 to 21).map(i => (i.toLong, s"2024-01-01 00:$i:00", 3L, "click", 0.0))
    val buys = Seq((30L, "2024-01-01 01:00:00", 1L, "purchase", 9.99),
      (31L, "2024-01-01 01:00:00", 3L, "purchase", 1.0))
    writeEvents(dir, clicks ++ buys)
    val out = q("cal1_calibration_bins").run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(2L) == (2L, 1L, 500000L, 2000000L))
    assert(out(10L) == (1L, 1L, 1000000L, 12000000L))
  }

  // ── cp1 ─────────────────────────────────────────────────────────────────

  test("cp1: the window closed form equals the literal max(0, S+d) fold") {
    val dir = tmpDir("cp1a")
    // 10 days of 'error' counts with a sustained level shift at day 7.
    val counts = Seq(3, 2, 4, 3, 2, 3, 9, 8, 10, 9)
    val rows = counts.zipWithIndex.flatMap { case (c, di) =>
      (0 until c).map(j =>
        ((di * 100 + j).toLong, f"2024-02-${di + 1}%02d 12:00:00", j.toLong, "error", 0.0))
    }
    writeEvents(dir, rows)
    val out = q("cp1_cusum_changepoint").run(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    val d = counts.size.toLong
    val tot = counts.sum.toLong
    // literal CUSUM recursion over the scaled deviations
    var s = 0L
    val expected = counts.map { c =>
      s = math.max(0L, s + (c * d - tot))
      (c.toLong, s, if (s > tot) 1 else 0)
    }
    assert(out.toSeq == expected)
    assert(expected.exists(_._3 == 1), "the level shift must raise the alarm")
  }

  test("cp1: a flat series never alarms") {
    val dir = tmpDir("cp1b")
    val rows = (0 until 5).flatMap(di =>
      (0 until 4).map(j =>
        ((di * 10 + j).toLong, f"2024-03-${di + 1}%02d 00:00:00", j.toLong, "error", 0.0)))
    writeEvents(dir, rows)
    val out = q("cp1_cusum_changepoint").run(spark, dir).collect()
    assert(out.forall(r => r.getLong(2) == 0L && r.getInt(3) == 0))
  }

  // ── agg9 ────────────────────────────────────────────────────────────────

  test("agg9: below k distinct values the sketch is exact") {
    val dir = tmpDir("agg9a")
    // 40 click users, 25 purchase users, overlap 15 — all under k=256, so
    // every sketch is the complete set and the estimates collapse to exact.
    val rows = (1 to 40).map(u =>
      (u.toLong, "2024-01-01 00:00:00", u.toLong, "click", 0.0)) ++
      (26 to 50).map(u =>
        ((100 + u).toLong, "2024-01-01 00:00:00", u.toLong, "purchase", 1.0))
    writeEvents(dir, rows)
    val r = q("agg9_kmv_intersection").run(spark, dir).collect()(0)
    assert(r.getLong(1) == 50L && r.getLong(2) == 50L)   // union exact = est
    assert(r.getLong(3) == 15L && r.getLong(4) == 15L)   // intersection
  }

  test("agg9: at 8000 users the k=256 estimates land inside the KMV envelope") {
    val dir = tmpDir("agg9b")
    // clicks: users 1..5000; purchases: 3001..8000 ⇒ union 8000, ∩ 2000.
    val rows = (1 to 5000).map(u =>
      (u.toLong, "2024-01-01 00:00:00", u.toLong, "click", 0.0)) ++
      (3001 to 8000).map(u =>
        ((10000 + u).toLong, "2024-01-01 00:00:00", u.toLong, "purchase", 1.0))
    writeEvents(dir, rows)
    val r = q("agg9_kmv_intersection").run(spark, dir).collect()(0)
    val (exu, estu, exi, esti) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(exu == 8000L && exi == 2000L)
    // KMV SE ≈ 1/√(k−2) ≈ 6.3%; assert 4σ for the union and a wider band
    // for the intersection (its variance compounds ρ's binomial noise).
    assert(math.abs(estu - exu).toDouble / exu < 0.25, s"est_union=$estu")
    assert(math.abs(esti - exi).toDouble / exi < 0.40, s"est_int=$esti")
  }

  // ── at1 ─────────────────────────────────────────────────────────────────

  test("at1: credit goes to the last non-purchase touch; orphans are direct") {
    val dir = tmpDir("at1")
    writeEvents(dir, Seq(
      // user 1: click → purchase 10.00 ⇒ click
      (1L, "2024-01-01 00:00:00", 1L, "click", 0.0),
      (2L, "2024-01-01 00:05:00", 1L, "purchase", 10.00),
      // user 2: purchase 5.50 with no prior event ⇒ direct; then
      // view → purchase 2.25 ⇒ view (the earlier purchase is skipped by
      // the non-purchase carry-forward, not treated as a channel)
      (3L, "2024-01-01 00:00:00", 2L, "purchase", 5.50),
      (4L, "2024-01-01 00:10:00", 2L, "view", 0.0),
      (5L, "2024-01-01 00:20:00", 2L, "purchase", 2.25)))
    val out = q("at1_last_touch_attribution").run(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out == Map(
      "click" -> (1L, 10.00), "direct" -> (1L, 5.50), "view" -> (1L, 2.25)))
  }

  // ── gini1 ───────────────────────────────────────────────────────────────

  private def writeOrders(dir: String, rows: Seq[(Long, Long, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice")
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderdate", lit("2024-01-01").cast("timestamp"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
  }

  test("gini1: equal revenue is 0; hand-computed concentration is 0.72") {
    val dir = tmpDir("gini1a")
    writeOrders(dir, (1L to 4L).map(u => (u, u, 25.0)))
    assert(q("gini1_revenue_concentration").run(spark, dir)
      .collect()(0).getDouble(2) == 0.0)
    val dir2 = tmpDir("gini1b")
    // revenues [1,1,1,97]: G = (2·(1+2+3+4·97) − 5·100) / (4·100) = 0.72
    writeOrders(dir2, Seq((1L, 1L, 1.0), (2L, 2L, 1.0), (3L, 3L, 1.0), (4L, 4L, 97.0)))
    assert(q("gini1_revenue_concentration").run(spark, dir2)
      .collect()(0).getDouble(2) == 0.72)
  }

  // ── pa1 ─────────────────────────────────────────────────────────────────

  test("pa1: a singleton quasi-identifier group is flagged at risk") {
    val dir = tmpDir("pa1")
    // six docs share (en, s, bucket 0); one (fr, s, bucket 0) is a singleton
    writeDocs(dir, (1L to 6L).map(i => (i, "x" * 10, "en")) :+ (7L, "y" * 10, "fr"))
    val r = SparkEntry.queries("pa1_k_anonymity")(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (2L, 1L, 1L, 1L))
  }

  // ── ct3 ─────────────────────────────────────────────────────────────────

  /** The 16-bit md5 bucket of graft.operators.Sampling, on the driver. */
  private def bucket(id: Long): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Integer.parseInt(hex.take(4), 16)
  }

  test("ct3: overlap fraction is shared-over-distinct shingles, flagged over 10%") {
    val dir = tmpDir("ct3")
    val benchId = (1L to 500L).find(bucket(_) < 3276).get
    val dirtyId = (1L to 500L).find(bucket(_) >= 3276).get
    val cleanId = (dirtyId + 1L to 600L).find(bucket(_) >= 3276).get
    writeDocs(dir, Seq(
      (benchId, "w1 w2 w3 w4", "en"),          // bench shingles: 2
      (dirtyId, "w1 w2 w3 x1 x2", "en"),       // shares 1 of its 3 shingles
      (cleanId, "z1 z2 z3", "en")))            // no overlap → absent
    val out = SparkEntry.queries("ct3_overlap_fraction")(spark, dir).collect()
    assert(out.length == 1)
    val r = out(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)) ==
      (dirtyId, 1L, 3L, 333333L, 1))
  }

  // ── mmr1 ────────────────────────────────────────────────────────────────

  test("mmr1: a duplicate of the first pick is deferred behind a diverse candidate") {
    import spark.implicits._
    val dir = tmpDir("mmr1")
    Seq(
      (0L, Array(1f, 0f, 0f, 0f)),     // query
      (1L, Array(1f, 0.1f, 0f, 0f)),
      (2L, Array(1f, 0.1f, 0f, 0f)),   // exact duplicate of 1
      (3L, Array(1f, -0.1f, 0f, 0f)),  // same rel as 1/2, diverse
      (4L, Array(0.5f, 0.8f, 0f, 0f))) // lower rel, most diverse
      .toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("mmr1_diverse_rerank")(spark, dir).collect()
    // rel(1)=rel(2)=rel(3) tie → nid picks 1; then 3 (the duplicate 2 is
    // penalized by sim=10000 to the selected 1); then 2; the pool (4
    // candidates) exhausts at 4 picks even though k=5.
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L, 4L))
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
  }

  // ── os1 ─────────────────────────────────────────────────────────────────

  test("os1: median/MAD are exact; only the planted tail value flags") {
    val dir = tmpDir("os1")
    // values 1..9 plus 100: med = 5.5, MAD = 2.5, threshold = 11.1195 —
    // only |100 − 5.5| = 94.5 exceeds it.
    val rows = ((1 to 9).map(_.toDouble) :+ 100.0).zipWithIndex.map {
      case (v, i) => ((i + 1).toLong, "2024-01-01 00:00:00", i.toLong, "a", v)
    }
    writeEvents(dir, rows)
    val r = SparkEntry.queries("os1_robust_outliers")(spark, dir).collect()(0)
    assert((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)) ==
      (10L, 5.5, 2.5, 1L))
  }

  // ── fi1 ─────────────────────────────────────────────────────────────────

  test("fi1: support counts co-orders; an over-cap basket is dropped") {
    import spark.implicits._
    val dir = tmpDir("fi1")
    // o1/o2 both contain {1,2} → support 2; o3 {1,3} under minsup; o4 has
    // 31 distinct parts INCLUDING 1 and 2 — over the cap, so it must NOT
    // raise (1,2) to 3.
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 3L)) ++
      (1L to 31L).map(p => (4L, 100L + p)) ++ Seq((4L, 1L), (4L, 2L))
    rows.toDF("l_orderkey", "l_partkey")
      .withColumn("l_suppkey", lit(1L)).withColumn("l_linenumber", lit(1))
      .withColumn("l_quantity", lit(1.0)).withColumn("l_extendedprice", lit(1.0))
      .withColumn("l_discount", lit(0.0)).withColumn("l_tax", lit(0.0))
      .withColumn("l_returnflag", lit("N")).withColumn("l_linestatus", lit("O"))
      .withColumn("l_shipdate", lit("2024-01-01").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("fi1_frequent_pairs")(spark, dir).collect()
    assert(out.length == 1)
    val r = out(0)
    // conf_a = 2/3 of orders with part 1 (o1,o2,o3 — o4 dropped by cap)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (1L, 2L, 2L, 666666L, 1000000L))
  }

  // ── cur1 ────────────────────────────────────────────────────────────────

  test("cur1: phases order by threshold, positions shuffle by seeded hash within") {
    val dir = tmpDir("cur1")
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // two short docs (phase 0), one medium (1), one long (2)
    writeDocs(dir, Seq(
      (1L, "x" * 100, "en"), (2L, "y" * 150, "en"),
      (3L, "z" * 300, "en"), (4L, "w" * 500, "en")))
    val out = SparkEntry.queries("cur1_curriculum_order")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val phase0 = Seq(1L, 2L).sortBy(id => (md5hex(s"cur0:$id"), id))
    assert(out(phase0(0)) == (0, 0L) && out(phase0(1)) == (0, 1L))
    assert(out(3L) == (1, 2L) && out(4L) == (2, 3L))
  }

  test("at1: two purchases after one touch both credit that touch") {
    val dir = tmpDir("at1b")
    writeEvents(dir, Seq(
      (1L, "2024-01-01 00:00:00", 1L, "signup", 0.0),
      (2L, "2024-01-01 00:05:00", 1L, "purchase", 1.00),
      (3L, "2024-01-01 00:06:00", 1L, "purchase", 2.00)))
    val out = q("at1_last_touch_attribution").run(spark, dir).collect()
    assert(out.length == 1 &&
      out(0).getString(0) == "signup" && out(0).getLong(1) == 2L &&
      out(0).getDouble(2) == 3.00)
  }
}
