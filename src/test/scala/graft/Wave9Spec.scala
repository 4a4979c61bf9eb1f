package graft

import org.apache.spark.sql.functions._

/** Wave-9 fixtures: seed-locality and symmetry properties of personalized
  * PageRank (ppr1), a hand-traced farthest-point seeding (km3), the
  * top-k-with-OTHER fold under ties (v2), coverage/monotonicity/balance of
  * the range-split planner (rp1), and the zero-variance / single-bucket
  * guards of the grouped jackknife (ci1).
  */
class Wave9Spec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    CacheRegistry.trackPath(
      java.nio.file.Files.createTempDirectory(prefix).toString)

  /** Supplier co-purchase fixture: one order per edge, quantity 40 so the
    * ppr1 cut keeps it.
    */
  private def writeGraph(dir: String, edges: Seq[(Long, Long)],
      seedNation: Map[Long, Int]): Unit = {
    import spark.implicits._
    edges.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i.toLong + 1, 1L, a, 40.0), (i.toLong + 1, 1L, b, 40.0))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    seedNation.toSeq.map { case (k, n) => (k, n) }
      .toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
  }

  private def writeEmb(dir: String, rows: Seq[(Long, Float)]): Unit = {
    import spark.implicits._
    rows.map { case (id, x) => (id, Array(x) ++ Array.fill(63)(0f), 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def writeEvents(dir: String,
      rows: Seq[(Long, String, String)]): Unit = {
    import spark.implicits._
    rows.map { case (id, ts, et) => (id, ts, id, et, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  // ── ppr1 ─────────────────────────────────────────────────────────────────

  test("ppr1: mass decays with distance from the seed and respects symmetry") {
    val dir = tmpDir("ppr1a")
    // line 1-2-3-4-5 with the seed at the center (3); a disjoint
    // component 8-9 must never appear (pr stays 0 there)
    writeGraph(dir, Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L)),
      Map(3L -> 1, 1L -> 2, 2L -> 2, 4L -> 2, 5L -> 2, 8L -> 2, 9L -> 2))
    val out = SparkEntry.queries("ppr1_personalized_pagerank")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!out.contains(8L) && !out.contains(9L), s"unreached nodes leaked: $out")
    // at 3 rounds the push oscillates (a path is near-bipartite), so the
    // 1-hop ring can outrank the seed; what IS guaranteed: mass decays
    // beyond the first ring, and the seed beats the far ring
    assert(out(2L) > out(1L) && out(3L) > out(1L), s"no distance decay: $out")
    assert(out(2L) == out(4L) && out(1L) == out(5L), s"asymmetric on a symmetric graph: $out")
  }

  test("ppr1: an empty seed set yields no rows (no division blowup)") {
    val dir = tmpDir("ppr1b")
    writeGraph(dir, Seq((1L, 2L)), Map(1L -> 2, 2L -> 2))
    val out = SparkEntry.queries("ppr1_personalized_pagerank")(spark, dir).collect()
    assert(out.isEmpty, s"got ${out.toSeq}")
  }

  // ── km3 ──────────────────────────────────────────────────────────────────

  test("km3: hand-traced farthest-point rounds") {
    val dir = tmpDir("km3a")
    // 1-d points at 0, 10, 4: c1 = min id (0); c2 = farthest from 0 (10,
    // dist 100); c3 = argmax of min-dist to {0, 10} -> 4 (min(16, 36) = 16)
    writeEmb(dir, Seq((0L, 0f), (1L, 10f), (2L, 4f)))
    val out = SparkEntry.queries("km3_farthest_init")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSeq
    assert(out == Seq((1L, 0L, -1.0), (2L, 1L, 100.0), (3L, 2L, 16.0)), s"got $out")
  }

  test("km3: equidistant candidates break to the smallest vec_id") {
    val dir = tmpDir("km3b")
    // 0 at origin; 5 and 7 both at distance 81; round 2 must pick id 5
    writeEmb(dir, Seq((0L, 0f), (5L, 9f), (7L, -9f)))
    val out = SparkEntry.queries("km3_farthest_init")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out(1) == (2L, 5L), s"got $out")
    // round 3: min-dist of 7 to {0, 5} is min(81, 324) = 81 -> picked last
    assert(out(2) == (3L, 7L), s"got $out")
  }

  // ── v2 ───────────────────────────────────────────────────────────────────

  test("v2: top-3 by (count, name) and the OTHER fold") {
    val dir = tmpDir("v2a")
    // a x3, b x2, c x2, d x1 on one day: top3 = {a, b, c}; d -> other
    val evs = Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c") :+ "d"
    writeEvents(dir, evs.zipWithIndex.map { case (t, i) =>
      (i.toLong + 1, "2020-01-01 10:00:00", t)
    })
    val out = SparkEntry.queries("v2_pivot_topk_other")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("2020-01-01", "a", 3L), ("2020-01-01", "b", 2L),
      ("2020-01-01", "c", 2L), ("2020-01-01", "other", 1L)), s"got $out")
  }

  test("v2: a day missing a top bucket emits no NULL-count row") {
    val dir = tmpDir("v2b")
    writeEvents(dir, Seq(
      (1L, "2020-01-01 10:00:00", "a"), (2L, "2020-01-01 10:00:00", "b"),
      (3L, "2020-01-02 10:00:00", "a")))
    val out = SparkEntry.queries("v2_pivot_topk_other")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(("2020-01-01", "a", 1L), ("2020-01-01", "b", 1L),
      ("2020-01-02", "a", 1L)), s"got $out")
  }

  // ── rp1 ──────────────────────────────────────────────────────────────────

  test("rp1: 16 splits cover every row exactly once, boundaries monotone, balance sane") {
    val sf = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("rp1_range_splits")(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSeq == (0L to 15L), s"split ids: ${out.toSeq}")
    val total = Tables.lineitem(spark, sf).count()
    assert(out.map(_.getLong(3)).sum == total,
      s"splits do not partition the fact: ${out.map(_.getLong(3)).sum} vs $total")
    val bounds = out.flatMap(r => if (r.isNullAt(2)) None else Some(r.getLong(2)))
    assert(bounds.toSeq == bounds.sorted.toSeq, s"boundaries not monotone: ${bounds.toSeq}")
    // 2% sample at sf0.01 keeps every split within ~2.4x of ideal (62500)
    assert(out.map(_.getLong(4)).max < 150000L,
      s"worst split share too large: ${out.map(_.getLong(4)).toSeq}")
  }

  test("rp1: an empty fact yields one open split with zero rows") {
    val dir = tmpDir("rp1a")
    import spark.implicits._
    Seq.empty[(Long, Long)].toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("rp1_range_splits")(spark, dir).collect()
    assert(out.length == 1 && out(0).getLong(0) == 0L
      && out(0).getLong(3) == 0L && out(0).isNullAt(4), s"got ${out.toSeq}")
  }

  // ── ci1 ──────────────────────────────────────────────────────────────────

  test("ci1: a constant column has zero jackknife variance") {
    val dir = tmpDir("ci1a")
    import spark.implicits._
    (1L to 200L).map(i => (i, "x", "en", "s", 42L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("ci1_jackknife")(spark, dir).collect()(0)
    assert(r.getLong(0) == 200L && r.getLong(2) == 42000000L, s"got $r")
    assert(r.getDouble(3) == 0.0, s"constant column must have se 0: $r")
  }

  test("ci1: a single-bucket corpus yields no row (leave-one-out undefined)") {
    val dir = tmpDir("ci1b")
    import spark.implicits._
    // one document -> one bucket -> deleting it leaves nothing: the loo
    // table is empty and the result is empty on BOTH engines (symmetric)
    Seq((1L, "x", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("ci1_jackknife")(spark, dir).collect()
    assert(out.isEmpty, s"got ${out.toSeq}")
  }

  test("ci1: the jackknife arithmetic runs over at most 32 bucket rows") {
    val r = SparkEntry.queries("ci1_jackknife")(spark, "/root/testdata/sf0.001")
      .collect()(0)
    assert(r.getLong(1) >= 2L && r.getLong(1) <= 32L, s"got $r")
    assert(!r.isNullAt(3) && r.getDouble(3) > 0.0, s"got $r")
  }
}
