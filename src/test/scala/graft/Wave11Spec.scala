package graft

import org.apache.spark.sql.functions._

/** Wave-11 fixtures: sign-pattern anchors for binary quantization (emb9),
  * hand-computed U-shaped credits incl. the window cutoff (at2), and the
  * rank-before-collect LISTAGG cap (s6).
  */
class Wave11Spec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    CacheRegistry.trackPath(
      java.nio.file.Files.createTempDirectory(prefix).toString)

  private def writeEmb(dir: String, rows: Seq[(Long, Array[Float])]): Unit = {
    import spark.implicits._
    rows.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def writeEvents(dir: String,
      rows: Seq[(Long, Long, String, String)]): Unit = {
    import spark.implicits._
    rows.map { case (id, u, ts, et) => (id, ts, u, et, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  // ── emb9 ─────────────────────────────────────────────────────────────────

  test("emb9: sign patterns rank by cosine after the Hamming shortlist") {
    val dir = tmpDir("emb9a")
    val plus = Array.fill(64)(1f)
    val minus = Array.fill(64)(-1f)
    val half = Array.fill(32)(1f) ++ Array.fill(32)(-1f)
    writeEmb(dir, Seq((0L, plus), (1L, minus), (2L, half)))
    val out = SparkEntry.queries("emb9_binary_quant")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq(
      (0L, 2L, 0.0), (0L, 1L, -1.0),
      (1L, 2L, 0.0), (1L, 0L, -1.0),
      (2L, 0L, 0.0), (2L, 1L, 0.0)), s"got $out")
  }

  test("emb9: an exact sign twin is the top candidate") {
    val dir = tmpDir("emb9b")
    // query 0 has one sign twin (id 50) among 40 noise vectors whose
    // patterns flip progressively more bits -> Hamming puts the twin first
    val base = Array.tabulate(64)(i => if (i % 3 == 0) 1f else -1f)
    val noise = (10L until 50L).map { k =>
      val v = base.clone()
      (0 until (k - 8).toInt.min(63)).foreach(i => v(i) = -v(i))
      (k, v)
    }
    writeEmb(dir, Seq((0L, base), (50L, base.map(_ * 2f))) ++ noise)
    val out = SparkEntry.queries("emb9_binary_quant")(spark, dir).collect()
      .filter(_.getLong(0) == 0L).map(r => (r.getLong(1), r.getDouble(2)))
    assert(out.head == (50L, 1.0), s"sign twin not first: ${out.toSeq}")
  }

  // ── at2 ──────────────────────────────────────────────────────────────────

  test("at2: hand-computed U-shaped credits across path lengths") {
    val dir = tmpDir("at2a")
    writeEvents(dir, Seq(
      // user 7: view, click, signup, view -> purchase (n=4):
      // ends 400000 each (both views), middles 200000 div 2 = 100000 each
      (1L, 7L, "2020-01-01 10:00:00", "view"),
      (2L, 7L, "2020-01-01 11:00:00", "click"),
      (3L, 7L, "2020-01-01 12:00:00", "signup"),
      (4L, 7L, "2020-01-01 13:00:00", "view"),
      (5L, 7L, "2020-01-01 14:00:00", "purchase"),
      // user 8: single touch -> 1000000
      (6L, 8L, "2020-01-02 10:00:00", "view"),
      (7L, 8L, "2020-01-02 11:00:00", "purchase"),
      // user 9: two touches -> 500000 each
      (8L, 9L, "2020-01-03 10:00:00", "view"),
      (9L, 9L, "2020-01-03 11:00:00", "click"),
      (10L, 9L, "2020-01-03 12:00:00", "purchase")))
    val out = SparkEntry.queries("at2_position_weighted")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("click", 2L, 600000L),
      ("signup", 1L, 100000L),
      ("view", 4L, 2300000L)), s"got $out")
  }

  test("at2: touches outside the 7-day window earn nothing") {
    val dir = tmpDir("at2b")
    writeEvents(dir, Seq(
      (1L, 7L, "2020-01-01 10:00:00", "view"),     // 9 days before: out
      (2L, 7L, "2020-01-09 10:00:00", "click"),    // 1 day before: in
      (3L, 7L, "2020-01-10 10:00:00", "purchase")))
    val out = SparkEntry.queries("at2_position_weighted")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("click", 1L, 1000000L)), s"got $out")
  }

  test("at2: simultaneous touches break rank by event_id") {
    val dir = tmpDir("at2c")
    writeEvents(dir, Seq(
      (2L, 7L, "2020-01-01 10:00:00", "click"),
      (1L, 7L, "2020-01-01 10:00:00", "view"),   // same ts, lower id: FIRST
      (3L, 7L, "2020-01-01 10:00:00", "signup"),
      (4L, 7L, "2020-01-01 11:00:00", "purchase")))
    // order by (ts, id): view(1), click(2), signup(3) -> 400000/200000/400000
    val out = SparkEntry.queries("at2_position_weighted")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(out == Map("view" -> 400000L, "click" -> 200000L, "signup" -> 400000L),
      s"got $out")
  }

  test("at2: a hot user over the 256-touch cap earns nothing; the cap is inert on testdata") {
    val dir = tmpDir("at2d")
    // bot user 7: 300 touches then a purchase -> excluded outright;
    // normal user 8 still attributes
    val bot = (1L to 300L).map(i =>
      (i, 7L, f"2020-01-05 10:${i % 60}%02d:${i % 60}%02d", "view")) ++
      Seq((400L, 7L, "2020-01-06 10:00:00", "purchase"))
    val ok = Seq((500L, 8L, "2020-01-06 09:00:00", "click"),
      (501L, 8L, "2020-01-06 10:00:00", "purchase"))
    writeEvents(dir, bot ++ ok)
    val out = SparkEntry.queries("at2_position_weighted")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("click", 1L, 1000000L)), s"got $out")
    // and on the driver corpus the cap never bites (max touches/user ≪ 256)
    val maxTouches = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type").isin("view", "click", "signup"))
      .groupBy("user_id").count().agg(max("count")).collect()(0).getLong(0)
    assert(maxTouches <= 256, s"cap no longer inert on testdata: $maxTouches")
  }

  // ── s6 ───────────────────────────────────────────────────────────────────

  test("s6: ranks before collecting — only the 10 first names survive") {
    val dir = tmpDir("s6a")
    import spark.implicits._
    val rows = (1 to 12).map(i => (i.toLong, f"s$i%02d", 1)) ++
      Seq((20L, "zz", 2), (21L, "aa", 2))
    rows.toDF("s_suppkey", "s_name", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val out = SparkEntry.queries("s6_ordered_listagg")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSeq
    assert(out == Seq(
      (1, 10L, (1 to 10).map(i => f"s$i%02d").mkString(",")),
      (2, 2L, "aa,zz")), s"got $out")
  }
}
