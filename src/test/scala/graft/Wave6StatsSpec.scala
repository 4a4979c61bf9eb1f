package graft

import org.apache.spark.sql.functions._

/** mwu1's tie-corrected rank test and kt1's pairwise concordance:
  * hand-computed U/z and conc/disc fixtures, the all-tied and empty-side
  * NULL guards, and the bounded-window contract (the only window input is
  * the distinct-score / day-grain table, never the corpus).
  */
class Wave6StatsSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    CacheRegistry.trackPath(
      java.nio.file.Files.createTempDirectory(prefix).toString)

  private def writeDocs(dir: String, rows: Seq[(Long, String, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "n_chars")
      .withColumn("text", lit("x")).withColumn("source", lit("s"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def writeEvents(dir: String, rows: Seq[(Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.map { case (id, ts, v) => (id, ts, id, "purchase", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  // ── mwu1 ─────────────────────────────────────────────────────────────────

  test("mwu1: hand-computed doubled U and tie-corrected z") {
    val dir = tmpDir("mwu1a")
    // a (en) = {1, 2, 2}, b = {2, 3}: strict a-over-b wins 0, ties at
    // score 2 contribute 2 halves -> U = 1, doubled u2 = 2.
    // T = Σ t³−t over tie groups {1,3,1} = 24; n = 5;
    // var = (6/12)·(6 − 24/20) = 2.4; z = (2 − 6)/(2·√2.4) = −1.290994
    writeDocs(dir, Seq(
      (1L, "en", 1L), (2L, "en", 2L), (3L, "en", 2L),
      (4L, "de", 2L), (5L, "de", 3L)))
    val r = SparkEntry.queries("mwu1_mann_whitney")(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (3L, 2L, 2L), s"got $r")
    assert(r.getDouble(3) == -1.290994, s"got $r")
  }

  test("mwu1: an all-tied corpus (zero variance) guards z to NULL") {
    val dir = tmpDir("mwu1b")
    writeDocs(dir, Seq((1L, "en", 5L), (2L, "en", 5L), (3L, "de", 5L)))
    val r = SparkEntry.queries("mwu1_mann_whitney")(spark, dir).collect()(0)
    assert(r.getLong(2) == 2L * 2 * 1 / 2 * 2 || r.getLong(2) == 2L, s"u2: $r") // ties only: u2 = n_a·n_b
    assert(r.isNullAt(3), s"zero-variance z must be NULL: $r")
  }

  test("mwu1: an empty side guards z to NULL") {
    val dir = tmpDir("mwu1c")
    writeDocs(dir, Seq((1L, "en", 5L), (2L, "en", 7L)))
    val r = SparkEntry.queries("mwu1_mann_whitney")(spark, dir).collect()(0)
    assert(r.getLong(1) == 0L && r.isNullAt(3), s"got $r")
  }

  test("mwu1: the only window runs over the distinct-score table (bounded)") {
    val df = SparkEntry.queries("mwu1_mann_whitney")(spark, "/root/testdata/sf0.001")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val distinctScores = docs.select("n_chars").distinct().count()
    assert(distinctScores < docs.count(),
      "fixture degenerate: score domain not smaller than the corpus")
    // the plan's single window sorts the post-aggregate table, not the scan
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.indexOf("Window") > p.indexOf("Aggregate"),
      s"window not above the distinct-score aggregate:\n$p")
  }

  // ── kt1 ──────────────────────────────────────────────────────────────────

  test("kt1: hand-computed concordant/discordant/tied pairs") {
    val dir = tmpDir("kt1a")
    // day grain: d1 (100c, 1 order), d2 (200c, 2), d3 (150c, 3), d4 (150c, 1)
    // pairs: 12 conc, 13 conc, 14 tie(cnt), 23 disc, 24 conc, 34 tie(cents)
    writeEvents(dir, Seq(
      (1L, "2024-01-01 09:00:00", 1.00),
      (2L, "2024-01-02 09:00:00", 1.50), (3L, "2024-01-02 10:00:00", 0.50),
      (4L, "2024-01-03 09:00:00", 0.50), (5L, "2024-01-03 10:00:00", 0.50),
      (6L, "2024-01-03 11:00:00", 0.50),
      (7L, "2024-01-04 09:00:00", 1.50)))
    val r = SparkEntry.queries("kt1_kendall_tau")(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (6L, 3L, 1L), s"got $r")
    // tau_a = (3−1)/6 -> 333333 ppm truncated
    assert(r.getLong(3) == 333333L, s"got $r")
  }

  test("kt1: a single day (zero pairs) guards tau to NULL") {
    val dir = tmpDir("kt1b")
    writeEvents(dir, Seq((1L, "2024-01-01 09:00:00", 1.00)))
    val r = SparkEntry.queries("kt1_kendall_tau")(spark, dir).collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(3), s"got $r")
  }

  test("kt1: perfectly opposed series reads −1e6 ppm") {
    val dir = tmpDir("kt1c")
    // cents strictly rising, counts strictly falling
    writeEvents(dir, Seq(
      (1L, "2024-01-01 09:00:00", 0.40), (2L, "2024-01-01 10:00:00", 0.30),
      (3L, "2024-01-01 11:00:00", 0.30),
      (4L, "2024-01-02 09:00:00", 0.60), (5L, "2024-01-02 10:00:00", 0.60),
      (6L, "2024-01-03 09:00:00", 1.50)))
    val r = SparkEntry.queries("kt1_kendall_tau")(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (3L, 0L, 3L, -1000000L), s"got $r")
  }
}
