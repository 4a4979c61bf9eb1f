package graft

import org.apache.spark.sql.functions._
import graft.queries.MultimodalQueries

/** did1's 2×2 causal contrast and mm4's perceptual near-dup: hand-computed
  * cell fixtures, the empty-cell NULL guard, pHash locality, and the
  * banded-join ≡ quadratic-filter exactness (pigeonhole over 4×16-bit
  * bands — the shared [[graft.dedup.Banding]] device, also covered by
  * BandingSpec).
  */
class Wave5StatsSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    CacheRegistry.trackPath(
      java.nio.file.Files.createTempDirectory(prefix).toString)

  private def writeEvents(dir: String, rows: Seq[(Long, Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.map { case (id, uid, ts, v) => (id, ts, uid, "purchase", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  // ── did1 ─────────────────────────────────────────────────────────────────

  test("did1: hand-computed 2x2 — treated uplift 350 vs control drift 100") {
    val dir = tmpDir("did1a")
    // 4 days; the midpoint split puts days 3-4 in "post". user 1 (odd ->
    // treated): pre {1.00, 2.00} -> mean 150 cents... in micro: 150e6;
    // post {4.00, 6.00} -> 500e6. user 2 (control): pre {1.00, 1.00} ->
    // 100e6; post {2.00, 2.00} -> 200e6. did = (500-150) - (200-100) = 250e6
    writeEvents(dir, Seq(
      (1L, 1L, "2024-01-01 09:00:00", 1.00), (2L, 1L, "2024-01-02 09:00:00", 2.00),
      (3L, 1L, "2024-01-03 09:00:00", 4.00), (4L, 1L, "2024-01-04 09:00:00", 6.00),
      (5L, 2L, "2024-01-01 09:00:00", 1.00), (6L, 2L, "2024-01-02 09:00:00", 1.00),
      (7L, 2L, "2024-01-03 09:00:00", 2.00), (8L, 2L, "2024-01-04 09:00:00", 2.00)))
    val r = SparkEntry.queries("did1_diff_in_diff")(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (2L, 2L, 2L, 2L))
    assert((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ==
      (150000000L, 500000000L, 100000000L, 200000000L), s"got $r")
    assert(r.getLong(8) == 250000000L)
  }

  test("did1: an empty cell guards the estimate to NULL") {
    val dir = tmpDir("did1b")
    // only a treated user: every control cell is empty
    writeEvents(dir, Seq(
      (1L, 1L, "2024-01-01 09:00:00", 1.00), (2L, 1L, "2024-01-04 09:00:00", 2.00)))
    val r = SparkEntry.queries("did1_diff_in_diff")(spark, dir).collect()(0)
    assert(r.isNullAt(6) && r.isNullAt(7) && r.isNullAt(8), s"got $r")
  }

  // ── mm4 ──────────────────────────────────────────────────────────────────

  test("mm4: identical payloads pair at Hamming 0; a one-byte edit stays <= 2") {
    val dir = tmpDir("mm4a")
    val base = ("the quick brown fox jumps over the lazy dog. " * 80).trim // ~3.6 KB
    // byte 60 sits inside one stripe (stride ~ 150 for this length): the
    // edit perturbs exactly one base64 quad -> one stripe -> <= 2 sig bits
    // (each stripe contributes two digest-parity bits)
    val edited = base.substring(0, 60) + "X" + base.substring(61)
    val other = ("entirely different content with no shared structure! " * 80).trim
    writeDocs(dir, Seq((1L, base), (2L, base), (3L, edited), (4L, other)))
    val rows = SparkEntry.queries("mm4_phash_neardup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(rows((1L, 2L)) == 0, s"identical payloads not at Hamming 0: $rows")
    assert(rows.contains(1L -> 3L) && rows(1L -> 3L) <= 2,
      s"one-byte edit drifted past 2 bits: $rows")
    assert(!rows.keySet.exists { case (a, b) => b == 4L || a == 4L },
      s"unrelated payload paired: $rows")
  }

  test("mm4: the banded join equals the literal quadratic Hamming filter") {
    // pigeonhole: 3 bit flips cannot touch all 4 bands, so candidates from
    // shared 16-bit bands lose NO qualifying pair — proven here by running
    // the quadratic filter over the same signatures on testdata
    val sf = "/root/testdata/sf0.001"
    val sig = MultimodalQueries.phashSignatures(Tables.documents(spark, sf))
    val quad = sig.as("p").join(sig.as("q"), col("p.doc_id") < col("q.doc_id"))
      .select(col("p.doc_id").as("a"), col("q.doc_id").as("b"),
        bit_count(col("p.sig").bitwiseXOR(col("q.sig"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val banded = SparkEntry.queries("mm4_phash_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == quad, s"banded ${banded.size} vs quadratic ${quad.size}")
  }
}
