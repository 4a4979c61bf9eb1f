package graft

import org.apache.spark.sql.functions._

/** Wave-10 fixtures: dd11 catching an engulfed quote dd2's Jaccard misses
  * (the story test runs BOTH), pm1's null/separated/empty-side behavior on
  * deterministic permutations, and rbo1's identical/disjoint ranking
  * anchors with a BigInt replay of the geometric term arithmetic.
  */
class Wave10Spec extends SparkSpec {

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

  private def writeLineitem(dir: String,
      rows: Seq[(Long, Long, Double, String)]): Unit = {
    import spark.implicits._
    rows.toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_shipdate")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  // ── dd11 ─────────────────────────────────────────────────────────────────

  test("dd11: an engulfed short doc is flagged where Jaccard misses it") {
    val dir = tmpDir("dd11a")
    // long doc = 10 tokens (8 shingles); short doc = its first 5 tokens
    // (3 shingles, ALL inside the long one): containment 1.0, but
    // jaccard 3/8 = 0.375 << 0.8 -> dd2 reports NOTHING
    val long10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val short5 = (1 to 5).map(i => s"w$i").mkString(" ")
    writeDocs(dir, Seq((1L, "en", long10, 10L), (2L, "en", short5, 5L)))
    val dd11 = SparkEntry.queries("dd11_containment")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(dd11 == Seq((1L, 2L, 3L, 8L, 3L, 1000000L)), s"got $dd11")
    val dd2 = SparkEntry.queries("dd2_ngram_jaccard")(spark, dir).collect()
    assert(dd2.isEmpty, s"Jaccard should miss the engulfed doc: ${dd2.toSeq}")
  }

  test("dd11: low containment stays out") {
    val dir = tmpDir("dd11b")
    // docs share exactly one of their 3 shingles: containment 1/3
    writeDocs(dir, Seq(
      (1L, "en", "a b c x1 x2", 9L), (2L, "en", "a b c y1 y2", 9L)))
    // shingles doc1: {a b c, b c x1, c x1 x2}; doc2: {a b c, b c y1, c y1 y2}
    val out = SparkEntry.queries("dd11_containment")(spark, dir).collect()
    assert(out.isEmpty, s"got ${out.toSeq}")
  }

  // ── pm1 ──────────────────────────────────────────────────────────────────

  test("pm1: identical groups give a null effect and a large p") {
    val dir = tmpDir("pm1a")
    // every doc the same length: observed gap 0, every valid permutation
    // is >= 0-extreme -> p near 1
    writeDocs(dir, (1L to 24L).map(i =>
      (i, if (i % 2 == 0) "en" else "de", "x", 100L)))
    val r = SparkEntry.queries("pm1_permutation_test")(spark, dir).collect()(0)
    assert(r.getLong(2) == 0L, s"observed gap must be 0: $r")
    assert(r.getLong(4) > 500000L, s"null effect must give large p: $r")
  }

  test("pm1: a strongly separated pair gives a small p") {
    val dir = tmpDir("pm1b")
    // en docs 1000 chars, de docs 10 chars, 12 each: relabeling can
    // essentially never reproduce the gap
    writeDocs(dir, (1L to 12L).map(i => (i, "en", "x", 1000L))
      ++ (13L to 24L).map(i => (i, "de", "x", 10L)))
    val r = SparkEntry.queries("pm1_permutation_test")(spark, dir).collect()(0)
    assert(r.getLong(0) == 12L && r.getLong(1) == 12L, s"got $r")
    assert(r.getLong(4) < 200000L, s"separated groups must give small p: $r")
  }

  test("pm1: an empty side guards to NULL") {
    val dir = tmpDir("pm1c")
    writeDocs(dir, (1L to 6L).map(i => (i, "en", "x", 100L)))
    val r = SparkEntry.queries("pm1_permutation_test")(spark, dir).collect()(0)
    assert(r.getLong(1) == 0L && r.isNullAt(3) && r.isNullAt(4), s"got $r")
  }

  // ── rbo1 ─────────────────────────────────────────────────────────────────

  /** The query's per-depth arithmetic on BigInt: term_d = (overlap_d ·
    * 9^d · 1e6) div (d · 10^d), rbo = (Σ terms) div 9.
    */
  private def rboExpected(overlapAt: Int => Long): Long = {
    val terms = (1 to 20).map { dd =>
      (BigInt(overlapAt(dd)) * BigInt(9).pow(dd) * 1000000) /
        (BigInt(dd) * BigInt(10).pow(dd))
    }
    (terms.sum / 9).toLong
  }

  test("rbo1: identical rankings score the full geometric mass") {
    val dir = tmpDir("rbo1a")
    // both years rank parts (1, 2, 3) by revenue 300 > 200 > 100
    val rows = for {
      (yr, ok0) <- Seq(("2000", 0L), ("2001", 100L))
      (p, rev) <- Seq((1L, 300.0), (2L, 200.0), (3L, 100.0))
    } yield (ok0 + p, p, rev, s"$yr-06-01")
    writeLineitem(dir, rows)
    val r = SparkEntry.queries("rbo1_rank_overlap")(spark, dir).collect()(0)
    assert(r.getLong(0) == 3L, s"got $r")
    assert(r.getLong(1) == rboExpected(dd => math.min(dd.toLong, 3L)), s"got $r")
  }

  test("rbo1: disjoint rankings score zero") {
    val dir = tmpDir("rbo1b")
    val rows = Seq((1L, 1L, 100.0, "2001-06-01"), (2L, 2L, 90.0, "2001-06-01"),
      (3L, 11L, 100.0, "2000-06-01"), (4L, 12L, 90.0, "2000-06-01"))
    writeLineitem(dir, rows)
    val r = SparkEntry.queries("rbo1_rank_overlap")(spark, dir).collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L, s"got $r")
  }

  test("rbo1: a head swap hurts less than a tail-deep divergence helps") {
    val dir = tmpDir("rbo1c")
    // y2 ranks (1,2,3); y1 ranks (2,1,3) — top-2 swapped but same sets:
    // overlap_1 = 0, overlap_d>=2 = min(d,3): strictly less than identical
    val rows = Seq(
      (1L, 1L, 300.0, "2001-06-01"), (2L, 2L, 200.0, "2001-06-01"),
      (3L, 3L, 100.0, "2001-06-01"),
      (4L, 2L, 300.0, "2000-06-01"), (5L, 1L, 200.0, "2000-06-01"),
      (6L, 3L, 100.0, "2000-06-01"))
    writeLineitem(dir, rows)
    val r = SparkEntry.queries("rbo1_rank_overlap")(spark, dir).collect()(0)
    val expect = rboExpected(dd => if (dd == 1) 0L else math.min(dd.toLong, 3L))
    assert(r.getLong(1) == expect, s"got $r vs $expect")
    assert(r.getLong(1) < rboExpected(dd => math.min(dd.toLong, 3L)), s"got $r")
  }
}
