package graft

import org.apache.spark.sql.functions._

/** Wave-15 fixtures: hand-computed t-closeness distances for pa3, an
  * independently-derived (java MessageDigest) geometric-noise pin for dp1,
  * a two-domain frontier for url4's wave assignment, a designed basket set
  * where the Apriori prune kills a candidate triple for fm2, and an
  * embeddings layout where the single-probe IVF search provably misses one
  * global neighbor for ann2.
  */
class Wave15Spec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    CacheRegistry.trackPath(
      java.nio.file.Files.createTempDirectory(prefix).toString)

  private def writeDocs(dir: String,
      rows: Seq[(Long, String, String, String)]): Unit = {
    import spark.implicits._ // (doc_id, lang, source, text)
    rows.toDF("doc_id", "lang", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  // ── pa3 ──────────────────────────────────────────────────────────────────

  test("pa3: hand-computed TVD — a globally-proportional group reads t=0, " +
      "skewed groups land in the right decile") {
    val dir = tmpDir("pa3a")
    // groups (all n_chars < 200 ⇒ len_bucket 0): (en,0)=[A,B], (de,0)=[A,A],
    // (fr,0)=[A,A,A,B]. Global: N=8, A:6, B:2 (3:1 — exactly fr's mix).
    // fr: |3·8−6·4| + |1·8−2·4| = 0 ⇒ t_ppm 0 ⇒ bucket 0.
    // en: |1·8−6·2| + |1·8−2·2| = 8 ⇒ 8e6/(2·2·8) = 250000 ⇒ bucket 2.
    // de: |2·8−6·2| + |0·8−2·2| = 8 ⇒ 250000 ⇒ bucket 2.
    writeDocs(dir, Seq(
      (1L, "en", "A", "x" * 10), (2L, "en", "B", "x" * 10),
      (3L, "de", "A", "x" * 10), (4L, "de", "A", "x" * 10),
      (5L, "fr", "A", "x" * 10), (6L, "fr", "A", "x" * 10),
      (7L, "fr", "A", "x" * 10), (8L, "fr", "B", "x" * 10)))
    val out = SparkEntry.queries("pa3_t_closeness")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((0L, 1L, 4L), (2L, 2L, 4L)))
  }

  // ── dp1 ──────────────────────────────────────────────────────────────────

  test("dp1: noise equals the trailing-zero difference of the md5 buckets, " +
      "derived independently via MessageDigest") {
    val dir = tmpDir("dp1a")
    writeDocs(dir, Seq(
      (1L, "en", "A", "aa"), (2L, "en", "A", "bb"), (3L, "de", "B", "cc")))
    def bucket(sx: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(sx.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      Integer.parseInt(hex, 16)
    }
    def tz(u: Int): Int =
      if (u == 0) 16 else java.lang.Integer.numberOfTrailingZeros(u)
    val expected = Map(
      "en" -> (tz(bucket("dp1x|en")) - tz(bucket("dp1y|en"))),
      "de" -> (tz(bucket("dp1x|de")) - tz(bucket("dp1y|de"))))
    val out = SparkEntry.queries("dp1_geometric_release")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("en") === ((2L, expected("en").toLong, 2L + expected("en"))))
    assert(out("de") === ((1L, expected("de").toLong, 1L + expected("de"))))
    // the mechanism's tail cap keeps every draw inside ±16
    out.values.foreach { case (_, n, _) => assert(n >= -16L && n <= 16L) }
  }

  // ── url4 ─────────────────────────────────────────────────────────────────

  test("url4: one fetch per domain per wave — quality rank orders the " +
      "domain's queue, singleton domains drain in wave 1") {
    val dir = tmpDir("url4a")
    // domain s1-0.de: doc_ids 5/10/25 (≡0 mod 5, same source+lang ⇒ same
    // registrable domain; ports/paths/params differ ⇒ distinct canonicals,
    // so url2's dedup keeps all three). Quality = n_chars: 30 > 20 > 10 ⇒
    // waves 1, 2, 3. domain s2-2.fr: doc_id 7, chars 40 ⇒ wave 1.
    writeDocs(dir, Seq(
      (5L, "de", "s1", "x" * 30), (10L, "de", "s1", "x" * 20),
      (25L, "de", "s1", "x" * 10), (7L, "fr", "s2", "x" * 40)))
    val out = SparkEntry.queries("url4_crawl_frontier")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L, 70L), (2L, 1L, 20L), (3L, 1L, 10L)))
  }

  // ── fm2 ──────────────────────────────────────────────────────────────────

  test("fm2: the Apriori prune admits only triples whose every sub-pair is " +
      "frequent") {
    import spark.implicits._
    val dir = tmpDir("fm2a")
    // customer baskets: c1={1,2,3}, c2={1,2,3}, c3={1,2,3,4}, c4={1,2,4}.
    // pair supports: (1,2)=4, (1,3)=3, (2,3)=3, (1,4)=2, (2,4)=2, (3,4)=1.
    // frequent pairs (≥3): {12, 13, 23}. Candidate (1,2,3): support 3 ⇒ kept.
    // (1,2,4) occurs in c3/c4 but (1,4) is infrequent ⇒ PRUNED before count.
    val baskets = Seq(
      1L -> Seq(1L, 2L, 3L), 2L -> Seq(1L, 2L, 3L),
      3L -> Seq(1L, 2L, 3L, 4L), 4L -> Seq(1L, 2L, 4L))
    val orders = baskets.map { case (c, _) => (c, c) } // orderkey = custkey
    orders.toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    baskets.flatMap { case (c, ps) => ps.map(p => (c, p, 1.0)) }
      .toDF("l_orderkey", "l_partkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("fm2_frequent_triples")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 2L, 3L, 3L)))
  }

  // ── ann2 ─────────────────────────────────────────────────────────────────

  test("ann2: recall@5 reads 4/5 when the closest global neighbor lives in " +
      "an unprobed cluster") {
    import spark.implicits._
    val dir = tmpDir("ann2a")
    // query vec 0 (label 1). Same-label candidates 10..14 at widening
    // angles; vec 20 (label 2) is the TRUE nearest neighbor. Global top-5 =
    // {20, 10, 11, 12, 13}; IVF probe (label 1 only) = {10..14} ⇒ 4 hits.
    def v(x: Double, y: Double): Array[Float] =
      Array(x.toFloat, y.toFloat, 0f, 0f)
    val rows = Seq(
      (0L, v(1, 0), 1),
      (10L, v(1, 0.1), 1), (11L, v(1, 0.2), 1), (12L, v(1, 0.3), 1),
      (13L, v(1, 0.4), 1), (14L, v(1, 0.5), 1),
      (20L, v(1, 0.01), 2))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("ann2_recall_eval")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((0L, 4L, 800000L)))
  }
}
