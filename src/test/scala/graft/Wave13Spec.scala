package graft

import org.apache.spark.sql.functions._
import graft.text.Urls

/** Wave-13 fixtures: hand URL-canonicalization cases for graft.text.Urls
  * (every axis of the contract: scheme/host case, www, default vs explicit
  * ports, trailing slashes, utm params, param sorting, fragments,
  * multi-label public suffixes), a planted canonical-collision corpus for
  * url2, a single-domain cap fixture for url3, and an alignment-designed
  * corpus for dd8b where stride-4 window sampling provably misses pairs
  * the exact referee finds.
  */
class Wave13Spec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    CacheRegistry.trackPath(
      java.nio.file.Files.createTempDirectory(prefix).toString)

  // (doc_id, source, lang, text)
  private def writeDocs(dir: String,
      rows: Seq[(Long, String, String, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "lang", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  // ── graft.text.Urls ──────────────────────────────────────────────────────

  private def canonOf(urls: String*): Seq[(String, String, String)] = {
    import spark.implicits._
    urls.toDF("url")
      .select(Urls.canonicalize(col("url")).as("canon"),
        Urls.host(col("url")).as("host"),
        Urls.registrableDomain(Urls.host(col("url"))).as("domain"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq
  }

  test("Urls: case, www, default port, utm drop, param sort, trailing " +
      "slash, fragment") {
    assert(canonOf("HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag") ==
      Seq(("http://example.com/a/b?a=1&b=2", "example.com", "example.com")))
  }

  test("Urls: https default port stripped; non-www subdomain kept; co.uk " +
      "registrable domain takes three labels") {
    assert(canonOf("https://cdn.Shop.co.uk:443/p") ==
      Seq(("https://cdn.shop.co.uk/p", "cdn.shop.co.uk", "shop.co.uk")))
  }

  test("Urls: explicit non-default port kept; root path normalizes to /") {
    assert(canonOf("http://site.de:8080/") ==
      Seq(("http://site.de:8080/", "site.de", "site.de")))
  }

  test("Urls: :443 on http is NOT a default port; all-utm query drops " +
      "entirely; empty path becomes /") {
    assert(canonOf("http://h.org:443/x", "https://x.com?utm_a=1") ==
      Seq(("http://h.org:443/x", "h.org", "h.org"),
        ("https://x.com/", "x.com", "x.com")))
  }

  test("Urls: deep subdomain under a multi-label suffix keeps eTLD+1; " +
      "double trailing slash collapses") {
    assert(canonOf("Http://a.b.news.com.cn/a//?z=1&y=2#x") ==
      Seq(("http://a.b.news.com.cn/a?y=2&z=1", "a.b.news.com.cn",
        "news.com.cn")))
  }

  test("Urls: single-label host passes through registrableDomain") {
    assert(canonOf("http://localhost:9000/q") ==
      Seq(("http://localhost:9000/q", "localhost", "localhost")))
  }

  // ── url2: canonical-collision dedup ─────────────────────────────────────

  test("url2: doc_ids 60 apart with the same (source, lang) collide on " +
      "the canonical key; the smaller id is the keeper") {
    val dir = tmpDir("url2fx")
    // canonical key classes are (is-multiple-of-11, %5, %4, %3) × (source,
    // lang): 1 and 61 agree on all residues (diff 60) and neither is a
    // multiple of 11 → same canonical; 2 differs (%4, %3)
    writeDocs(dir, Seq(
      (1L, "s", "en", "a" * 40),
      (61L, "s", "en", "b" * 40),
      (2L, "s", "en", "c" * 40)))
    val out = SparkEntry.queries("url2_url_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq((1L, 1L, 0), (2L, 2L, 0), (61L, 1L, 1)),
      s"got ${out.toSeq}")
  }

  // ── url3: per-domain quality cap ─────────────────────────────────────────

  test("url3: five docs on one registrable domain keep the top-3 by " +
      "n_chars desc") {
    val dir = tmpDir("url3fx")
    // same source + lang + doc_id%5=0 → one domain 's-0.co.uk'; lengths
    // 50,40,30,60,35 → kept top-3 = 60+50+40
    writeDocs(dir, Seq(
      (0L, "s", "en", "a" * 50),
      (5L, "s", "en", "b" * 40),
      (10L, "s", "en", "c" * 30),
      (15L, "s", "en", "d" * 60),
      (20L, "s", "en", "e" * 35)))
    val out = SparkEntry.queries("url3_domain_cap")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("s-0.co.uk", 5L, 3L, 150L)), s"got ${out.toSeq}")
  }

  // ── dd8b: the stride-miss class, caught by the exact referee ────────────

  test("dd8b: stride-aligned shared run is reported; stride-misaligned " +
      "runs are missed by dd8 and recovered by the exact referee") {
    val dir = tmpDir("dd8bfx")
    // A 40-char shared literal run R (> the 33-char exact-detection
    // threshold). A/B carry R at position 1 (window alignments agree mod
    // 4 → dd8 reports A-B); C carries it at position 3 and D at position
    // 2 (fully-inside stride-4 window offsets: C ≡ 2, D ≡ 3 (mod 4), and
    // A/B ≡ 0 — pairwise disjoint with each other and with A/B except
    // A-B). All 6 pairs share R, so the exact side finds all 6.
    val R = "0123456789abcdefghijklmnopqrstuvwxyzABCD" // 40 chars
    writeDocs(dir, Seq(
      (1L, "s", "en", R + "-tailAAAAAAAAAAAA"),
      (2L, "s", "en", R + "-tailBBBBBBBBBBBB"),
      (3L, "s", "en", "xy" + R + "-tailCCCCCCCCCC"),
      (4L, "s", "en", "z" + R + "-tailDDDDDDDDDDD")))
    // dd8 itself reports exactly the aligned pair
    val rep = SparkEntry.queries("dd8_substring_dup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rep.toSeq == Seq((1L, 2L)), s"dd8 reported ${rep.toSeq}")
    // the referee sees 6 exact pairs, 1 reported, 5 missed, 0 unsound
    val out = SparkEntry.queries("dd8b_substring_referee")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((4L, 6L, 1L, 5L, 0L)), s"got ${r}")
  }

  test("dd8b soundness invariant on testdata: reported ⊆ exact (n_extra " +
      "= 0) and the count identity n_exact = n_reported + n_missed holds") {
    val r = SparkEntry.queries("dd8b_substring_referee")(
      spark, "/root/testdata/sf0.001").collect().head
    assert(r.getLong(4) == 0L, s"n_extra = ${r.getLong(4)}")
    assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
      s"identity broken: ${r}")
  }
}
