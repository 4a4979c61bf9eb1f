package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.text.Urls

/** Wave 13 — URL-level corpus curation + the dd8 exact-substring referee.
  *
  * The URL family is the CommonCrawl curation step that runs BEFORE any
  * text dedup (reference analogue: the reference keys everything on
  * account/date ids, `main.py`'s composite keys — a web corpus keys on
  * canonical URLs and registrable domains instead):
  *  - url1: raw URL → canonical URL + host + registrable domain. Pure
  *    per-row string/regexp projections ([[graft.text.Urls]]) — zero
  *    shuffle at any corpus size; the 100 TB form runs inside the scan.
  *  - url2: exact dedup keyed on the CANONICAL url (d1's first-wins
  *    contract lifted to the canonical key): one keyed agg + one
  *    equi-join on the canonical string — the URL-keyed twin of dd1.
  *  - url3: per-registrable-domain corpus cap (cap1's device keyed by
  *    domain, quality-ranked): a bounded TopKAggregator keeps the shuffle
  *    at O(domains × K), never O(docs) — the window form would sort every
  *    row of a hot domain through one task.
  *
  * The corpus has no URL column, so a deterministic raw URL is derived
  * in-plan from (doc_id, source, lang) — same derivation in the oracle —
  * exercising every canonicalization axis: scheme case, www/m subdomains,
  * default + explicit ports, trailing slashes, utm tracking params,
  * unsorted query params, fragments, and multi-label public suffixes
  * (co.uk / com.cn).
  *
  * dd8b is the referee directive (VERDICT r13 #6b): dd8's stride-4 window
  * sampling is an approximation — two documents sharing a long literal
  * run at stride-misaligned offsets can share NO sampled window. The
  * referee recomputes the EXACT pair set (stride-4 windows of one side
  * joined to stride-1 windows of the other — complete for every shared
  * run ≥ 33 chars) over a bounded deterministic sample, and reports the
  * measured miss: dd5c's sampled-referee pattern applied to dd8.
  */
object Wave13Queries {

  /** DuckDB twin of graft.operators.Sampling.bucket (MlQueries.h16). */
  private def h16(e: String): String =
    s"""((strpos('0123456789abcdef', substr(md5($e), 1, 1)) - 1) * 4096
       | + (strpos('0123456789abcdef', substr(md5($e), 2, 1)) - 1) * 256
       | + (strpos('0123456789abcdef', substr(md5($e), 3, 1)) - 1) * 16
       | + (strpos('0123456789abcdef', substr(md5($e), 4, 1)) - 1))""".stripMargin

  /** Deterministic raw-URL derivation from (doc_id, source, lang) — the
    * Spark spelling of [[urlSqlCte]]. Residue classes are chosen so that
    * canonicalization genuinely MERGES variants (scheme case, www, :80,
    * utm params, param order, trailing slash, fragment all vary faster
    * than the canonical key), and distinct documents still collide on the
    * canonical key at driver-corpus density (url2 is non-vacuous at
    * sf0.01).
    */
  def rawUrls(docs: DataFrame): DataFrame = {
    val k = col("doc_id")
    val scheme = when(k % 3 === 0, "http").when(k % 3 === 1, "HTTPS")
      .otherwise("Http")
    val www = when(k % 2 === 0, "www.").otherwise("")
    val sub = when(k % 11 === 0, "m.").otherwise("")
    val tld = when(col("lang") === "en", "co.uk").when(col("lang") === "de", "de")
      .when(col("lang") === "fr", "fr").when(col("lang") === "es", "es")
      .when(col("lang") === "zh", "com.cn").otherwise("com")
    val port = when(k % 4 === 0, ":80").when(k % 4 === 1, ":8080").otherwise("")
    val path = concat(lit("/p/"), (k % 3).cast("string"),
      when(k % 6 === 0, "/").otherwise(""))
    val qs = when(k % 4 === 0, concat(lit("?utm_source=feed&id="), (k % 2).cast("string")))
      .when(k % 4 === 1, concat(lit("?id="), (k % 2).cast("string"), lit("&utm_campaign=q&r=1")))
      .when(k % 4 === 2, concat(lit("?r=1&id="), (k % 2).cast("string")))
      .otherwise("")
    val frag = when(k % 6 === 0, "#top").otherwise("")
    docs.select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
      concat(scheme, lit("://"), www, sub, col("source"), lit("-"),
        (k % 5).cast("string"), lit("."), tld, port, path, qs, frag).as("url"))
  }

  /** Canonicalized document-URL table: (doc_id, source, lang, n_chars,
    * url, canon, host, domain). All per-row projections — zero shuffle.
    */
  def canonicalDocs(docs: DataFrame): DataFrame = {
    val u = rawUrls(docs)
    val h = Urls.host(col("url"))
    u.select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
      col("url"), Urls.canonicalize(col("url")).as("canon"),
      h.as("host"), Urls.registrableDomain(h).as("domain"))
  }

  /** The oracle's spelling of [[rawUrls]]: CTE `u`. (`||` sits at line
    * ENDS throughout this file's SQL: these fragments pass through up to
    * three nested stripMargin applications, and a line-leading `||` loses
    * a pipe per pass.)
    */
  private val urlSqlCte: String =
    """u AS (SELECT doc_id, source, lang, n_chars,
      |  (CASE doc_id % 3 WHEN 0 THEN 'http' WHEN 1 THEN 'HTTPS' ELSE 'Http' END) ||
      |  '://' ||
      |  (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END) ||
      |  (CASE WHEN doc_id % 11 = 0 THEN 'm.' ELSE '' END) ||
      |  source || '-' || CAST(doc_id % 5 AS VARCHAR) || '.' ||
      |  (CASE lang WHEN 'en' THEN 'co.uk' WHEN 'de' THEN 'de'
      |             WHEN 'fr' THEN 'fr' WHEN 'es' THEN 'es'
      |             WHEN 'zh' THEN 'com.cn' ELSE 'com' END) ||
      |  (CASE doc_id % 4 WHEN 0 THEN ':80' WHEN 1 THEN ':8080' ELSE '' END) ||
      |  '/p/' || CAST(doc_id % 3 AS VARCHAR) ||
      |  (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END) ||
      |  (CASE doc_id % 4
      |        WHEN 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 2 AS VARCHAR)
      |        WHEN 1 THEN '?id=' || CAST(doc_id % 2 AS VARCHAR) || '&utm_campaign=q&r=1'
      |        WHEN 2 THEN '?r=1&id=' || CAST(doc_id % 2 AS VARCHAR)
      |        ELSE '' END) ||
      |  (CASE WHEN doc_id % 6 = 0 THEN '#top' ELSE '' END) AS url
      |FROM documents)""".stripMargin

  /** The oracle's spelling of [[canonicalDocs]]: CTEs `u` … `c`, with `c`
    * exposing (doc_id, source, lang, n_chars, url, canon, host, domain).
    * Mirrors graft.text.Urls step by step.
    */
  private[queries] val urlCanonSqlCtes: String =
    s"""$urlSqlCte,
       |nf AS (SELECT *, regexp_extract(url, '^([^#]*)', 1) AS nofrag FROM u),
       |pr AS (SELECT *,
       |  lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |  regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1) AS hostport,
       |  regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$$', 1) AS pathq
       |FROM nf),
       |pp AS (SELECT *,
       |  regexp_replace(lower(regexp_extract(hostport, '^([^:]*)', 1)), '^www\\.', '') AS host,
       |  -- DuckDB regexp_extract yields NULL on no-match where Spark
       |  -- yields '' — coalesce the two extractions that can miss
       |  coalesce(regexp_extract(hostport, ':([0-9]+)$$', 1), '') AS prt,
       |  regexp_replace(regexp_extract(pathq, '^([^?]*)', 1), '/+$$', '') AS path0,
       |  coalesce(regexp_extract(pathq, '\\?(.*)$$', 1), '') AS qs
       |FROM pr),
       |cq AS (SELECT *,
       |  CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path_out,
       |  CASE WHEN prt = '' OR (scheme = 'http' AND prt = '80')
       |         OR (scheme = 'https' AND prt = '443')
       |       THEN '' ELSE ':' || prt END AS port_out,
       |  -- coalesce: array_to_string of an EMPTY list is NULL in DuckDB
       |  coalesce(array_to_string(list_sort(list_filter(string_split(qs, '&'),
       |    x -> x <> '' AND NOT regexp_matches(x, '^utm_'))), '&'), '') AS qs_sorted
       |FROM pp),
       |c AS (SELECT doc_id, source, lang, n_chars, url, host,
       |  scheme || '://' || host || port_out || path_out ||
       |    (CASE WHEN qs_sorted = '' THEN '' ELSE '?' || qs_sorted END) AS canon,
       |  CASE WHEN len(string_split(host, '.')) >= 3
       |        AND (string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1])
       |            IN ('co.uk', 'com.cn')
       |       THEN string_split(host, '.')[-3] || '.' || string_split(host, '.')[-2] ||
       |            '.' || string_split(host, '.')[-1]
       |       ELSE string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
       |  END AS domain
       |FROM cq)""".stripMargin

  def all: Seq[Q] = Seq(

    // ── URL1: URL canonicalization + host/registrable-domain extraction.
    // 100 TB: every output column is a codegen'd per-row projection
    // (regexp/string ops, no UDF, no shuffle) — this runs inside the scan
    // stage of whatever consumes it.
    Q("url1_canonicalize",
      s"""WITH $urlCanonSqlCtes
         |SELECT doc_id, url, canon, host, domain FROM c
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      canonicalDocs(Tables.documents(s, d))
        .select("doc_id", "url", "canon", "host", "domain")
        .orderBy("doc_id")
    },

    // ── URL2: canonical-URL exact dedup — first-wins keeper per canonical
    // key (d1's contract on url1's key). One keyed agg + one equi-join,
    // both shuffling on the canonical string; at 100 TB this is dd1's
    // plan with the md5 key replaced by the canonical URL (hash-partition
    // on canon, no skew: a canonical key's multiplicity is its crawl
    // duplication factor, not a power law).
    Q("url2_url_dedup",
      s"""WITH $urlCanonSqlCtes,
         |g AS (SELECT canon, min(doc_id) AS keeper_id FROM c GROUP BY 1)
         |SELECT c.doc_id, g.keeper_id,
         |       CAST(CASE WHEN c.doc_id <> g.keeper_id THEN 1 ELSE 0 END AS INTEGER) AS is_dup
         |FROM c JOIN g USING (canon)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val c = canonicalDocs(Tables.documents(s, d))
      // keeper = min(doc_id) over the canon group as a WINDOW, not an
      // agg + join-back: the join form shuffled the doc table twice (agg
      // input + join probe, non-identical exchanges so no reuse); the
      // window form is ONE canon-keyed exchange with the same hot-key
      // clustering exposure the join had anyway
      val w = org.apache.spark.sql.expressions.Window.partitionBy("canon")
      c.select(col("doc_id"), min(col("doc_id")).over(w).as("keeper_id"))
        .select(col("doc_id"), col("keeper_id"),
          when(col("doc_id") =!= col("keeper_id"), 1).otherwise(0)
            .cast("int").as("is_dup"))
        .orderBy("doc_id")
    },

    // ── URL3: per-registrable-domain corpus cap, quality-ranked — keep
    // the top-3 docs per domain by (n_chars desc, doc_id asc). cap1's
    // bounded TopKAggregator keyed by domain: the shuffle carries
    // O(domains × K) rank-carrying rows, never O(docs) (the row_number
    // window the oracle uses would sort every row of a hot domain
    // through one task at 100 TB).
    Q("url3_domain_cap",
      s"""WITH $urlCanonSqlCtes,
         |r AS (SELECT domain, doc_id, n_chars,
         |        row_number() OVER (PARTITION BY domain
         |                           ORDER BY n_chars DESC, doc_id) AS rn
         |      FROM c)
         |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN rn <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       CAST(sum(CASE WHEN rn <= 3 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
         |FROM r GROUP BY 1 ORDER BY domain""".stripMargin) { (s, d) =>
      val K = 3
      val c = canonicalDocs(Tables.documents(s, d))
      val kept = c
        .select(col("domain"), col("doc_id"), col("n_chars").cast("double").as("score"))
        .groupBy("domain")
        .agg(graft.functions.TopKAggregator.topK(K)(col("score"), col("doc_id"))
          .as("top"))
        .select(explode(col("top.id")).as("doc_id"))
      val keptMass = c.join(broadcast(kept), Seq("doc_id"))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
      c.groupBy("domain").agg(count(lit(1)).as("n_docs"))
        .join(keptMass, Seq("domain"), "left")
        .select(col("domain"), col("n_docs"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("kept_chars"), lit(0L)).cast("long").as("kept_chars"))
        .orderBy("domain")
    },

    // ── DD8B: sampled exact-substring referee for dd8 (dd5c's pattern).
    // dd8 samples 30-char windows at stride 4 from BOTH documents, so a
    // shared literal run detected requires the two documents' window
    // alignments to agree mod 4 — a miss class the production query
    // cannot see. The exact predicate: stride-4 windows of one side
    // joined to stride-1 (every alignment) windows of the other — for
    // any shared run ≥ 33 chars the stride-4 side has a fully-inside
    // window and the stride-1 side holds its exact alignment, so the
    // exact set is COMPLETE for runs ≥ 33 (and includes whatever 30–32
    // char runs align). Both directions unioned, orientation-normalized.
    //
    // Sample frame (bounded, deterministic): the base block doc_id <
    // 2000 — at sf0.01 that is the WHOLE corpus, so the referee is
    // exhaustive there; at scale it is ScaleData's replica 0, which
    // carries planted near-dups at base density — plus a 2% md5-bucket
    // sample (unbiased coverage of the synthesized replicas). n_extra
    // pins soundness (reported ⊆ exact, since a shared stride-4 window
    // is a shared window); n_missed is the measured stride+cap miss.
    // 100 TB: stride-1 windows explode ~30× the text volume but ONLY
    // over the bounded sample; everything else is dd8's own capped plan.
    Q("dd8b_substring_referee",
      s"""WITH smp AS (SELECT doc_id, text FROM documents
         |             WHERE doc_id < 2000 OR ${h16("CAST(doc_id AS VARCHAR)")} < 1310),
         |p4 AS (SELECT doc_id,
         |         unnest(range(1, CAST(length(text) AS BIGINT) - 28, 4)) AS i
         |       FROM smp WHERE length(text) >= 30),
         |w4 AS (SELECT DISTINCT p4.doc_id, substr(m.text, CAST(p4.i AS INTEGER), 30) AS win
         |       FROM p4 JOIN smp m USING (doc_id)),
         |-- rep needs dd8's GLOBAL df cap, but only for windows of SAMPLE
         |-- docs: price df via one linear full-corpus window scan filtered
         |-- to the sample's window set BEFORE aggregating (the
         |-- referee_substr device) — the corpus-wide DISTINCT + pair join
         |-- spelling of the same set out-spilled a 73 GB disk at sf10
         |df AS (SELECT win, count(DISTINCT doc_id) AS df FROM
         |         (SELECT doc_id, substr(text, CAST(i AS INTEGER), 30) AS win
         |          FROM (SELECT doc_id, text,
         |                  unnest(range(1, CAST(length(text) AS BIGINT) - 28, 4)) AS i
         |                FROM documents WHERE length(text) >= 30))
         |       WHERE win IN (SELECT win FROM w4)
         |       GROUP BY win),
         |wcs AS (SELECT w4.doc_id, w4.win FROM w4
         |        JOIN df ON df.win = w4.win AND df.df <= 20),
         |rep AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |        FROM wcs x JOIN wcs y ON x.win = y.win AND x.doc_id < y.doc_id),
         |p1 AS (SELECT doc_id,
         |         unnest(range(1, CAST(length(text) AS BIGINT) - 28, 1)) AS i
         |       FROM smp WHERE length(text) >= 30),
         |w1 AS (SELECT DISTINCT p1.doc_id, substr(m.text, CAST(p1.i AS INTEGER), 30) AS win
         |       FROM p1 JOIN smp m USING (doc_id)),
         |ex AS (SELECT DISTINCT least(x.doc_id, y.doc_id) AS a,
         |                       greatest(x.doc_id, y.doc_id) AS b
         |       FROM w4 x JOIN w1 y ON x.win = y.win AND x.doc_id <> y.doc_id)
         |SELECT (SELECT count(*) FROM smp) AS n_docs_sampled,
         |       (SELECT count(*) FROM ex) AS n_exact,
         |       (SELECT count(*) FROM rep) AS n_reported,
         |       (SELECT count(*) FROM ex e WHERE NOT EXISTS
         |          (SELECT 1 FROM rep r WHERE r.a = e.a AND r.b = e.b)) AS n_missed,
         |       (SELECT count(*) FROM rep r WHERE NOT EXISTS
         |          (SELECT 1 FROM ex e WHERE e.a = r.a AND e.b = r.b)) AS n_extra""".stripMargin) { (s, d) =>
      substringReferee(Tables.documents(s, d),
        AnalyticsQueries.substringPairsCached(s, d))
    }
  )

  /** dd8b's referee core over an explicit document table — factored so the
    * spec can run it on hand fixtures (where the base block covers the
    * whole fixture corpus).
    */
  def substringReferee(docs: DataFrame): DataFrame =
    substringReferee(docs, AnalyticsQueries.substringPairs(docs))

  /** Referee with the production pair stage passed in — the declared query
    * hands dd8's MEMOIZED pair stage here so a bench run pays the window
    * build + inverted-index join once across dd8 and this referee.
    */
  def substringReferee(docs: DataFrame, pairs: DataFrame): DataFrame = {
    // 1310 = (0.02 * Sampling.Buckets).toInt — the 2% md5-bucket sample
    val smp = docs
      .filter(col("doc_id") < 2000 ||
        graft.operators.Sampling.bucket(col("doc_id")) < 1310)
      .select("doc_id", "text")
    val smpIds = smp.select("doc_id")
    val rep = pairs
      .join(smpIds.withColumnRenamed("doc_id", "a"), Seq("a"), "left_semi")
      .join(smpIds.withColumnRenamed("doc_id", "b"), Seq("b"), "left_semi")
      .select("a", "b")
    val w4 = AnalyticsQueries.substringWindows(smp, stride = 4)
    val w1 = AnalyticsQueries.substringWindows(smp, stride = 1)
    val ex = w4.as("x").join(w1.as("y"),
        col("x.win") === col("y.win") && col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("b"))
      .distinct()
    // 1-row aggregates composed by broadcast cross joins (the Wave12
    // device); repeated ex/rep subtrees dedup as ReusedExchange within
    // the single action.
    smp.agg(count(lit(1)).as("n_docs_sampled"))
      .crossJoin(ex.agg(count(lit(1)).as("n_exact")))
      .crossJoin(rep.agg(count(lit(1)).as("n_reported")))
      .crossJoin(ex.join(rep, Seq("a", "b"), "left_anti")
        .agg(count(lit(1)).as("n_missed")))
      .crossJoin(rep.join(ex, Seq("a", "b"), "left_anti")
        .agg(count(lit(1)).as("n_extra")))
  }
}
