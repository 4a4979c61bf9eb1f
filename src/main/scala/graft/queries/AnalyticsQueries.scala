package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Round-6 extensions: graph analytics beyond PageRank, deterministic
  * weighted sampling, histogramming, cohort retention, and substring-level
  * dedup (ExactSubstr-lite). Each is a first-class operator a training-data
  * or product-analytics pipeline runs, with an exact DuckDB oracle.
  *
  * Scale design (100 TB):
  *  - gr2 orients edges by (degree, id) before the wedge join — the
  *    classic bound (Suri & Vassilvitskii, WWW'11): every wedge is
  *    enumerated from its LOWEST-degree endpoint, so per-key join groups
  *    are O(sqrt(m)) on skewed graphs instead of O(max-degree); the
  *    closure check is a left-semi equi-join, never a cartesian.
  *  - sp4 is a top-k by a pure hash-derived priority — TakeOrderedAndProject
  *    (O(k) memory per partition, map-side partial top-k, no global sort).
  *  - h1 is a fixed-bin keyed agg with map-side partials and exact
  *    integer-cents sums (no float-order nondeterminism at any parallelism).
  *  - co1 is two keyed shuffles on the SAME key (user_id) then a low-
  *    cardinality rollup — the join is co-partitioned with the first agg.
  *  - dd8 is an inverted-index self-join on fixed-width character windows
  *    with a document-frequency cap bounding any join group (same scale
  *    guard as dd2's shingle cap).
  */
object AnalyticsQueries {

  def all: Seq[Q] = Seq(

    // ── GR2: per-node triangle counts on the supplier co-purchase graph
    // (suppliers linked when a high-quantity item of each shares an order).
    // Degree orientation makes each triangle discoverable exactly once
    // (rank(a) < rank(b) < rank(c) under (deg, id) order), so the count is
    // wedge-join + semi-join closure — no post-hoc dedup, no cartesian.
    Q("gr2_triangle_count",
      """WITH base AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
        |              FROM lineitem WHERE l_quantity >= 40),
        |e AS (SELECT DISTINCT x.s AS a, y.s AS b
        |      FROM base x JOIN base y ON x.o = y.o AND x.s < y.s),
        |deg AS (SELECT n, count(*) AS d
        |        FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        |dir AS (SELECT CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.a ELSE e.b END AS src,
        |               CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.b ELSE e.a END AS dst
        |        FROM e JOIN deg da ON da.n = e.a JOIN deg db ON db.n = e.b),
        |tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        |        FROM dir e1 JOIN dir e2 ON e1.dst = e2.src
        |        JOIN dir e3 ON e3.src = e1.src AND e3.dst = e2.dst)
        |SELECT n AS node, count(*) AS n_tri
        |FROM (SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
        |      UNION ALL SELECT c FROM tri)
        |GROUP BY 1 ORDER BY n_tri DESC, node LIMIT 20""".stripMargin) { (s, d) =>
      val base = Tables.lineitem(s, d).filter(col("l_quantity") >= 40)
        .select(col("l_orderkey").as("o"), col("l_suppkey").as("s")).distinct()
      val e = base.as("x").join(base.as("y"),
          col("x.o") === col("y.o") && col("x.s") < col("y.s"))
        .select(col("x.s").as("a"), col("y.s").as("b")).distinct()
      val deg = e.select(col("a").as("n")).unionAll(e.select(col("b")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      // orient every edge from the (degree, id)-smaller endpoint: bounds
      // wedge fan-out by O(sqrt m) even on power-law degree skew
      val withDeg = e
        .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
        .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      val flip = struct(col("da"), col("a")) < struct(col("db"), col("b"))
      val dir = withDeg.select(
        when(flip, col("a")).otherwise(col("b")).as("src"),
        when(flip, col("b")).otherwise(col("a")).as("dst"))
      val wedges = dir.as("e1")
        .join(dir.as("e2"), col("e1.dst") === col("e2.src"))
        .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
      val tri = wedges.join(
        dir.select(col("src").as("a"), col("dst").as("c")),
        Seq("a", "c"), "left_semi")
      tri.select(col("a").as("n"))
        .unionAll(tri.select(col("b"))).unionAll(tri.select(col("c")))
        .groupBy("n").agg(count(lit(1)).as("n_tri"))
        .select(col("n").as("node"), col("n_tri"))
        .orderBy(col("n_tri").desc, col("node")).limit(20)
    },

    // ── SP4: deterministic weighted sampling without replacement
    // (Efraimidis-Spirakis A-ES): priority = u^(1/w) with u derived from
    // md5(key) instead of rand(), compared in the equivalent log form
    // ln(u)/w (monotone, avoids pow cancellation near 1). The SAME rows
    // are selected on every run, engine, and partitioning — rand()-based
    // weighted sampling can never hash-match an oracle. Top-k by priority
    // is TakeOrderedAndProject: no global sort at any scale.
    Q("sp4_weighted_sample",
      """WITH b AS (SELECT o_orderkey, o_totalprice,
        |  (strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1) * 4096
        |+ (strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1)) - 1) * 256
        |+ (strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), 3, 1)) - 1) * 16
        |+ (strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), 4, 1)) - 1) AS bkt
        |FROM orders),
        |k AS (SELECT o_orderkey, o_totalprice,
        |             ln((bkt + 0.5) / 65536.0) / o_totalprice AS key FROM b),
        |t AS (SELECT o_orderkey, o_totalprice FROM k
        |      ORDER BY key DESC, o_orderkey LIMIT 20)
        |SELECT o_orderkey, o_totalprice FROM t ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val bkt = conv(substring(md5(col("o_orderkey").cast("string")), 1, 4), 16, 10)
        .cast("int")
      val k = Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"),
        (log((bkt + 0.5) / 65536.0) / col("o_totalprice")).as("key"))
      k.orderBy(col("key").desc, col("o_orderkey")).limit(20)
        .select("o_orderkey", "o_totalprice").orderBy("o_orderkey")
    },

    // ── H1: fixed-width histogram (bin = floor(price/5000)). Fixed bounds
    // make the bin a pure per-row function (no data-dependent min/max pass);
    // sums are EXACT integer cents, so the result is identical at any
    // partition count — float accumulation order can't leak into the hash.
    Q("h1_histogram",
      """SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bucket,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(floor(col("l_extendedprice") / 5000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_cents"))
        .orderBy("bucket")
    },

    // ── CO1: cohort retention — cohort = a user's first active day, cells
    // = distinct users active at each day offset. Two shuffles on user_id
    // (min-day agg, then the join back is co-partitioned) + one low-
    // cardinality rollup; the standard product-analytics retention matrix.
    Q("co1_retention_cohorts",
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort FROM ev GROUP BY 1)
        |SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_day,
        |       datediff('day', c.cohort, ev.day) AS offset_days,
        |       count(DISTINCT ev.user_id) AS n_users
        |FROM ev JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val c = ev.groupBy("user_id").agg(min(col("day")).as("cohort"))
      ev.join(c, "user_id")
        .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
          datediff(col("day"), col("cohort")).as("offset_days"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_day", "offset_days")
    },

    // ── DD8: substring-level near-dup (ExactSubstr-lite, after Lee et al.
    // 2022 "Deduplicating Training Data Makes Language Models Better"):
    // documents sharing any 30-char window sampled at stride 4 (detects
    // any shared literal run ≥ 33 chars). Inverted index on the window
    // with a document-frequency cap (≤20) so no join group is unbounded —
    // boilerplate windows shared by everything never fan out. The full
    // suffix-array method needs no Spark changes: same index shape,
    // windows replaced by suffix ranks.
    Q("dd8_substring_dup",
      """WITH p AS (SELECT doc_id,
        |             unnest(range(1, CAST(length(text) AS BIGINT) - 28, 4)) AS i
        |           FROM documents WHERE length(text) >= 30),
        |w AS (SELECT DISTINCT p.doc_id, substr(d.text, CAST(p.i AS INTEGER), 30) AS win
        |      FROM p JOIN documents d USING (doc_id)),
        |cap AS (SELECT win FROM w GROUP BY win HAVING count(*) <= 20),
        |wc AS (SELECT doc_id, win FROM w JOIN cap USING (win))
        |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |FROM wc x JOIN wc y ON x.win = y.win AND x.doc_id < y.doc_id
        |ORDER BY a, b""".stripMargin) { (s, d) =>
      val w = Tables.documents(s, d).filter(length(col("text")) >= 30)
        .select(col("doc_id"),
          explode(sequence(lit(1), length(col("text")) - 29, lit(4))).as("i"))
        .join(Tables.documents(s, d).select(col("doc_id"), col("text")), "doc_id")
        .select(col("doc_id"), expr("substring(text, i, 30)").as("win"))
        .distinct()
      val capped = w.groupBy("win").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 20).select("win")
      val wc = w.join(capped, Seq("win"), "left_semi")
      wc.as("x").join(wc.as("y"),
          col("x.win") === col("y.win") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct().orderBy("a", "b")
    }
  )
}
