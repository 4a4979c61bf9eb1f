package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}
import graft.operators.GlobalIds

/** Round-13 extensions, wave 12: gr4 per-node clustering coefficient (the
  * local-density readout beside gr2's global triangle count), llr1 Dunning
  * log-likelihood keyword extraction (the G² "what words characterize this
  * source" statistic corpus-curation reports lead with), cuped1 CUPED
  * variance-reduction diagnostic (how much pre-period covariate adjustment
  * would shrink an A/B metric's variance), and qn1 within-source quantile
  * normalization (map every source's size distribution onto the pooled
  * one — the batch-effect correction for mixing heterogeneous sources).
  *
  * Determinism contracts: gr4/llr1 are pure integer (coeff/score in
  * ppm/micro via truncating div; llr1's per-cell k·lnMicro terms are
  * t11/mi1's exact-integer-ln class); cuped1 reduces the corpus to five
  * exact decimal(38,0)/HUGEINT sums and only then computes two scalars in
  * IEEE double (cr1's device — identical on both engines because the
  * inputs are identical exact integers); qn1 is integer rank arithmetic
  * end to end.
  *
  * Scale design (100 TB):
  *  - gr4 rides gr2's exact plan (capped co-purchase edges, degree-
  *    oriented wedges) plus one |nodes|-keyed join — no new shuffle class.
  *  - llr1's windows run over the (source, token) AGGREGATE (vocab-sized),
  *    never the corpus (ks1's bounded-window contract); the two margin
  *    tables broadcast.
  *  - cuped1 is one user-keyed agg then a single 1-row reduction.
  *  - qn1 replaces both would-be single-partition rank windows with
  *    GlobalIds (range repartition + O(P) prefix sum); per-source offsets
  *    broadcast (|sources| rows); the normalized value arrives by an
  *    equi-join on pooled rank.
  */
object Wave12Queries {

  /** round(ln(c)·1e6) as BIGINT — both engines evaluate ln on the same
    * exact integer (t11/mi1's contract).
    */
  private def lnMicro(c: Column): Column =
    round(log(c.cast("double")) * 1e6).cast("long")
  private def lnMicroSql(e: String): String =
    s"CAST(round(ln($e) * 1e6) AS BIGINT)"

  def all: Seq[Q] = Seq(

    // ── GR4: per-node local clustering coefficient — gr2 answers "how
    // many triangles does the GRAPH have"; gr4 answers "which NODES sit
    // in dense neighborhoods" (2·tri(v) / deg(v)·(deg(v)−1)), the local-
    // density feature fraud/community pipelines rank on. Same graph cut
    // and capped edge build as gr2 (l_quantity ≥ 40, order fanout ≤ 25,
    // both pinned in the oracle), same degree-oriented wedge plan — the
    // O(√m) fan-out bound — plus ONE |nodes|-keyed degree join; coeff in
    // integer ppm (truncating div; tri ≤ deg²/2 and 2e6·tri stays far
    // under 2^63 for any capped build). Top-20 under the total order
    // (coeff desc, n_tri desc, node).
    Q("gr4_clustering_coeff",
      """WITH base AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
        |              FROM lineitem WHERE l_quantity >= 40),
        |hot AS (SELECT o FROM base GROUP BY o HAVING count(*) > 25),
        |bc AS (SELECT b.o, b.s FROM base b
        |       WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.o = b.o)),
        |e AS MATERIALIZED (SELECT DISTINCT x.s AS a, y.s AS b
        |      FROM bc x JOIN bc y ON x.o = y.o AND x.s < y.s),
        |deg AS MATERIALIZED (SELECT n, CAST(count(*) AS BIGINT) AS d
        |        FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        |dir AS MATERIALIZED (SELECT CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.a ELSE e.b END AS src,
        |               CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.b ELSE e.a END AS dst
        |        FROM e JOIN deg da ON da.n = e.a JOIN deg db ON db.n = e.b),
        |tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        |        FROM dir e1 JOIN dir e2 ON e1.dst = e2.src
        |        JOIN dir e3 ON e3.src = e1.src AND e3.dst = e2.dst),
        |pt AS (SELECT n, CAST(count(*) AS BIGINT) AS n_tri
        |       FROM (SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
        |             UNION ALL SELECT c FROM tri) GROUP BY 1)
        |SELECT deg.n AS node, deg.d AS degree, coalesce(pt.n_tri, 0) AS n_tri,
        |       CAST((2000000 * coalesce(pt.n_tri, 0)) // (deg.d * (deg.d - 1)) AS BIGINT) AS coeff_ppm
        |FROM deg LEFT JOIN pt ON pt.n = deg.n
        |WHERE deg.d >= 2
        |ORDER BY coeff_ppm DESC, n_tri DESC, node LIMIT 20""".stripMargin) { (s, d) =>
      val base = Tables.lineitem(s, d).filter(col("l_quantity") >= 40)
        .select(col("l_orderkey").as("o"), col("l_suppkey").as("s"))
      // the capped collector feeds deg, the orientation join AND (unlike
      // gr2) the final coefficient join; dir feeds both wedge sides and
      // the closing semi-join — NOT persisted: the repeated subtrees are
      // deduped by Catalyst's ReusedExchange (plan-asserted in Wave12Spec;
      // a round-13 sf10 A/B measured explicit persists 20% slower than
      // the reused exchanges)
      val e = AnalyticsQueries.coPurchaseEdges(base, maxOrderFanout = Some(25))
      val deg = e.select(col("a").as("n")).unionAll(e.select(col("b")))
        .groupBy("n").agg(count(lit(1)).cast("long").as("d"))
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
      val perNode = tri.select(col("a").as("n"))
        .unionAll(tri.select(col("b"))).unionAll(tri.select(col("c")))
        .groupBy("n").agg(count(lit(1)).cast("long").as("n_tri"))
      deg.filter(col("d") >= 2)
        .join(perNode, Seq("n"), "left")
        .select(col("n").as("node"), col("d").as("degree"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"),
          expr("cast((2000000 * coalesce(n_tri, 0)) div (d * (d - 1)) as bigint)")
            .as("coeff_ppm"))
        .orderBy(col("coeff_ppm").desc, col("n_tri").desc, col("node"))
        .limit(20)
    },

    // ── LLR1: Dunning log-likelihood keyword extraction — "which tokens
    // CHARACTERIZE each source" via the G² statistic over the 2×2 table
    // (token t in source s vs the rest of the corpus), the standard
    // collocation/keyness test (Dunning 1993) that, unlike raw counts or
    // PMI (t9), neither drowns in stopwords nor blows up on hapaxes.
    // G² = 2·Σ_cells k·ln(kN/RC), computed per cell as the exact-integer
    // combination k·(lnMicro(k)+lnMicro(N)−lnMicro(R)−lnMicro(C)) —
    // ln always evaluates on an exact BIGINT (t11/mi1's contract), and
    // the k·lnMicro products stay under 2^63 for any corpus below ~5e10
    // tokens per margin (documented bound; the margins themselves are
    // exact at any size). Only positively-associated cells survive
    // (k11·N > R·C — the keyword direction), top-5 per source.
    // 100 TB: one corpus-scan keyed agg to (source, token); margins are
    // two rollups of THAT table (one broadcast-sized, one token-keyed);
    // the rank window runs over the vocab-sized aggregate, never the
    // corpus (ks1's bounded-window contract).
    Q("llr1_keywords", {
      val term = (k: String, r: String, c: String) =>
        s"CASE WHEN $k > 0 THEN $k * (${lnMicroSql(k)} + ${lnMicroSql("nn.n")}" +
          s" - ${lnMicroSql(r)} - ${lnMicroSql(c)}) ELSE 0 END"
      s"""WITH t AS (SELECT doc_id, source,
         |             regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
         |tok AS (SELECT source, unnest(toks) AS token FROM t),
         |stc AS (SELECT source, token, CAST(count(*) AS BIGINT) AS k FROM tok GROUP BY 1, 2),
         |rs AS (SELECT source, CAST(sum(k) AS BIGINT) AS r FROM stc GROUP BY 1),
         |ct AS (SELECT token, CAST(sum(k) AS BIGINT) AS c FROM stc GROUP BY 1),
         |nn AS (SELECT CAST(sum(k) AS BIGINT) AS n FROM stc),
         |g AS (SELECT s.source, s.token, s.k AS k11, ct.c - s.k AS k12,
         |             rs.r - s.k AS k21, nn.n - rs.r - ct.c + s.k AS k22,
         |             rs.r, ct.c, nn.n
         |      FROM stc s JOIN rs USING (source) JOIN ct USING (token) CROSS JOIN nn),
         |sc AS (SELECT source, token, k11,
         |         2 * (${term("k11", "r", "c")} + ${term("k12", "(nn.n - r)", "c")}
         |              + ${term("k21", "r", "(nn.n - c)")}
         |              + ${term("k22", "(nn.n - r)", "(nn.n - c)")}) AS g2_micro
         |       FROM g CROSS JOIN nn
         |       WHERE CAST(k11 AS HUGEINT) * nn.n > CAST(r AS HUGEINT) * c),
         |rk AS (SELECT source, token, k11, g2_micro,
         |         row_number() OVER (PARTITION BY source
         |                            ORDER BY g2_micro DESC, token) AS rk
         |       FROM sc)
         |SELECT source, token, k11 AS n_in_source, g2_micro
         |FROM rk WHERE rk <= 5
         |ORDER BY source, g2_micro DESC, token""".stripMargin
    }) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("token"))
      val stc = tok.groupBy("source", "token")
        .agg(count(lit(1)).cast("long").as("k"))
      val rs = stc.groupBy("source").agg(sum("k").cast("long").as("r"))
      val ct = stc.groupBy("token").agg(sum("k").cast("long").as("c"))
      val nn = stc.agg(sum("k").cast("long").as("n"))
      def term(k: Column, r: Column, c: Column, n: Column): Column =
        when(k > 0,
          k * (lnMicro(k) + lnMicro(n) - lnMicro(r) - lnMicro(c)))
          .otherwise(lit(0L))
      val g = stc
        .join(broadcast(rs), "source") // |sources| rows
        .join(ct, "token")             // token-keyed, vocab-sized
        .crossJoin(broadcast(nn))
        .select(col("source"), col("token"), col("k").as("k11"),
          (col("c") - col("k")).as("k12"), (col("r") - col("k")).as("k21"),
          (col("n") - col("r") - col("c") + col("k")).as("k22"),
          col("r"), col("c"), col("n"))
      val sc = g
        .filter(col("k11").cast("decimal(38,0)") * col("n")
          > col("r").cast("decimal(38,0)") * col("c"))
        .select(col("source"), col("token"), col("k11"),
          (lit(2L) * (term(col("k11"), col("r"), col("c"), col("n"))
            + term(col("k12"), col("n") - col("r"), col("c"), col("n"))
            + term(col("k21"), col("r"), col("n") - col("c"), col("n"))
            + term(col("k22"), col("n") - col("r"), col("n") - col("c"), col("n"))))
            .as("g2_micro"))
      val w = Window.partitionBy("source")
        .orderBy(col("g2_micro").desc, col("token"))
      sc.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("source"), col("token"), col("k11").as("n_in_source"),
          col("g2_micro"))
        .orderBy(col("source"), col("g2_micro").desc, col("token"))
    },

    // ── CUPED1: CUPED variance-reduction diagnostic — before running an
    // experiment on revenue, the standard question is "how much variance
    // does pre-period adjustment (CUPED, Deng et al. 2013) buy us?": with
    // θ = cov(pre, post)/var(pre), the adjusted metric post − θ·(pre −
    // mean(pre)) has variance var(post)·(1 − ρ²) — so ρ² IS the
    // reduction. Pre/post = did1's midpoint day split; per-user cents are
    // exact; the five moment sums (n, Σx, Σy, Σxy, Σx², Σy²) accumulate
    // in decimal(38,0)/HUGEINT (mom1's device — exact to ~1e9 users ×
    // ~1e9 cents, documented), and only the final two SCALARS (θ, ρ²)
    // are computed in IEEE double from those identical exact integers
    // (cr1's device) — bit-identical across engines and partitionings.
    // 100 TB: one user-keyed agg, one 1-row reduction; nothing else.
    Q("cuped1_variance_reduction",
      """WITH b AS (SELECT CAST(min(date_diff('day', DATE '1970-01-01',
        |                     CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))) AS BIGINT) AS mn,
        |             CAST(max(date_diff('day', DATE '1970-01-01',
        |                     CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))) AS BIGINT) AS mx
        |           FROM events WHERE event_type = 'purchase'),
        |e AS (SELECT user_id,
        |        CASE WHEN CAST(date_diff('day', DATE '1970-01-01',
        |               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)) AS BIGINT)
        |             >= (b.mn + b.mx + 1) // 2 THEN 1 ELSE 0 END AS post,
        |        CAST(round(value * 100) AS BIGINT) AS cents
        |      FROM events CROSS JOIN b WHERE event_type = 'purchase'),
        |u AS (SELECT user_id,
        |        CAST(sum(CASE WHEN post = 0 THEN cents ELSE 0 END) AS BIGINT) AS x,
        |        CAST(sum(CASE WHEN post = 1 THEN cents ELSE 0 END) AS BIGINT) AS y
        |      FROM e GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |        sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |        sum(CAST(x AS HUGEINT) * y) AS sxy,
        |        sum(CAST(x AS HUGEINT) * x) AS sxx,
        |        sum(CAST(y AS HUGEINT) * y) AS syy
        |      FROM u)
        |SELECT CAST(n AS BIGINT) AS n_users,
        |       CAST(sx AS BIGINT) AS pre_cents, CAST(sy AS BIGINT) AS post_cents,
        |       CASE WHEN n * sxx - sx * sx > 0
        |            THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
        |                       / CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS theta,
        |       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |            THEN CAST(round(CAST(n * sxy - sx * sy AS DOUBLE)
        |                            * CAST(n * sxy - sx * sy AS DOUBLE)
        |                            / (CAST(n * sxx - sx * sx AS DOUBLE)
        |                               * CAST(n * syy - sy * sy AS DOUBLE))
        |                            * 1000000) AS BIGINT) END AS var_reduction_ppm
        |FROM m""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id"),
          datediff(date_trunc("day", col("ts")), lit("1970-01-01").cast("date"))
            .cast("long").as("day"),
          expr("cast(round(value * 100) as bigint)").as("cents"))
      val b = ev.agg(min("day").as("mn"), max("day").as("mx"))
      val u = ev.crossJoin(broadcast(b))
        .withColumn("post",
          when(col("day") >= expr("(mn + mx + 1) div 2"), 1).otherwise(0))
        .groupBy("user_id")
        .agg(sum(when(col("post") === 0, col("cents")).otherwise(0L))
            .cast("long").as("x"),
          sum(when(col("post") === 1, col("cents")).otherwise(0L))
            .cast("long").as("y"))
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val m = u.agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * col("y")).as("sxy"),
        sum(dec(col("x")) * col("x")).as("sxx"),
        sum(dec(col("y")) * col("y")).as("syy"))
      m.select(
        col("n").cast("long").as("n_users"),
        col("sx").cast("long").as("pre_cents"),
        col("sy").cast("long").as("post_cents"),
        when(col("n") * col("sxx") - col("sx") * col("sx") > 0,
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6))
          .as("theta"),
        when((col("n") * col("sxx") - col("sx") * col("sx") > 0)
            && (col("n") * col("syy") - col("sy") * col("sy") > 0),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            * (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / ((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
              * (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))
            * 1e6).cast("long"))
          .as("var_reduction_ppm"))
    },

    // ── QN1: within-source quantile normalization — map every source's
    // n_chars distribution onto the POOLED distribution (each doc's value
    // is replaced by the pooled value at its within-source quantile) —
    // the batch-effect correction applied before mixing heterogeneous
    // sources (microarray lineage; for corpora: a source whose "long"
    // docs are another's "medium" stops skewing length-based filters). Exact
    // integer rank semantics: within-source rank r (1-based, ties broken
    // by doc_id), pooled target rank = ((2r−1)·N) div (2·n_s) + 1 clamped
    // to N (midpoint mapping — both engines replay the same truncating
    // arithmetic; the multiply rides decimal(38,0)/HUGEINT so 1e12-doc
    // corpora can't overflow it).
    // 100 TB: BOTH rank assignments are GlobalIds (range repartition +
    // O(P) prefix sum) — the row_number()-over-everything the oracle
    // writes would be a single-partition sort at corpus scale; per-source
    // offsets and counts broadcast (|sources| rows); the normalized value
    // arrives by ONE equi-join on pooled rank.
    Q("qn1_quantile_normalize",
      """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
        |r AS (SELECT doc_id, source, n_chars,
        |        CAST(row_number() OVER (PARTITION BY source
        |                                ORDER BY n_chars, doc_id) AS BIGINT) AS r,
        |        CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS ns FROM d),
        |p AS (SELECT n_chars AS v,
        |        CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS p FROM d),
        |ix AS (SELECT doc_id, source, n_chars,
        |         least(nn.n, CAST(((2 * r - 1) * CAST(nn.n AS HUGEINT))
        |                          // (2 * ns) AS BIGINT) + 1) AS idx
        |       FROM r CROSS JOIN nn)
        |SELECT i.doc_id, i.source, i.n_chars, p.v AS norm_chars
        |FROM ix i JOIN p ON p.p = i.idx
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "source", "n_chars")
      // within-source ranks WITHOUT a per-source sort task: one global
      // (source, n_chars, doc_id) ranking, minus the source's offset
      val g = GlobalIds.withGlobalId(docs, "g",
        col("source"), col("n_chars"), col("doc_id"))
      val off = g.groupBy("source")
        .agg(min("g").as("off"), count(lit(1)).cast("long").as("ns"))
      val nn = off.agg(sum("ns").cast("long").as("n"))
      val r = g.join(broadcast(off), "source")
        .withColumn("r", col("g") - col("off") + 1)
      val pooled = GlobalIds.withGlobalId(
          docs.select(col("n_chars").as("v"), col("doc_id").as("pid")),
          "p0", col("v"), col("pid"))
        .select((col("p0") + 1).as("p"), col("v"))
      val ix = r.crossJoin(broadcast(nn))
        .select(col("doc_id"), col("source"), col("n_chars"),
          least(col("n"),
            expr("cast(((2 * r - 1) * cast(n as decimal(38,0))) div (2 * ns) as bigint) + 1")
          ).as("idx"))
      ix.join(pooled, col("idx") === col("p"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("v").as("norm_chars"))
        .orderBy("doc_id")
    }
  )
}
