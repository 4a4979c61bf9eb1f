package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Wave 15 — privacy mechanisms, crawl scheduling, association mining,
  * and the ANN recall audit.
  *
  *  - pa3: t-closeness — pa1 (k-anonymity) counts group sizes, pa2
  *    (l-diversity) counts distinct sensitive values; pa3 measures how far
  *    each quasi-identifier group's SENSITIVE DISTRIBUTION sits from the
  *    global one (total-variation distance, the t-closeness metric for
  *    nominal attributes) — a group can be k-anonymous AND l-diverse yet
  *    still leak via a skewed sensitive mix. Exact integer ppm arithmetic.
  *  - dp1: differentially-private count release via the GEOMETRIC MECHANISM
  *    (Ghosh–Roughgarden–Sundararajan; the discrete mechanism class the
  *    2020 US Census used): noise = X − Y with X, Y iid Geometric(1/2)
  *    read off the trailing-zero count of independent md5 buckets — a
  *    two-sided geometric (discrete Laplace) with ε = ln 2, computed in
  *    pure integer arithmetic so both engines agree bit-for-bit.
  *  - url4: politeness-aware crawl frontier — one fetch per domain per
  *    wave (wave = the URL's quality rank within its domain), the
  *    scheduling shape every polite crawler emits; composes url1's
  *    canonicalization and url2's dedup, bounded by url3's cap device.
  *  - fm2: Apriori 3-itemset step — fi1 mines frequent pairs; fm2 extends
  *    them to triples with the Apriori prune (every sub-pair of a candidate
  *    triple must itself be frequent) applied as three equi-joins BEFORE
  *    the support count, the candidate-pruning idea that makes association
  *    mining feasible at scale.
  *  - ann2: ANN recall audit — recall@5 of the single-probe IVF search
  *    (sim2's plan) against the exact global top-5 (sim1's plan), per
  *    query and exact: the eval metric every ANN deployment publishes.
  */
object Wave15Queries {

  // ── shared arithmetic devices ─────────────────────────────────────────

  /** Trailing-zero count of a 16-bit bucket (0 → 16): P(tz = k) = 2^-(k+1),
    * i.e. tz ~ Geometric(1/2) — the noise primitive for dp1. Pure modular
    * arithmetic (no engine-specific bit intrinsics), identical CASE in
    * both engines.
    */
  private def tzCol(c: Column): Column =
    (15 to 0 by -1).foldLeft(lit(16L)) { (acc, k) =>
      when(c % (1L << (k + 1)) === (1L << k), k.toLong).otherwise(acc)
    }

  private def tzSql(e: String): String = {
    val whens = (0 to 15).map { k =>
      s"WHEN ($e) % ${1L << (k + 1)} = ${1L << k} THEN ${k}"
    }.mkString(" ")
    s"(CASE $whens ELSE 16 END)"
  }

  /** DuckDB twin of graft.operators.Sampling.bucket (the house 16-bit
    * md5 device — same spelling as Wave13.h16/MlQueries.h16).
    */
  private def h16(e: String): String =
    s"""((strpos('0123456789abcdef', substr(md5($e), 1, 1)) - 1) * 4096
       | + (strpos('0123456789abcdef', substr(md5($e), 2, 1)) - 1) * 256
       | + (strpos('0123456789abcdef', substr(md5($e), 3, 1)) - 1) * 16
       | + (strpos('0123456789abcdef', substr(md5($e), 4, 1)) - 1))""".stripMargin

  def all: Seq[Q] = Seq(

    // ── PA3: t-closeness audit. For each (lang, length-bucket) QI group,
    // t = total-variation distance between the group's source distribution
    // and the corpus-global one; output is the histogram of t in 0.1-wide
    // buckets with the rows exposed at each level. EXACT integer: every
    // per-source term |cnt_gs·N − cnt_s·n_g| shares the denominator
    // 2·n_g·N, so the sum is one integer numerator and ONE truncating
    // division yields t in ppm (products pass int64 at sf10 → decimal(38)/
    // HUGEINT). Plan: two corpus-keyed aggs (group×source, group), the
    // |groups|×|sources| grid is a broadcast cross join — the data-sized
    // stage is the aggs; everything after is O(groups · sources) rows.
    Q("pa3_t_closeness",
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM documents),
        |gs AS (SELECT source, CAST(count(*) AS BIGINT) AS cs
        |       FROM documents GROUP BY 1),
        |g AS (SELECT lang, n_chars // 200 AS len_bucket,
        |             CAST(count(*) AS BIGINT) AS ng
        |      FROM documents GROUP BY 1, 2),
        |gc AS (SELECT lang, n_chars // 200 AS len_bucket, source,
        |              CAST(count(*) AS BIGINT) AS cgs
        |       FROM documents GROUP BY 1, 2, 3),
        |grid AS (SELECT g.lang, g.len_bucket, g.ng, gs.cs, nn,
        |                coalesce(gc.cgs, 0) AS cgs
        |         FROM g CROSS JOIN gs CROSS JOIN n
        |         LEFT JOIN gc ON gc.lang = g.lang
        |                     AND gc.len_bucket = g.len_bucket
        |                     AND gc.source = gs.source),
        |t AS (SELECT lang, len_bucket, ng,
        |        CAST((sum(abs(CAST(cgs AS HUGEINT) * nn
        |                      - CAST(cs AS HUGEINT) * ng)) * 1000000)
        |             // (2 * CAST(ng AS HUGEINT) * max(nn)) AS BIGINT) AS t_ppm
        |      FROM grid GROUP BY 1, 2, 3)
        |SELECT t_ppm // 100000 AS t_bucket,
        |       CAST(count(*) AS BIGINT) AS n_groups,
        |       CAST(sum(ng) AS BIGINT) AS n_rows
        |FROM t GROUP BY 1 ORDER BY t_bucket""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val n = docs.agg(count(lit(1)).as("nn"))
      val gs = docs.groupBy("source").agg(count(lit(1)).as("cs"))
      val g = docs.groupBy(col("lang"), expr("n_chars div 200").as("len_bucket"))
        .agg(count(lit(1)).as("ng"))
      val gc = docs
        .groupBy(col("lang"), expr("n_chars div 200").as("len_bucket"), col("source"))
        .agg(count(lit(1)).as("cgs"))
      val grid = g.crossJoin(broadcast(gs)).crossJoin(broadcast(n))
        .join(gc.withColumnsRenamed(Map(
            "lang" -> "c_lang", "len_bucket" -> "c_len", "source" -> "c_src")),
          col("c_lang") === col("lang") && col("c_len") === col("len_bucket")
            && col("c_src") === col("source"), "left")
        .select(col("lang"), col("len_bucket"), col("ng"), col("cs"), col("nn"),
          coalesce(col("cgs"), lit(0L)).as("cgs"))
      val t = grid.groupBy("lang", "len_bucket", "ng")
        .agg(expr(
          """cast((sum(abs(cast(cgs as decimal(38,0)) * nn
            |              - cast(cs as decimal(38,0)) * ng)) * 1000000)
            |     div (2 * cast(ng as decimal(38,0)) * max(nn)) as bigint)
            |""".stripMargin.replaceAll("\n", " ")).as("t_ppm"))
      t.groupBy(expr("t_ppm div 100000").as("t_bucket"))
        .agg(count(lit(1)).as("n_groups"), sum("ng").cast("long").as("n_rows"))
        .orderBy("t_bucket")
    },

    // ── DP1: ε = ln 2 differentially-private per-language count release
    // (geometric mechanism). noise = tz(u_x) − tz(u_y) with u_x/u_y
    // INDEPENDENT 16-bit md5 buckets keyed on the release id + group key:
    // tz ~ Geom(1/2), and the difference of two iid geometrics IS the
    // two-sided geometric P(k) ∝ 2^-|k| — the exact discrete-Laplace
    // mechanism for sensitivity-1 counts (tail truncated at 16, mass
    // 2^-16 ≈ 1.5e-5, documented bias bound). Deterministic: the "draw"
    // is a pure function of the group key, so release replay is
    // idempotent — and both engines compute the identical integers.
    // Plan: one data-sized count agg; the mechanism is a per-row
    // projection over |groups| rows. True counts are emitted beside the
    // release because this pack row is the mechanism's AUDIT (the
    // noise/released columns alone are what a real release ships).
    Q("dp1_geometric_release",
      s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS true_n
         |           FROM documents GROUP BY 1),
         |u AS (SELECT lang, true_n,
         |        ${h16("'dp1x|' || lang")} AS ux,
         |        ${h16("'dp1y|' || lang")} AS uy
         |      FROM c),
         |z AS (SELECT lang, true_n,
         |        ${tzSql("ux")} - ${tzSql("uy")} AS noise
         |      FROM u)
         |SELECT lang, true_n, CAST(noise AS BIGINT) AS noise,
         |       CAST(true_n + noise AS BIGINT) AS released_n
         |FROM z ORDER BY lang""".stripMargin) { (s, d) =>
      val ux = graft.operators.Sampling.bucket(concat(lit("dp1x|"), col("lang")))
        .cast("long")
      val uy = graft.operators.Sampling.bucket(concat(lit("dp1y|"), col("lang")))
        .cast("long")
      val noise = (tzCol(ux) - tzCol(uy)).as("noise")
      Tables.documents(s, d)
        .groupBy("lang").agg(count(lit(1)).as("true_n"))
        .select(col("lang"), col("true_n"), noise,
          (col("true_n") + tzCol(ux) - tzCol(uy)).cast("long").as("released_n"))
        .orderBy("lang")
    },

    // ── URL4: politeness-aware crawl frontier. After url1 canonicalization
    // and url2's first-wins dedup, each domain's URLs are quality-ranked
    // (n_chars desc, doc_id asc) and the rank IS the crawl wave — a polite
    // crawler fetches at most one URL per domain per wave, so wave w's
    // size is the number of domains with ≥ w URLs left (the frontier
    // drain curve). Ranks are produced by the bounded TopKAggregator
    // (url3's device, K = 64): the shuffle carries O(domains × 64)
    // rank-carrying rows, never O(urls) — the oracle's row_number window
    // would sort a hot domain through one task at 100 TB. Output: per-wave
    // URL count and fetched chars for the first 64 waves.
    Q("url4_crawl_frontier",
      s"""WITH ${Wave13Queries.urlCanonSqlCtes},
         |k AS (SELECT canon, min(doc_id) AS doc_id FROM c GROUP BY 1),
         |kd AS (SELECT c.domain, c.doc_id, c.n_chars
         |       FROM c JOIN k ON k.doc_id = c.doc_id),
         |r AS (SELECT domain, n_chars,
         |        row_number() OVER (PARTITION BY domain
         |                           ORDER BY n_chars DESC, doc_id) AS wave
         |      FROM kd)
         |SELECT wave, CAST(count(*) AS BIGINT) AS n_urls,
         |       CAST(sum(n_chars) AS BIGINT) AS fetched_chars
         |FROM r WHERE wave <= 64 GROUP BY 1 ORDER BY wave""".stripMargin) { (s, d) =>
      val c = Wave13Queries.canonicalDocs(Tables.documents(s, d))
      val keep = c.groupBy("canon").agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val kd = c.join(keep, Seq("doc_id"), "left_semi")
      val waves = kd.groupBy("domain")
        .agg(graft.functions.TopKAggregator.topK(64)(
          col("n_chars").cast("double"), col("doc_id")).as("top"))
        .select(col("domain"), posexplode(col("top")))
        // the aggregator's array is (score desc, id asc)-sorted, so the
        // position is exactly the oracle's row_number; per-row cast back
        // to long is exact (n_chars ≪ 2^53) so the sum stays integer
        .select((col("pos") + 1).cast("long").as("wave"),
          col("col.score").cast("long").as("chars"))
      waves.groupBy("wave")
        .agg(count(lit(1)).as("n_urls"), sum("chars").cast("long").as("fetched_chars"))
        .orderBy("wave")
    },

    // ── FM2: Apriori 3-itemset step over CUSTOMER baskets (fi1's pass
    // extended one level). Baskets = per-customer distinct part sets,
    // bot-guard cap 60 (pinned in the oracle); frequent pairs = support ≥
    // 3. A triple is COUNTED only if all three sub-pairs are frequent —
    // the Apriori downward-closure prune, applied as three equi-joins
    // INSIDE the candidate join pipeline, so the (basket × basket ×
    // basket) explosion never materializes beyond frequent-pair incidence:
    // candidate volume is bounded by Σ_c |frequent pairs in c|·cap, not
    // |basket|³. All supports exact integers; output is every triple with
    // support ≥ 3 under a total order.
    Q("fm2_frequent_triples",
      """WITH b AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |sz AS (SELECT c, count(*) AS n FROM b GROUP BY 1),
        |ok AS (SELECT c FROM sz WHERE n <= 60),
        |bb AS (SELECT b.c, b.p FROM b JOIN ok USING (c)),
        |pr AS (SELECT x.p AS pa, y.p AS pb, CAST(count(*) AS BIGINT) AS s
        |       FROM bb x JOIN bb y ON x.c = y.c AND x.p < y.p GROUP BY 1, 2),
        |fp AS (SELECT pa, pb FROM pr WHERE s >= 3),
        |tr AS (SELECT x.p AS pa, y.p AS pb, z.p AS pc,
        |              CAST(count(*) AS BIGINT) AS support
        |       FROM bb x
        |       JOIN bb y ON x.c = y.c AND x.p < y.p
        |       JOIN fp f1 ON f1.pa = x.p AND f1.pb = y.p
        |       JOIN bb z ON y.c = z.c AND y.p < z.p
        |       JOIN fp f2 ON f2.pa = x.p AND f2.pb = z.p
        |       JOIN fp f3 ON f3.pa = y.p AND f3.pb = z.p
        |       GROUP BY 1, 2, 3)
        |SELECT pa, pb, pc, support FROM tr WHERE support >= 3
        |ORDER BY support DESC, pa, pb, pc""".stripMargin) { (s, d) =>
      // Baskets as per-customer SORTED DISTINCT ARRAYS (fi1's device, cap
      // 60): the capped collector dedups (c, p) map-side and bounds
      // aggregation state at O(cap), so the join's incidence rows reach the
      // basket grain through ONE c-keyed exchange — the former spelling
      // paid a (c,p)-distinct exchange, a size-count exchange, a semi-join
      // and a bb⋈bb SELF-JOIN (Σ|basket|² rows through pair-keyed
      // shuffles). Pair and triple generation is now a narrow in-row
      // explode over the sorted array: O(cap²) pairs per basket, each
      // carrying the strictly-after-pb remainder slice for the third item.
      val baskets = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("c"))
        .agg(graft.functions.CappedCollectSet.sortedSetCapped(60)(
          col("l_partkey")).as("ps"))
        .filter(size(col("ps")) <= 60)
        // EXPLICIT generative-stage parallelism: the basket table is tiny
        // in BYTES (≤60-long arrays) but each row explodes into O(cap²)
        // pair rows below — AQE's byte-based coalescing saw ~8 MB at
        // sf0.1, folded the agg exchange to 2 partitions, and the whole
        // 19M-row pair generation + partial agg ran on 2 cores (measured:
        // the entire +4 s regression of the first rewrite; a hash(c)
        // repartition was silently REMOVED as redundant against the agg's
        // own exchange, so this one is keyless round-robin — user counts
        // are never coalesced). Sized to the session's core budget, not a
        // local constant: per-task generation is |baskets|·cap²/cores, and
        // the pair count's own exchange stays data-adaptive downstream.
        .repartition(s.sparkContext.defaultParallelism)
      // pair incidence: one row per (basket, pa<pb) via two CODEGEN'D
      // generators (fi1's device — a nested higher-order transform/slice
      // spelling was measured 5× SLOWER here: HOFs are interpreted and
      // allocate per-pair array slices). Generate preserves the basket
      // agg's hash(c) partitioning, so everything below runs c-local.
      val items = baskets.select(col("c"), explode(col("ps")).as("pa"), col("ps"))
      val pairs = items
        .select(col("c"), col("pa"), explode(col("ps")).as("pb"))
        .filter(col("pa") < col("pb"))
      // the c-keyed basket exchange and the (pa, pb) count exchange are the
      // only two data-sized shuffles — the latter is Apriori's pass 2
      // itself (10.4M near-distinct pairs at sf0.1; the cap bounds it at
      // O(|baskets|·cap²) at every scale)
      val pr = pairs.groupBy("pa", "pb").agg(count(lit(1)).as("s"))
      val fp = pr.filter(col("s") >= 3).select("pa", "pb")
      // Triple support via downward closure: support(pa,pb,pc) ≥ 3 implies
      // EVERY sub-pair is frequent, so any generation rule that (a) emits
      // each within-basket triple at most once and (b) covers all triples
      // whose sub-pairs are frequent yields the identical ≥3-filtered
      // output (the old f2/f3 joins were performance devices, not
      // semantics). Rule used here: a triple row per basket pair of
      // FREQUENT-pair incidences sharing (c, pa) with pb < pc. fp travels
      // as an explicit broadcast — the frequent-itemset table fitting in
      // memory IS Apriori's operating contract (min-support is the knob
      // that keeps it bounded at any corpus size; sf0.1: 4,385 pairs), and
      // the static planner cannot see that 10.1M-row pr shrinks to 4k
      // under the support filter, so left to stats it sort-merges the full
      // 10.4M-row incidence stream against it (measured: that sort is the
      // whole regression). Frequent-pair incidence is probed at the ITEM
      // grain (|bb| = 518k rows at sf0.1, never the 10.4M pair stream —
      // re-exploding pairs for the probe measured +4 s): broadcast-join fp
      // on the first item, then `array_contains` checks the second against
      // the basket's sorted array in place — map-side throughout. The
      // surviving-incidence self-join pays one (c, pa)-keyed exchange of
      // 13k rows (sf0.1) — noise; fpInc is persisted scratch (rebuilt from
      // parquet every run) so its build runs once, not once per self-join
      // side.
      val fpInc = graft.CacheRegistry.track(
        items.join(broadcast(fp), Seq("pa"))
          .filter(array_contains(col("ps"), col("pb")))
          .select(col("c"), col("pa"), col("pb"))
          .persist())
      val tr = fpInc.as("x")
        .join(fpInc.as("y"),
          col("x.c") === col("y.c") && col("x.pa") === col("y.pa") &&
            col("x.pb") < col("y.pb"))
        .select(col("x.pa").as("pa"), col("x.pb").as("pb"), col("y.pb").as("pc"))
        .groupBy(col("pa"), col("pb"), col("pc"))
        .agg(count(lit(1)).as("support"))
      tr.filter(col("support") >= 3)
        .select(col("pa"), col("pb"), col("pc"), col("support"))
        .orderBy(col("support").desc, col("pa"), col("pb"), col("pc"))
    },

    // ── ANN2: IVF recall audit — per query vector, recall@5 of the
    // single-probe IVF search (sim2's same-cluster plan) against the
    // exact global top-5 (sim1's brute-force plan): the published metric
    // of every ANN index. Both top-5 sets use the pack's deterministic
    // ranking (rounded cosine, id tie-break) so the intersection is
    // exact; recall is integer ppm. Plan: sim1's broadcast-queries scan ×
    // sim2's pruned scan, then a |queries|·k-row join — the eval is as
    // cheap as the searches it audits.
    Q("ann2_recall_eval",
      s"""WITH ex AS (${SimilarityQueries.cosSql(sameLabelOnly = false, k = 5)}),
         |iv AS (${SimilarityQueries.cosSql(sameLabelOnly = true, k = 5)}),
         |hit AS (SELECT ex.qid,
         |               CAST(count(iv.nid) AS BIGINT) AS n_hit
         |        FROM ex LEFT JOIN iv ON iv.qid = ex.qid AND iv.nid = ex.nid
         |        GROUP BY 1)
         |SELECT qid, n_hit, (n_hit * 1000000) // 5 AS recall_ppm
         |FROM hit ORDER BY qid""".stripMargin) { (s, d) =>
      val ex = SimilarityQueries.topkCos(s, d, sameLabelOnly = false, k = 5)
        .select(col("qid"), col("nid"))
      val iv = SimilarityQueries.topkCos(s, d, sameLabelOnly = true, k = 5)
        .select(col("qid").as("iqid"), col("nid").as("inid"))
      ex.join(iv, col("iqid") === col("qid") && col("inid") === col("nid"), "left")
        .groupBy("qid").agg(count(col("inid")).as("n_hit"))
        .select(col("qid"), col("n_hit"),
          expr("(n_hit * 1000000L) div 5").as("recall_ppm"))
        .orderBy("qid")
    }
  )
}
