package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** Round-12 extensions, wave 10: dd11 containment dedup (the asymmetric
  * near-SUPERSET detector Jaccard structurally misses), pm1 a deterministic
  * permutation test (closing the resampling-inference pair started by ci1's
  * jackknife), and rbo1 rank-biased overlap (the top-weighted similarity of
  * two rankings — what rk1's churn counts can't read).
  *
  * Determinism contracts: integer ppm/micro with truncating division
  * (per-cell truncation where denominators differ — mi1's class); md5
  * bucket parity for permutation assignment (sp1's device, pinned in the
  * oracles); every ordering total.
  *
  * Scale design (100 TB):
  *  - dd11 rides the SAME memoized inverted-index pair table as dd2/dd6
  *    (df-capped join groups, one build per session) — containment is a
  *    different normalization of the same intersection counts, so the
  *    marginal cost of adding it to a dedup pipeline is one projection.
  *  - pm1 computes all 64 permutation replicas in ONE corpus scan (a
  *    narrow 64× explode — each row carries only (perm, side, n_chars)),
  *    then one keyed agg to 64 rows; the observed statistic is a 1-row
  *    broadcast and the comparison is exact cross-multiplication.
  *  - rbo1 reduces each year to a 20-row TakeOrdered ranking; everything
  *    after runs on the ≤40-key joined table × a 20-row depth grid.
  */
object Wave10Queries {

  def all: Seq[Q] = Seq(

    // ── DD11: containment near-supersets — dd2's Jaccard is SYMMETRIC, so
    // a short document quoted wholesale inside a long one scores low
    // (|A∩B|/|A∪B| is dragged down by the superset's size) and survives
    // Jaccard dedup; containment C = |A∩B|/min(|A|,|B|) reads "the smaller
    // document is 90%+ inside the larger" regardless of the size gap —
    // the quote/boilerplate-envelope detector an LLM curation pipeline
    // runs NEXT TO Jaccard (Lee et al. 2022's superset class; dd8 finds
    // shared SUBSTRINGS, dd11 flags whole-document engulfment). Exact
    // integer: cont_ppm = inter·1e6 div min(sza, szb) ≥ 900000. Rides the
    // SAME memoized inverted-index pair table as dd2/dd6 (df-capped
    // shingle join groups), so the pipeline pays one projection for it.
    Q("dd11_containment",
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |         toks[r.range+1] || ' ' || toks[r.range+2] || ' ' || toks[r.range+3] AS sh
        |       FROM t, range(1024) r WHERE r.range < len(toks) - 2),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |pairs AS (SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS inter
        |          FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id GROUP BY 1, 2)
        |SELECT a, b, inter, CAST(sa.sz AS BIGINT) AS sza, CAST(sb.sz AS BIGINT) AS szb,
        |       (inter * 1000000) // least(sa.sz, sb.sz) AS cont_ppm
        |FROM pairs JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
        |WHERE (inter * 1000000) // least(sa.sz, sb.sz) >= 900000
        |ORDER BY a, b""".stripMargin) { (s, d) =>
      // plain LONG arithmetic: inter is bounded by shingles/doc (<= 1022 on
      // any corpus — the 1024-token cap), so inter*1e6 <= ~1e9, nowhere
      // near 2^63; the decimal form cost 11x dd2's scan of the SAME cached
      // pair table at sf10 (7.4 s vs 0.7 s — 25M per-row decimal multiplies)
      TextQueries.allPairsDf(s, d)
        .select(col("a"), col("b"), col("inter").cast("long").as("inter"),
          col("sza").cast("long").as("sza"), col("szb").cast("long").as("szb"),
          expr("(inter * 1000000L) div least(sza, szb)").as("cont_ppm"))
        .filter(col("cont_ppm") >= 900000L)
        .orderBy("a", "b")
    },

    // ── PM1: deterministic permutation test — is the en/non-en mean-length
    // gap larger than chance relabeling produces? The resampling cousin of
    // wt1 (which assumes the z approximation) and the inference partner of
    // ci1's jackknife: 64 deterministic label permutations (side = md5
    // parity of doc_id#perm — sp1's device, pinned in the oracle), each
    // replica's |mean gap| compared against the observed gap by EXACT
    // cross-multiplication on the common-denominator form |S_a·n_b −
    // S_b·n_a| (no rational ever materializes; the cross products ride
    // decimal(38,0)/HUGEINT — the envelope passes 38 digits near ~1e8 docs
    // per side, past which the comparison must drop to truncated ppm).
    // p = (1 + #extreme) / (B + 1), the standard add-one estimate. ONE
    // corpus scan computes all 64 replicas (narrow 64× explode, each row
    // (perm, side, value)); an empty side → NULL symmetrically.
    Q("pm1_permutation_test", {
      val parity = (k: String) =>
        s"(strpos('0123456789abcdef', substr(md5($k), 1, 1)) - 1) % 2"
      s"""WITH obs AS (SELECT CAST(sum(CASE WHEN lang = 'en' THEN n_chars ELSE 0 END) AS HUGEINT) AS s_a,
         |              CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |              CAST(sum(CASE WHEN lang <> 'en' THEN n_chars ELSE 0 END) AS HUGEINT) AS s_b,
         |              CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
         |            FROM documents),
         |pe AS (SELECT p.range AS perm,
         |         ${parity("CAST(d.doc_id AS VARCHAR) || '#' || CAST(p.range AS VARCHAR)")} AS side,
         |         d.n_chars
         |       FROM documents d, range(64) p),
         |pr AS (SELECT perm,
         |         CAST(sum(CASE WHEN side = 0 THEN n_chars ELSE 0 END) AS HUGEINT) AS s_pa,
         |         CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pa,
         |         CAST(sum(CASE WHEN side = 1 THEN n_chars ELSE 0 END) AS HUGEINT) AS s_pb,
         |         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pb
         |       FROM pe GROUP BY 1),
         |x AS (SELECT CAST(count(*) AS BIGINT) AS n_extreme
         |      FROM pr CROSS JOIN obs
         |      WHERE n_pa > 0 AND n_pb > 0
         |        AND abs(s_pa * n_pb - s_pb * n_pa) * (CAST(obs.n_a AS HUGEINT) * obs.n_b)
         |            >= abs(obs.s_a * obs.n_b - obs.s_b * obs.n_a) * (CAST(n_pa AS HUGEINT) * n_pb))
         |SELECT obs.n_a, obs.n_b,
         |       CAST(abs(obs.s_a * obs.n_b - obs.s_b * obs.n_a) AS BIGINT) AS d_obs_scaled,
         |       CASE WHEN obs.n_a = 0 OR obs.n_b = 0 THEN NULL ELSE x.n_extreme END AS n_extreme,
         |       CASE WHEN obs.n_a = 0 OR obs.n_b = 0 THEN NULL
         |            ELSE CAST(((x.n_extreme + 1) * 1000000) // 65 AS BIGINT) END AS p_ppm
         |FROM obs CROSS JOIN x""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val obs = docs.agg(
        sum(when(col("lang") === "en", col("n_chars")).otherwise(0L))
          .cast("decimal(38,0)").as("s_a"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).cast("long").as("n_a"),
        sum(when(col("lang") =!= "en", col("n_chars")).otherwise(0L))
          .cast("decimal(38,0)").as("s_b"),
        sum(when(col("lang") =!= "en", 1L).otherwise(0L)).cast("long").as("n_b"))
      val pe = docs.select(col("doc_id"), col("n_chars"))
        .crossJoin(broadcast(s.range(0, 64).select(col("id").as("perm"))))
        .select(col("perm"),
          // first md5 hex digit parity — Sampling.bucket's conv device
          // (Spark has no strpos; the oracle spells the same digit lookup)
          (conv(substring(md5(concat_ws("#", col("doc_id").cast("string"),
            col("perm").cast("string"))), 1, 1), 16, 10).cast("long") % 2)
            .as("side"),
          col("n_chars"))
      val pr = pe.groupBy("perm").agg(
        sum(when(col("side") === 0, col("n_chars")).otherwise(0L))
          .cast("decimal(38,0)").as("s_pa"),
        sum(when(col("side") === 0, 1L).otherwise(0L)).cast("long").as("n_pa"),
        sum(when(col("side") === 1, col("n_chars")).otherwise(0L))
          .cast("decimal(38,0)").as("s_pb"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).cast("long").as("n_pb"))
      val x = pr.crossJoin(broadcast(obs))
        .filter(col("n_pa") > 0L && col("n_pb") > 0L)
        .filter(expr("abs(s_pa * n_pb - s_pb * n_pa) * (cast(n_a as decimal(38,0)) * n_b)" +
          " >= abs(s_a * n_b - s_b * n_a) * (cast(n_pa as decimal(38,0)) * n_pb)"))
        .agg(count(lit(1)).cast("long").as("n_extreme"))
      obs.crossJoin(broadcast(x))
        .select(col("n_a"), col("n_b"),
          expr("cast(abs(s_a * n_b - s_b * n_a) as bigint)").as("d_obs_scaled"),
          when(col("n_a") === 0L || col("n_b") === 0L, lit(null).cast("long"))
            .otherwise(col("n_extreme")).as("n_extreme"),
          when(col("n_a") === 0L || col("n_b") === 0L, lit(null).cast("long"))
            .otherwise(expr("cast(((n_extreme + 1) * 1000000) div 65 as bigint)"))
            .as("p_ppm"))
    },

    // ── RBO1: rank-biased overlap (p = 0.9, depth 20) between this year's
    // and last year's top-20 revenue parts — the TOP-WEIGHTED ranking
    // similarity rk1's churn counts can't read (rk1 says how many names
    // moved; RBO says how much the ranking changed WHERE IT MATTERS, with
    // geometric depth discounting — Webber et al. 2010). Exact integers:
    // term_d = (overlap_d · 9^d · 1e6) div (d · 10^d) truncated per depth
    // (mi1's per-cell class; 9^20·1e6 ≈ 1.2e25 rides decimal/HUGEINT),
    // rbo_min_micro = (Σ term_d) div 9 — the (1−p)/p factor as a final
    // integer division. Both rankings are TakeOrdered-20 under the total
    // (revenue desc, partkey) order; overlap_d counts keys with both ranks
    // ≤ d over the ≤40-key full-outer join × 20-row depth grid — all
    // bounded tables after the two keyed apportioning aggs.
    Q("rbo1_rank_overlap",
      """WITH y AS (SELECT CAST(strftime(l_shipdate, '%Y') AS INT) AS yr,
        |             l_partkey AS k,
        |             CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        |           FROM lineitem),
        |mx AS (SELECT max(yr) AS y2 FROM y),
        |ra AS (SELECT k, row_number() OVER (ORDER BY sum(c) DESC, k) AS r
        |       FROM y, mx WHERE yr = y2 GROUP BY k ORDER BY r LIMIT 20),
        |rb AS (SELECT k, row_number() OVER (ORDER BY sum(c) DESC, k) AS r
        |       FROM y, mx WHERE yr = y2 - 1 GROUP BY k ORDER BY r LIMIT 20),
        |j AS (SELECT coalesce(ra.k, rb.k) AS k, ra.r AS r_a, rb.r AS r_b
        |      FROM ra FULL OUTER JOIN rb ON ra.k = rb.k),
        |pw(d, p9, p10) AS (VALUES
        |  (1, 9, 10),
        |  (2, 81, 100),
        |  (3, 729, 1000),
        |  (4, 6561, 10000),
        |  (5, 59049, 100000),
        |  (6, 531441, 1000000),
        |  (7, 4782969, 10000000),
        |  (8, 43046721, 100000000),
        |  (9, 387420489, 1000000000),
        |  (10, 3486784401, 10000000000),
        |  (11, 31381059609, 100000000000),
        |  (12, 282429536481, 1000000000000),
        |  (13, 2541865828329, 10000000000000),
        |  (14, 22876792454961, 100000000000000),
        |  (15, 205891132094649, 1000000000000000),
        |  (16, 1853020188851841, 10000000000000000),
        |  (17, 16677181699666569, 100000000000000000),
        |  (18, 150094635296999121, 1000000000000000000),
        |  (19, 1350851717672992089, 10000000000000000000),
        |  (20, 12157665459056928801, 100000000000000000000)),
        |ov AS (SELECT pw.d, CAST(count(j.k) AS BIGINT) AS overlap
        |       FROM pw LEFT JOIN j ON j.r_a <= pw.d AND j.r_b <= pw.d
        |       GROUP BY 1),
        |tm AS (SELECT ov.d, ov.overlap,
        |         CAST((CAST(ov.overlap AS HUGEINT) * CAST(pw.p9 AS HUGEINT) * 1000000)
        |           // (CAST(ov.d AS HUGEINT) * CAST(pw.p10 AS HUGEINT)) AS BIGINT) AS term_micro
        |       FROM ov JOIN pw ON pw.d = ov.d)
        |SELECT CAST(sum(CASE WHEN d = 20 THEN overlap END) AS BIGINT) AS overlap_20,
        |       CAST(sum(term_micro) // 9 AS BIGINT) AS rbo_min_micro
        |FROM tm""".stripMargin) { (s, d) =>
      val y = Tables.lineitem(s, d).select(
        year(col("l_shipdate")).as("yr"), col("l_partkey").as("k"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("c"))
      val mx = y.agg(max("yr").as("y2"))
      def top(cond: Column): DataFrame = y.crossJoin(broadcast(mx)).filter(cond)
        .groupBy("k").agg(sum("c").as("rev"))
        .orderBy(col("rev").desc, col("k")).limit(20)
        .select(col("k"), row_number().over(
          Window.orderBy(col("rev").desc, col("k"))).cast("long").as("r"))
      val ra = top(col("yr") === col("y2"))
        .select(col("k"), col("r").as("r_a"))
      val rb = top(col("yr") === col("y2") - 1)
        .select(col("k").as("kb"), col("r").as("r_b"))
      val j = ra.join(rb, col("k") === col("kb"), "full_outer")
        .select(coalesce(col("k"), col("kb")).as("k"), col("r_a"), col("r_b"))
      // exact 9^d / 10^d as a 20-row LITERAL grid (double power() loses
      // exactness past 2^53 — 9^20 ~ 1.2e19 would round)
      import s.implicits._
      val grid = (1 to 20).map(dd =>
        (dd.toLong, BigInt(9).pow(dd).toString, BigInt(10).pow(dd).toString))
        .toDF("d", "p9", "p10")
        .select(col("d"), col("p9").cast("decimal(38,0)").as("p9"),
          col("p10").cast("decimal(38,0)").as("p10"))
      val ov = grid.join(j,
          col("r_a") <= col("d") && col("r_b") <= col("d"), "left")
        .groupBy("d", "p9", "p10").agg(count(col("k")).cast("long").as("overlap"))
      val tm2 = ov.select(col("d"), col("overlap"),
        expr("cast((cast(overlap as decimal(38,0)) * p9 * 1000000)" +
          " div (cast(d as decimal(38,0)) * p10) as bigint)").as("term_micro"))
      tm2.agg(
        sum(when(col("d") === 20, col("overlap"))).cast("long").as("overlap_20"),
        expr("cast(sum(term_micro) div 9 as bigint)").as("rbo_min_micro"))
    }
  )
}
