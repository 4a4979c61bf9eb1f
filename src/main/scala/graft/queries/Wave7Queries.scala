package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** Round-12 extensions, wave 7: the model-quality and graph-quality
  * operators a curation pipeline runs AROUND its classifiers — a
  * precision/recall curve (prc1) and annotator agreement (ka1) for the
  * labeling loop, an exact-order-statistic trimmed mean (tm1) for robust
  * monitoring, a closed-form ridge regression (rg1) and a Naive Bayes
  * train/apply/confusion pass (nb1) as the in-engine model trainers, and
  * partition modularity (gm1) / Adamic–Adar link prediction (lk1)
  * completing the graph family (gr1/gr2/gr3/lp1/hub1/kc1/dd6).
  *
  * Determinism contracts (the StatQueries class):
  *  - every cross-engine value is an exact integer (counts; ppm/milli/
  *    micro via truncating division, negative dividends via the
  *    sign·(abs div d) device so DuckDB's floor `//` and Spark's
  *    truncating `div` agree);
  *  - the only floats are ln on exact integer counts rounded to micro
  *    units identically on both engines (t11/mi1's documented contract);
  *  - wide products ride decimal(38,0)/HUGEINT cast-BEFORE-sum (ams1's
  *    contract).
  *
  * Scale design (100 TB):
  *  - prc1/tm1 collapse the corpus to the distinct-score table in ONE
  *    keyed agg (ks1's plan class); every window runs over that bounded
  *    table (n_chars domain ≤ max doc length), never the corpus.
  *  - ka1 is ONE conditional-agg corpus scan to four cells.
  *  - rg1 collapses events to the day grain in ONE keyed scan, reduces
  *    the day table to eight sufficient statistics, and solves the 3×3
  *    normal equations by Cramer's rule on a single row — the classic
  *    "closed-form GLM at warehouse scale" plan (no gradient rounds, no
  *    driver math).
  *  - nb1's token join keys on (lang, tok) — the model is a TABLE, never
  *    a driver-side object; the class grid multiplies test rows by
  *    |langs| (bounded, ~6); the argmax window partitions per doc over
  *    ≤ |langs| rows.
  *  - gm1/lk1 build edges through the capped collectors (kc1's cap 16 /
  *    gr2's class with cap 25, pinned in the oracles), so pair generation
  *    is O(orders·cap²) narrow work; lk1 runs on the SPARSE co-purchase
  *    cut (l_quantity ≥ 48 — link prediction is vacuous on a
  *    near-complete graph; the ≥ 40 cut's min degree is 53 on 100 nodes)
  *    and additionally caps common-neighbor degree at 50 (hubs carry no
  *    Adamic–Adar signal by construction — 1/ln(deg) → 0 — so the cap is
  *    the scale guard that bounds wedge fan-out at 50²/2 per mid node,
  *    pinned in the oracle).
  */
object Wave7Queries {

  /** round(ln(c)·1e6) as BIGINT — both engines evaluate ln on the same
    * exact integer (t11/mi1's contract).
    */
  private def lnMicro(c: Column): Column =
    round(log(c.cast("double")) * 1e6).cast("long")
  private def lnMicroSql(e: String): String =
    s"CAST(round(ln($e) * 1e6) AS BIGINT)"

  def all: Seq[Q] = Seq(

    // ── PRC1: precision/recall curve for a monotone score — the
    // imbalanced-classification companion to auc1 (one scalar) and cal1
    // (response curve): one row per distinct threshold t = "predict
    // positive when score ≥ t", carrying exact tp/fp and ppm precision/
    // recall. Score: n_chars; positive: lang = 'en' (the house auc1
    // framing). 100 TB: ONE keyed agg collapses the corpus to the
    // distinct-score table; the reverse-cumulative window and the final
    // sort run over that bounded table (ks1's bounded-window contract —
    // n_chars domain ≤ max doc length); totals ride a 1-row broadcast.
    // tp·1e6 rides decimal(38,0)/HUGEINT (passes 2^63 at ~9.2e12 docs).
    Q("prc1_pr_curve",
      """WITH s AS (SELECT n_chars AS score,
        |             CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS pos
        |           FROM documents),
        |g AS (SELECT score, CAST(sum(pos) AS BIGINT) AS np,
        |             CAST(count(*) - sum(pos) AS BIGINT) AS nn
        |      FROM s GROUP BY 1),
        |c AS (SELECT score,
        |        CAST(sum(np) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
        |        CAST(sum(nn) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp,
        |        CAST(sum(np) OVER () AS BIGINT) AS n_pos
        |      FROM g)
        |SELECT score, tp, fp,
        |       CAST((CAST(tp AS HUGEINT) * 1000000) // (tp + fp) AS BIGINT) AS prec_ppm,
        |       CASE WHEN n_pos = 0 THEN NULL
        |            ELSE CAST((CAST(tp AS HUGEINT) * 1000000) // n_pos AS BIGINT) END AS rec_ppm
        |FROM c ORDER BY score DESC""".stripMargin) { (s, d) =>
      val sdf = Tables.documents(s, d).select(col("n_chars").as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      val g = sdf.groupBy("score").agg(sum("pos").cast("long").as("np"),
        (count(lit(1)) - sum("pos")).cast("long").as("nn"))
      val w = Window.orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = g.agg(sum("np").cast("long").as("n_pos"))
      g.withColumn("tp", sum("np").over(w).cast("long"))
        .withColumn("fp", sum("nn").over(w).cast("long"))
        .crossJoin(broadcast(tot))
        .select(col("score"), col("tp"), col("fp"),
          expr("cast((cast(tp as decimal(38,0)) * 1000000) div (tp + fp) as bigint)")
            .as("prec_ppm"),
          when(col("n_pos") === 0L, lit(null).cast("long"))
            .otherwise(expr("cast((cast(tp as decimal(38,0)) * 1000000) div n_pos as bigint)"))
            .as("rec_ppm"))
        .orderBy(col("score").desc)
    },

    // ── TM1: 10% two-sided trimmed mean of document length per language —
    // the robust location estimate os1's MAD flags can't give (os1 says
    // WHICH rows are outliers; tm1 says what the center is once they're
    // gone). EXACT type-1 order statistics without any per-row rank: with
    // k = n div 10 trimmed each side, a distinct value v with inclusive
    // cumulative count cum and multiplicity cnt keeps
    // max(0, min(cum, n−k) − max(cum−cnt, k)) copies — pure integer
    // arithmetic over the ECDF table (qq1's device, made per-group).
    // kept_n = n − 2k ≥ ceil(0.8n) ≥ 1 for every non-empty group, so the
    // terminal division never sees 0. v·kc rides decimal/HUGEINT.
    // 100 TB: ONE keyed agg → |lang|×|distinct n_chars| rows; both windows
    // partition by lang over that bounded table (ks1's contract).
    Q("tm1_trimmed_mean",
      """WITH g AS (SELECT lang, n_chars AS v, CAST(count(*) AS BIGINT) AS cnt
        |           FROM documents GROUP BY 1, 2),
        |c AS (SELECT lang, v, cnt,
        |        CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |        CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
        |      FROM g),
        |k AS (SELECT lang, v, cnt, cum, n, n // 10 AS k FROM c),
        |kept AS (SELECT lang, n, k, n - 2 * k AS kept_n, v,
        |           greatest(CAST(0 AS BIGINT),
        |                    least(cum, n - k) - greatest(cum - cnt, k)) AS kc
        |         FROM k)
        |SELECT lang, max(n) AS n_docs, max(k) AS k_trim, max(kept_n) AS kept_n,
        |       CAST(sum(CAST(v AS HUGEINT) * kc) AS BIGINT) AS trimmed_sum,
        |       CAST((sum(CAST(v AS HUGEINT) * kc) * 1000) // max(kept_n) AS BIGINT) AS tmean_milli
        |FROM kept GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val g = Tables.documents(s, d)
        .groupBy(col("lang"), col("n_chars").as("v"))
        .agg(count(lit(1)).cast("long").as("cnt"))
      val wc = Window.partitionBy("lang").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy("lang")
      g.withColumn("cum", sum("cnt").over(wc).cast("long"))
        .withColumn("n", sum("cnt").over(wn).cast("long"))
        .withColumn("k", expr("n div 10"))
        .select(col("lang"), col("n"), col("k"),
          (col("n") - lit(2L) * col("k")).as("kept_n"), col("v"),
          greatest(lit(0L),
            least(col("cum"), col("n") - col("k"))
              - greatest(col("cum") - col("cnt"), col("k"))).as("kc"))
        .groupBy("lang")
        .agg(max("n").as("n_docs"), max("k").as("k_trim"),
          max("kept_n").as("kept_n"),
          sum(expr("cast(v as decimal(38,0)) * kc")).as("tsum"))
        .select(col("lang"), col("n_docs"), col("k_trim"), col("kept_n"),
          col("tsum").cast("long").as("trimmed_sum"),
          expr("cast((tsum * 1000) div kept_n as bigint)").as("tmean_milli"))
        .orderBy("lang")
    },

    // ── KA1: Cohen's kappa between two heuristic quality annotators —
    // the agreement readout every labeling loop needs before trusting a
    // rule (or a model) as ground truth. Annotator A: n_chars ≥ 500;
    // annotator B: ≥ 80 whitespace tokens (t1's exact token device, so
    // the raters disagree exactly where short-token/long-char docs live).
    // kappa = (po − pe)/(1 − pe) multiplied through: num = n·(n11+n00) −
    // (a1·b1 + a0·b0), den = n² − (a1·b1 + a0·b0) — every term an exact
    // integer in decimal(38,0)/HUGEINT; num can be negative
    // (worse-than-chance agreement) so the ppm travels sign·(abs div d);
    // den = 0 ⟺ a rater is constant (pe = 1) → NULL symmetrically.
    // 100 TB: ONE conditional-agg corpus scan to four cells.
    Q("ka1_cohens_kappa",
      """WITH r AS (SELECT
        |             CAST(CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS BIGINT) AS a,
        |             CAST(CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) >= 80 THEN 1 ELSE 0 END AS BIGINT) AS b
        |           FROM documents),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(a * b) AS BIGINT) AS n11,
        |        CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
        |        CAST(sum((1 - a) * b) AS BIGINT) AS n01,
        |        CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
        |      FROM r),
        |f AS (SELECT n, n11, n10, n01, n00,
        |        CAST(n AS HUGEINT) * (n11 + n00)
        |          - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
        |             + CAST(n01 + n00 AS HUGEINT) * (n10 + n00)) AS num,
        |        CAST(n AS HUGEINT) * n
        |          - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
        |             + CAST(n01 + n00 AS HUGEINT) * (n10 + n00)) AS den
        |      FROM m)
        |SELECT n AS n_docs, n11, n10, n01, n00,
        |       CASE WHEN den = 0 THEN NULL
        |            ELSE CAST(CAST(sign(num) AS BIGINT)
        |                   * ((abs(num) * 1000000) // den) AS BIGINT) END AS kappa_ppm
        |FROM f""".stripMargin) { (s, d) =>
      val r = Tables.documents(s, d).select(
        when(col("n_chars") >= 500L, 1L).otherwise(0L).as("a"),
        when(size(split(trim(col("text")), "\\s+")) >= 80, 1L).otherwise(0L).as("b"))
      r.agg(count(lit(1)).cast("long").as("n"),
          sum(col("a") * col("b")).cast("long").as("n11"),
          sum(col("a") * (lit(1L) - col("b"))).cast("long").as("n10"),
          sum((lit(1L) - col("a")) * col("b")).cast("long").as("n01"),
          sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).cast("long").as("n00"))
        .withColumn("num",
          expr("cast(n as decimal(38,0)) * (n11 + n00)" +
            " - (cast(n11 + n10 as decimal(38,0)) * (n11 + n01)" +
            "    + cast(n01 + n00 as decimal(38,0)) * (n10 + n00))"))
        .withColumn("den",
          expr("cast(n as decimal(38,0)) * n" +
            " - (cast(n11 + n10 as decimal(38,0)) * (n11 + n01)" +
            "    + cast(n01 + n00 as decimal(38,0)) * (n10 + n00))"))
        .select(col("n").as("n_docs"), col("n11"), col("n10"), col("n01"), col("n00"),
          when(col("den") === 0, lit(null).cast("long"))
            .otherwise(expr("cast(cast(sign(num) as bigint)" +
              " * ((abs(num) * 1000000) div den) as bigint)"))
            .as("kappa_ppm"))
    },

    // ── RG1: closed-form ridge regression of daily purchase revenue on
    // (day index, weekend flag) — the in-engine GLM trainer beside ols1's
    // per-group simple regression: TWO features + intercept solved by
    // Cramer's rule on the 3×3 ridge normal equations A+λ·diag(0,1,1),
    // λ = 1 (the intercept is never penalized — standard ridge). With
    // λ > 0 and ≥ 1 day, A' is positive definite (x'A'x = 0 forces
    // x₂ = x₃ = 0 and then n·x₁² = 0), so det > 0 always; the NULL guard
    // is belt-and-braces. Every sufficient statistic and every cofactor
    // is an exact integer in decimal(38,0)/HUGEINT; coefficients emit in
    // MILLI-cents via sign·(abs div d) (milli, not micro: the ×1e3 keeps
    // the det_i product under 38 digits out to a 10-year × sf10-density
    // envelope — det_i ≤ ~1.2e33, ×1e3 = 1.2e36 < 1e38; micro would pass
    // 1e38 one decade earlier — ses1's documented magnitude-contract
    // class). Weekend via ISO day-of-week (Spark weekday()+1 = DuckDB
    // isodow — both Monday=1..Sunday=7, no locale dependence).
    // 100 TB: ONE keyed corpus scan → day grain; the min-day anchor is a
    // 1-row broadcast (seg1's device); eight sufficient statistics in one
    // agg over the |days|-row table; the solve is single-row arithmetic.
    Q("rg1_ridge_regression", {
      val a22 = "(stt + 1)"; val a33 = "(sw + 1)"
      val det = s"(n * ($a22 * $a33 - stw * stw)" +
        s" - st * (st * $a33 - stw * sw)" +
        s" + sw * (st * stw - $a22 * sw))"
      val det0 = s"(sy * ($a22 * $a33 - stw * stw)" +
        s" - st * (sty * $a33 - stw * swy)" +
        s" + sw * (sty * stw - $a22 * swy))"
      val det1 = s"(n * (sty * $a33 - swy * stw)" +
        s" - sy * (st * $a33 - stw * sw)" +
        s" + sw * (st * swy - sty * sw))"
      val det2 = s"(n * ($a22 * swy - stw * sty)" +
        s" - st * (st * swy - sw * sty)" +
        s" + sy * (st * stw - $a22 * sw))"
      def emit(num: String, alias: String) =
        s"""CASE WHEN $det = 0 THEN NULL
           |     ELSE CAST(CAST(sign($num) AS BIGINT) * CAST(sign($det) AS BIGINT)
           |            * ((abs($num) * 1000) // abs($det)) AS BIGINT) END AS $alias"""
          .stripMargin.replace("\n", " ")
      s"""WITH dc AS (SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)),
         |                            '%Y-%m-%d') AS day,
         |              CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
         |            FROM events WHERE event_type = 'purchase' GROUP BY 1),
         |anchor AS (SELECT min(day) AS d0 FROM dc),
         |d AS (SELECT CAST(date_diff('day', CAST(d0 AS DATE), CAST(day AS DATE)) AS BIGINT) AS t,
         |        CAST(CASE WHEN isodow(CAST(day AS DATE)) >= 6 THEN 1 ELSE 0 END AS BIGINT) AS w,
         |        y
         |      FROM dc, anchor),
         |s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
         |        CAST(sum(t) AS HUGEINT) AS st, CAST(sum(t * t) AS HUGEINT) AS stt,
         |        CAST(sum(w) AS HUGEINT) AS sw, CAST(sum(t * w) AS HUGEINT) AS stw,
         |        sum(CAST(y AS HUGEINT)) AS sy,
         |        sum(CAST(t AS HUGEINT) * y) AS sty,
         |        sum(CAST(w AS HUGEINT) * y) AS swy
         |      FROM d)
         |SELECT CAST(n AS BIGINT) AS n_days, CAST(1 AS BIGINT) AS lambda,
         |       ${emit(det0, "b0_milli")},
         |       ${emit(det1, "b1_milli")},
         |       ${emit(det2, "b2_milli")}
         |FROM s""".stripMargin
    }) { (s, d) =>
      val a22 = "(stt + 1)"; val a33 = "(sw + 1)"
      val det = s"(n * ($a22 * $a33 - stw * stw)" +
        s" - st * (st * $a33 - stw * sw)" +
        s" + sw * (st * stw - $a22 * sw))"
      val det0 = s"(sy * ($a22 * $a33 - stw * stw)" +
        s" - st * (sty * $a33 - stw * swy)" +
        s" + sw * (sty * stw - $a22 * swy))"
      val det1 = s"(n * (sty * $a33 - swy * stw)" +
        s" - sy * (st * $a33 - stw * sw)" +
        s" + sw * (st * swy - sty * sw))"
      val det2 = s"(n * ($a22 * swy - stw * sty)" +
        s" - st * (st * swy - sw * sty)" +
        s" + sy * (st * stw - $a22 * sw))"
      def emit(num: String): Column =
        when(expr(det) === 0, lit(null).cast("long"))
          .otherwise(expr(s"cast(cast(sign($num) as bigint) * cast(sign($det) as bigint)" +
            s" * ((abs($num) * 1000) div abs($det)) as bigint)"))
      val dc = Tables.events(s, d).filter(col("event_type") === "purchase")
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(sum(expr("cast(round(value * 100) as bigint)")).as("y"))
      val anchor = dc.agg(min("day").as("d0"))
      val day = dc.crossJoin(broadcast(anchor))
        .select(datediff(to_date(col("day")), to_date(col("d0"))).cast("long").as("t"),
          when(expr("weekday(to_date(day)) + 1") >= 6, 1L).otherwise(0L).as("w"),
          col("y"))
      day.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("t")).cast("decimal(38,0)").as("st"),
          sum(col("t") * col("t")).cast("decimal(38,0)").as("stt"),
          sum(col("w")).cast("decimal(38,0)").as("sw"),
          sum(col("t") * col("w")).cast("decimal(38,0)").as("stw"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum(col("t").cast("decimal(38,0)") * col("y")).as("sty"),
          sum(col("w").cast("decimal(38,0)") * col("y")).as("swy"))
        .select(col("n").cast("long").as("n_days"),
          lit(1L).as("lambda"),
          emit(det0).as("b0_milli"),
          emit(det1).as("b1_milli"),
          emit(det2).as("b2_milli"))
    },

    // ── NB1: multinomial Naive Bayes language classifier — train on the
    // 90% split (doc_id % 10 ≠ 0), apply to the held-out 10%, emit the
    // confusion matrix: the in-engine "can a bag-of-words model recover
    // lang?" pass every curation pipeline runs before trusting a learned
    // quality/language filter (lr1 scores with FIXED weights; nb1 LEARNS
    // its table from the corpus). Laplace-smoothed scores live entirely
    // in micro-ln integers: score(doc, c) = Σ_tok mult·lnMicro(cnt+1)
    // − m_doc·lnMicro(tot_c + V) + lnMicro(n_c) − lnMicro(n_train) —
    // every ln on an exact integer, every sum exact, so argmax (ties →
    // smallest lang) is deterministic on both engines. Out-of-vocabulary
    // test tokens are DROPPED (the documented convention — they carry the
    // same smoothed mass in every class, so they cannot move the argmax
    // ordering... except through m_doc; dropping them is the standard
    // choice and is replayed identically in the oracle). Priors count ALL
    // train docs (token-free docs included); a token-free test doc is
    // classified by prior alone (the tedoc grid LEFT-joins token scores).
    // 100 TB: the model is a TABLE keyed on (lang, tok) — never a driver
    // object; the grid costs |test tokens|·|langs| narrow rows (langs
    // bounded ~6); the only windows partition per doc over ≤ |langs| rows.
    Q("nb1_naive_bayes", {
      val lnC = lnMicroSql("coalesce(c, 0) + 1")
      s"""WITH tok AS (SELECT doc_id, lang, t.tok AS tok
         |             FROM documents, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t(tok)
         |             WHERE t.tok <> ''),
         |tr AS (SELECT * FROM tok WHERE doc_id % 10 <> 0),
         |cls AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_c
         |        FROM documents WHERE doc_id % 10 <> 0 GROUP BY 1),
         |ctot AS (SELECT lang, CAST(count(*) AS BIGINT) AS tot_c FROM tr GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_c) AS BIGINT) AS n_train FROM cls),
         |voc AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM tr),
         |cnt AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS c FROM tr GROUP BY 1, 2),
         |te AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS mult
         |       FROM tok WHERE doc_id % 10 = 0 GROUP BY 1, 2),
         |tev AS (SELECT te.doc_id, te.tok, te.mult
         |        FROM te JOIN (SELECT DISTINCT tok FROM tr) v USING (tok)),
         |sc AS (SELECT tev.doc_id, cls.lang,
         |         CAST(sum(tev.mult) AS BIGINT) AS m_doc,
         |         CAST(sum(tev.mult * $lnC) AS BIGINT) AS ts
         |       FROM tev CROSS JOIN cls
         |       LEFT JOIN cnt ON cnt.lang = cls.lang AND cnt.tok = tev.tok
         |       GROUP BY 1, 2),
         |tedoc AS (SELECT doc_id, lang AS true_lang FROM documents WHERE doc_id % 10 = 0),
         |grid AS (SELECT td.doc_id, td.true_lang, cls.lang,
         |           coalesce(sc.ts, 0)
         |             - coalesce(sc.m_doc, 0)
         |               * ${lnMicroSql("coalesce(ctot.tot_c, 0) + voc.v")}
         |             + ${lnMicroSql("cls.n_c")} - ${lnMicroSql("tot.n_train")} AS score
         |         FROM tedoc td
         |         CROSS JOIN cls
         |         LEFT JOIN ctot ON ctot.lang = cls.lang
         |         CROSS JOIN voc CROSS JOIN tot
         |         LEFT JOIN sc ON sc.doc_id = td.doc_id AND sc.lang = cls.lang),
         |pred AS (SELECT doc_id, true_lang, lang AS pred_lang,
         |           row_number() OVER (PARTITION BY doc_id
         |                              ORDER BY score DESC, lang) AS rk
         |         FROM grid)
         |SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
         |FROM pred WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val tok = docs
        .select(col("doc_id"), col("lang"),
          explode(split(trim(col("text")), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
      val tr = tok.filter(col("doc_id") % 10 =!= 0)
      val cls = docs.filter(col("doc_id") % 10 =!= 0)
        .groupBy("lang").agg(count(lit(1)).cast("long").as("n_c"))
      val ctot = tr.groupBy("lang").agg(count(lit(1)).cast("long").as("tot_c"))
      val tot = cls.agg(sum("n_c").cast("long").as("n_train"))
      val voc = tr.agg(countDistinct("tok").cast("long").as("v"))
      val cnt = tr.groupBy("lang", "tok").agg(count(lit(1)).cast("long").as("c"))
      val te = tok.filter(col("doc_id") % 10 === 0)
        .groupBy("doc_id", "tok").agg(count(lit(1)).cast("long").as("mult"))
      val tev = te.join(tr.select("tok").distinct(), Seq("tok"), "left_semi")
      // class grid: |langs| is bounded (~6), so the cls side broadcasts
      val sc = tev.crossJoin(broadcast(cls.select("lang")))
        .join(cnt, Seq("lang", "tok"), "left")
        .groupBy("doc_id", "lang")
        .agg(sum("mult").cast("long").as("m_doc"),
          sum(col("mult") * lnMicro(coalesce(col("c"), lit(0L)) + lit(1L)))
            .cast("long").as("ts"))
      val tedoc = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("lang").as("true_lang"))
      val grid = tedoc
        .crossJoin(broadcast(cls
          .join(ctot, Seq("lang"), "left")
          .crossJoin(voc).crossJoin(tot)))
        .join(sc, Seq("doc_id", "lang"), "left")
        .select(col("doc_id"), col("true_lang"), col("lang"),
          (coalesce(col("ts"), lit(0L))
            - coalesce(col("m_doc"), lit(0L))
              * lnMicro(coalesce(col("tot_c"), lit(0L)) + col("v"))
            + lnMicro(col("n_c")) - lnMicro(col("n_train"))).as("score"))
      val wr = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("lang"))
      grid.withColumn("rk", row_number().over(wr))
        .filter(col("rk") === 1)
        .groupBy(col("true_lang"), col("lang").as("pred_lang"))
        .agg(count(lit(1)).cast("long").as("n_docs"))
        .orderBy("true_lang", "pred_lang")
    },

    // ── GM1: Newman modularity of the brand partition on the part
    // co-purchase graph — the "is this grouping real structure?" scalar
    // the graph family lacked: lp1 FINDS communities, gm1 SCORES a given
    // partition (here p_brand — do brands cluster in co-purchase?).
    // Q·4m² = Σ_c (4m·e_c − d_c²) is pure integer (e_c = intra-community
    // edges, d_c = community degree sum, m = |edges|); q_ppm travels
    // sign·(abs div 4m²) since near-random partitions land epsilon-
    // negative. Edges build through kc1's capped collector (order fanout
    // ≤ 16, pinned in the oracle as NOT EXISTS hot). m = 0 → NULL.
    // 100 TB: pair generation O(orders·cap²) narrow rows; the brand
    // lookup joins KEYED on partkey (part is fact-sized/30 —
    // unbroadcastable, tq14's lesson); everything after the two keyed
    // joins is agg over the |brands| table.
    Q("gm1_modularity",
      """WITH inc AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS s FROM lineitem),
        |hot AS (SELECT o FROM inc GROUP BY o HAVING count(*) > 16),
        |e AS MATERIALIZED (SELECT DISTINCT x.s AS a, y.s AS b
        |     FROM inc x JOIN inc y ON x.o = y.o AND x.s < y.s
        |     WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.o = x.o)),
        |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS dg
        |        FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
        |nb AS (SELECT p_partkey AS n, p_brand AS c FROM part),
        |dc AS (SELECT nb.c, CAST(sum(deg.dg) AS BIGINT) AS d_c,
        |              CAST(count(*) AS BIGINT) AS nn
        |       FROM deg JOIN nb ON nb.n = deg.n GROUP BY 1),
        |ec AS (SELECT na.c, CAST(count(*) AS BIGINT) AS e_c
        |       FROM e JOIN nb na ON na.n = e.a JOIN nb nbb ON nbb.n = e.b
        |       WHERE na.c = nbb.c GROUP BY 1),
        |s AS (SELECT CAST(sum(dc.nn) AS BIGINT) AS n_nodes,
        |        CAST(max(m.m) AS BIGINT) AS n_edges,
        |        CAST(count(*) AS BIGINT) AS n_comms,
        |        sum(4 * CAST(m.m AS HUGEINT) * coalesce(ec.e_c, 0)
        |            - CAST(dc.d_c AS HUGEINT) * dc.d_c) AS num
        |      FROM dc CROSS JOIN m LEFT JOIN ec ON ec.c = dc.c)
        |SELECT n_nodes, n_edges, n_comms,
        |       CASE WHEN n_edges = 0 THEN NULL
        |            ELSE CAST(CAST(sign(num) AS BIGINT)
        |                   * ((abs(num) * 1000000)
        |                      // (4 * CAST(n_edges AS HUGEINT) * n_edges)) AS BIGINT) END AS q_ppm
        |FROM s""".stripMargin) { (s, d) =>
      val base = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("s"))
      // the capped edge build feeds deg and ec inside ONE action, so its
      // closing distinct-Exchange is deduped by Catalyst's ReusedExchange
      // (gr4's round-13 lesson) — NOT persisted: at sf30 the 340M-edge
      // MEMORY_AND_DISK cache spilled ~10 GB and bent the curve (210-370 s
      // vs 131 s unpersisted; at sf10 the two forms tie within noise).
      // m derives from deg (Σdeg = 2m) so e is scanned twice, not three
      // times (kc1's recompute lesson).
      val e = AnalyticsQueries.coPurchaseEdges(base, maxOrderFanout = Some(16))
      val deg = e.select(col("a").as("n")).unionAll(e.select(col("b")))
        .groupBy("n").agg(count(lit(1)).cast("long").as("dg"))
      val m = deg.agg(expr("cast(sum(dg) div 2 as bigint)").as("m"))
      val nb = Tables.part(s, d)
        .select(col("p_partkey").as("n"), col("p_brand").as("c"))
      val dc = deg.join(nb, "n")
        .groupBy("c").agg(sum("dg").cast("long").as("d_c"),
          count(lit(1)).cast("long").as("nn"))
      val ec = e
        .join(nb.select(col("n").as("a"), col("c").as("ca")), "a")
        .join(nb.select(col("n").as("b"), col("c").as("cb")), "b")
        .filter(col("ca") === col("cb"))
        .groupBy(col("ca").as("c")).agg(count(lit(1)).cast("long").as("e_c"))
      dc.crossJoin(broadcast(m))
        .join(ec, Seq("c"), "left")
        .agg(sum("nn").cast("long").as("n_nodes"),
          max("m").cast("long").as("n_edges"),
          count(lit(1)).cast("long").as("n_comms"),
          sum(expr("4 * cast(m as decimal(38,0)) * coalesce(e_c, 0)" +
            " - cast(d_c as decimal(38,0)) * d_c")).as("num"))
        .select(col("n_nodes"), col("n_edges"), col("n_comms"),
          when(col("n_edges") === 0L, lit(null).cast("long"))
            .otherwise(expr("cast(cast(sign(num) as bigint)" +
              " * ((abs(num) * 1000000)" +
              " div (4 * cast(n_edges as decimal(38,0)) * n_edges)) as bigint)"))
            .as("q_ppm"))
    },

    // ── LK1: Adamic–Adar link prediction on the supplier co-purchase
    // graph — "which non-adjacent suppliers SHOULD be linked?": score a
    // candidate pair by Σ over common neighbors z of 1/ln(deg z), the
    // classic common-neighbor weighting that discounts promiscuous hubs
    // (Adamic & Adar 2003). Each term is the exact integer
    // 1e12 div lnMicro(deg) (deg ≥ 2 for any common neighbor by
    // construction, so the ln is never 0; per-term truncation then exact
    // sums — mi1's per-cell class). Existing edges leave by anti join;
    // top-20 under the (score, n_common, a, b) total order. The graph is
    // the SPARSE co-purchase cut (l_quantity ≥ 48, degrees 2–16 at
    // sf0.01) — gr2's ≥ 40 cut is near-complete (min degree 53 on 100
    // nodes), where "predict a missing link" is vacuous.
    // 100 TB: edges build through the capped collector (fanout ≤ 25,
    // pinned in the oracle); common-neighbor MIDS are capped at degree
    // ≤ 50 (pinned in the oracle) — a hub's 1/ln(deg) → 0 contribution
    // isn't worth its deg² wedge fan-out, so the cap is both the scale
    // guard (wedge rows ≤ |mids|·50²/2) and statistically near-free; the
    // wedge self-join keys on the mid node.
    Q("lk1_adamic_adar", {
      val lnD = lnMicroSql("d")
      s"""WITH base AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
         |              FROM lineitem WHERE l_quantity >= 48),
         |hot AS (SELECT o FROM base GROUP BY o HAVING count(*) > 25),
         |bc AS (SELECT b.o, b.s FROM base b
         |       WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.o = b.o)),
         |e AS MATERIALIZED (SELECT DISTINCT x.s AS a, y.s AS b
         |     FROM bc x JOIN bc y ON x.o = y.o AND x.s < y.s),
         |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d
         |        FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
         |adj AS (SELECT a AS mid, b AS nb FROM e
         |        UNION ALL SELECT b AS mid, a AS nb FROM e),
         |mids AS (SELECT n AS mid, d FROM deg WHERE d BETWEEN 2 AND 50),
         |w AS (SELECT x.nb AS a, y.nb AS b, m.d
         |      FROM mids m JOIN adj x ON x.mid = m.mid
         |      JOIN adj y ON y.mid = m.mid AND x.nb < y.nb),
         |cand AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_common,
         |           CAST(sum(1000000000000 // $lnD) AS BIGINT) AS aa_micro
         |         FROM w GROUP BY 1, 2),
         |ne AS (SELECT c.* FROM cand c
         |       WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = c.a AND e.b = c.b))
         |SELECT a, b, n_common, aa_micro
         |FROM ne ORDER BY aa_micro DESC, n_common DESC, a, b LIMIT 20""".stripMargin
    }) { (s, d) =>
      val base = Tables.lineitem(s, d).filter(col("l_quantity") >= 48)
        .select(col("l_orderkey").as("o"), col("l_suppkey").as("s"))
      // deg, both adj orientations and the anti join all scan e — persist
      // the capped build once (gm1's serialized-persist lesson);
      // registry-tracked so a long-lived driver's clear() releases the
      // disk blocks (they are not LRU-evicted)
      val e = graft.CacheRegistry.track(
        AnalyticsQueries.coPurchaseEdges(base, maxOrderFanout = Some(25))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val deg = e.select(col("a").as("n")).unionAll(e.select(col("b")))
        .groupBy("n").agg(count(lit(1)).cast("long").as("d"))
      val adj = e.select(col("a").as("mid"), col("b").as("nb"))
        .unionAll(e.select(col("b").as("mid"), col("a").as("nb")))
      val mids = deg.filter(col("d").between(2L, 50L))
        .select(col("n").as("mid"), col("d"))
      // prune adjacency to capped mids BEFORE the wedge self-join: the
      // join input is then |mids|·deg≤50 rows and fan-out is bounded
      val adjM = adj.join(mids, "mid")
      val wedges = adjM.as("x")
        .join(adjM.select(col("mid"), col("nb").as("nb2")).as("y"),
          col("x.mid") === col("y.mid") && col("x.nb") < col("nb2"))
        .select(col("x.nb").as("a"), col("nb2").as("b"), col("x.d").as("dm"))
      val cand = wedges.groupBy("a", "b")
        .agg(count(lit(1)).cast("long").as("n_common"),
          sum(expr(s"1000000000000L div cast(round(ln(cast(dm as double)) * 1e6) as bigint)"))
            .cast("long").as("aa_micro"))
      cand.join(e, Seq("a", "b"), "left_anti")
        .orderBy(col("aa_micro").desc, col("n_common").desc, col("a"), col("b"))
        .limit(20)
    }
  )
}
