package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** Round-12 extensions, wave 8: the pipeline-operations layer — growth
  * accounting (cd1 cumulative distinct users), a seasonal-naive forecast
  * backtest (fc1, closing the time-series loop ts1→sd1→ses1→acf1 with an
  * accuracy readout), join-key skew diagnostics (dq5 — the pre-flight
  * check that tells you whether j9's salting is needed BEFORE the job
  * dies), incremental JOIN-view maintenance (mv2 — mv1 proves partial
  * re-aggregation; mv2 proves the Δ(A⋈B) delta rule with the delta side
  * broadcast), and top event paths (pt1 — mk1's transitions generalized
  * to user-level 3-step journeys).
  *
  * Determinism contracts (the StatQueries class): counts and integer
  * ppm via truncating division (sign·(abs div d) where a dividend can be
  * negative); wide products ride decimal(38,0)/HUGEINT cast-BEFORE-sum;
  * ties in every ordering broken by a unique key.
  *
  * Scale design (100 TB):
  *  - cd1 collapses events to first-seen per user in ONE keyed agg;
  *    the cumulative window runs over the |days| table.
  *  - fc1 pre-aggregates to the day grain, then the lag-7 lookup is a
  *    CALENDAR self-join of the bounded day table (not a ROWS-7 window —
  *    day gaps must not misalign the season).
  *  - dq5 computes the key histogram in one keyed agg, then everything
  *    (ECDF order stats, shares) runs over the freq-of-frequencies table,
  *    whose size is bounded by the distinct multiplicity values — never
  *    |keys| (a window over the key histogram itself would be fact/30
  *    rows at 100 TB, dq5's own skew warning applied to itself).
  *  - mv2 joins the DELTA day's orders by broadcast (a day's slice vs
  *    full history) while only the base side pays the keyed shuffle; the
  *    union re-aggregates at customer grain. Refresh cost: the broadcast
  *    probe + |view| merge, never a second history shuffle.
  *  - pt1's windows are keyed per user (w2's class); the path table is
  *    bounded by |event_type|³.
  */
object Wave8Queries {

  def all: Seq[Q] = Seq(

    // ── CD1: daily new customers + cumulative distinct customers — the
    // growth-accounting curve ("how many distinct customers ever, by
    // acquisition day"), which a naive per-day count(DISTINCT) gets wrong
    // (it counts actives, not news) and a running distinct over the raw
    // stream cannot do without per-day state. Anchored on orders/o_custkey
    // (a 562-day arrival curve on this corpus; the events table's 150
    // users all arrive within 2 days — degenerate, the tq11 lesson).
    // First-order day per customer is ONE keyed agg; new-customer counts
    // and the running total live on the |days| table (bounded window,
    // ks1's contract).
    Q("cd1_cumulative_distinct",
      """WITH f AS (SELECT o_custkey,
        |             min(strftime(date_trunc('day', CAST(o_orderdate AS TIMESTAMP)),
        |                          '%Y-%m-%d')) AS day
        |           FROM orders GROUP BY 1),
        |d AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new FROM f GROUP BY 1)
        |SELECT day, n_new,
        |       CAST(sum(n_new) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_customers
        |FROM d ORDER BY day""".stripMargin) { (s, d) =>
      val f = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(min(date_format(date_trunc("day", col("o_orderdate")), "yyyy-MM-dd"))
          .as("day"))
      val dd = f.groupBy("day").agg(count(lit(1)).cast("long").as("n_new"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dd.withColumn("cum_customers", sum("n_new").over(w).cast("long"))
        .orderBy("day")
    },

    // ── FC1: seasonal-naive forecast backtest — the accuracy readout
    // that closes the time-series family: forecast(d) = revenue(d − 7
    // CALENDAR days) (the strongest naive baseline on weekly-seasonal
    // data; sd1 established the weekday structure), scored as MAPE and
    // signed bias in ppm. The lag is a calendar equi-join of the day
    // table with itself — a ROWS-7 window would silently misalign the
    // season across day gaps. Per-day APE truncates to ppm then averages
    // exactly (mi1's per-cell class); bias multiplies through — both
    // sums first, one division, sign device. Days without a 7-day-old
    // twin or with zero revenue score NULL and drop from both engines
    // identically.
    Q("fc1_backtest_mape",
      """WITH dc AS (SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)),
        |                            '%Y-%m-%d') AS day,
        |              CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |            FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |l AS (SELECT a.day, a.cents, b.cents AS fc
        |      FROM dc a LEFT JOIN dc b
        |        ON CAST(b.day AS DATE) = CAST(a.day AS DATE) - INTERVAL 7 DAY),
        |s AS (SELECT CASE WHEN fc IS NULL OR cents <= 0 THEN NULL
        |               ELSE CAST((CAST(abs(cents - fc) AS HUGEINT) * 1000000) // cents AS BIGINT)
        |             END AS ape_ppm,
        |        CASE WHEN fc IS NULL OR cents <= 0 THEN NULL ELSE cents END AS y,
        |        CASE WHEN fc IS NULL OR cents <= 0 THEN NULL ELSE fc END AS yh
        |      FROM l)
        |SELECT CAST(count(ape_ppm) AS BIGINT) AS n_scored,
        |       CASE WHEN count(ape_ppm) = 0 THEN NULL
        |            ELSE CAST(sum(ape_ppm) // count(ape_ppm) AS BIGINT) END AS mape_ppm,
        |       CASE WHEN count(ape_ppm) = 0 OR sum(y) = 0 THEN NULL
        |            ELSE CAST(CAST(sign(sum(yh) - sum(y)) AS BIGINT)
        |                   * ((CAST(abs(sum(yh) - sum(y)) AS HUGEINT) * 1000000) // sum(y)) AS BIGINT) END AS bias_ppm
        |FROM s""".stripMargin) { (s, d) =>
      val dc = Tables.events(s, d).filter(col("event_type") === "purchase")
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
      val a = dc.select(to_date(col("day")).as("dd"), col("cents"))
      val b = dc.select(to_date(col("day")).as("bd"), col("cents").as("fc"))
      val l = a.join(b, col("bd") === date_sub(col("dd"), 7), "left")
      val scored = l.select(
        when(col("fc").isNull || col("cents") <= 0L, lit(null).cast("long"))
          .otherwise(expr("cast((cast(abs(cents - fc) as decimal(38,0)) * 1000000) div cents as bigint)"))
          .as("ape_ppm"),
        when(col("fc").isNull || col("cents") <= 0L, lit(null).cast("long"))
          .otherwise(col("cents")).as("y"),
        when(col("fc").isNull || col("cents") <= 0L, lit(null).cast("long"))
          .otherwise(col("fc")).as("yh"))
      scored.agg(count(col("ape_ppm")).cast("long").as("n_scored"),
          sum("ape_ppm").as("sape"), sum("y").as("sy"), sum("yh").as("syh"))
        .select(col("n_scored"),
          when(col("n_scored") === 0L, lit(null).cast("long"))
            .otherwise(expr("cast(sape div n_scored as bigint)")).as("mape_ppm"),
          when(col("n_scored") === 0L || col("sy") === 0L, lit(null).cast("long"))
            .otherwise(expr("cast(cast(sign(syh - sy) as bigint)" +
              " * ((cast(abs(syh - sy) as decimal(38,0)) * 1000000) div sy) as bigint)"))
            .as("bias_ppm"))
    },

    // ── DQ5: join-key skew diagnostics on l_partkey — the pre-flight
    // report that decides between j2's plain shuffle and j9's salting
    // BEFORE a hot key kills the job: per-key multiplicities in one keyed
    // agg, then top-1 share, exact p50/p99 multiplicity order statistics
    // and their ratio, all computed over the FREQ-OF-FREQUENCIES table —
    // bounded by the distinct multiplicity values, never |keys| (an ECDF
    // window over the key histogram itself would be a fact/30-row sort:
    // dq5's own warning applied to its own plan). Order stats are qq1's
    // type-1 device: p_q = min{c : 100·cum ≥ q·n_keys}. p50 ≥ 1 always
    // (multiplicities are ≥ 1), so the ratio division is total.
    Q("dq5_key_skew",
      """WITH h AS (SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS c
        |           FROM lineitem GROUP BY 1),
        |ff AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM h GROUP BY 1),
        |e AS (SELECT c, m,
        |        CAST(sum(m) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |        CAST(sum(m) OVER () AS BIGINT) AS n_keys,
        |        CAST(sum(c * m) OVER () AS BIGINT) AS n_rows,
        |        CAST(max(c) OVER () AS BIGINT) AS max_cnt
        |      FROM ff)
        |SELECT max(n_rows) AS n_rows, max(n_keys) AS n_keys, max(max_cnt) AS max_cnt,
        |       min(CASE WHEN 2 * cum >= n_keys THEN c END) AS p50,
        |       min(CASE WHEN 100 * cum >= 99 * n_keys THEN c END) AS p99,
        |       CAST((CAST(max(max_cnt) AS HUGEINT) * 1000000) // max(n_rows) AS BIGINT) AS top1_share_ppm,
        |       CAST((CAST(min(CASE WHEN 100 * cum >= 99 * n_keys THEN c END) AS HUGEINT) * 1000000)
        |         // min(CASE WHEN 2 * cum >= n_keys THEN c END) AS BIGINT) AS p99_p50_ratio_ppm
        |FROM e""".stripMargin) { (s, d) =>
      val h = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("k"))
        .agg(count(lit(1)).cast("long").as("c"))
      val ff = h.groupBy("c").agg(count(lit(1)).cast("long").as("m"))
      val wcum = Window.orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = ff.agg(sum("m").cast("long").as("n_keys"),
        sum(col("c") * col("m")).cast("long").as("n_rows"),
        max("c").cast("long").as("max_cnt"))
      ff.withColumn("cum", sum("m").over(wcum).cast("long"))
        .crossJoin(broadcast(tot))
        .agg(max("n_rows").as("n_rows"), max("n_keys").as("n_keys"),
          max("max_cnt").as("max_cnt"),
          min(when(lit(2L) * col("cum") >= col("n_keys"), col("c"))).as("p50"),
          min(when(lit(100L) * col("cum") >= lit(99L) * col("n_keys"), col("c"))).as("p99"))
        .select(col("n_rows"), col("n_keys"), col("max_cnt"), col("p50"), col("p99"),
          expr("cast((cast(max_cnt as decimal(38,0)) * 1000000) div n_rows as bigint)")
            .as("top1_share_ppm"),
          expr("cast((cast(p99 as decimal(38,0)) * 1000000) div p50 as bigint)")
            .as("p99_p50_ratio_ppm"))
    },

    // ── MV2: incremental JOIN-view maintenance — the delta rule
    // Δ(A⋈B) = A⋈ΔB when only B changed, demonstrated on the
    // per-customer revenue view over lineitem⋈orders: the latest order
    // day is "today's delta", history is the base. The base side pays
    // the one honest fact-fact keyed shuffle; the DELTA side joins by
    // broadcast (a day's orders vs full history — the whole point of
    // incremental refresh), and the two partial views merge by
    // re-aggregation at customer grain (exact 4dp integer revenue, the
    // tq5/j1 contract, so partial ⊕ partial == full recompute EXACTLY).
    // The oracle IS the full recompute — equality is the correctness of
    // the delta rule itself. Refresh cost at 100 TB: broadcast probe +
    // |view| merge; never a second history shuffle.
    Q("mv2_join_delta",
      """WITH mx AS (SELECT max(o_orderdate) AS d0 FROM orders)
        |SELECT o.o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_c4
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        (expr("cast(round(l_extendedprice * 100) as bigint)")
          * (lit(100L) - expr("cast(round(l_discount * 100) as bigint)"))).as("r4"))
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"))
      val mx = o.agg(max("o_orderdate").as("d0"))
      // base view: history (all but the delta day) — the keyed fact-fact
      // join an incremental pipeline computed YESTERDAY and persisted
      val base = li.join(o.crossJoin(broadcast(mx))
          .filter(col("o_orderdate") < col("d0"))
          .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).cast("long").as("n_lines"),
          sum(col("r4").cast("decimal(38,0)")).as("rev"))
      // delta view: today's order slice joins BROADCAST — the fact side
      // probes a day-sized build, no second history shuffle
      val delta = li.join(broadcast(o.crossJoin(broadcast(mx))
          .filter(col("o_orderdate") === col("d0"))
          .select("o_orderkey", "o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).cast("long").as("n_lines"),
          sum(col("r4").cast("decimal(38,0)")).as("rev"))
      base.unionByName(delta)
        .groupBy("o_custkey")
        .agg(sum("n_lines").cast("long").as("n_lines"),
          sum("rev").cast("long").as("rev_c4"))
        .select(col("o_custkey").as("custkey"), col("n_lines"), col("rev_c4"))
        .orderBy("custkey")
    },

    // ── PT1: top user journeys — each user's first three event types in
    // time order, counted: mk1's one-step transitions generalized to the
    // 3-step paths product analytics reads ("view > click > purchase" vs
    // "view > view > view"). The rank window is KEYED per user (w2's
    // class — scale-safe at any user count); ties on ts break by
    // event_id (total order); the path table is bounded by
    // |event_type|³. concat_ws skips the NULLs of shorter journeys
    // identically on both engines; top-20 under (n_users desc, path).
    Q("pt1_top_paths",
      """WITH r AS (SELECT user_id, event_type,
        |             row_number() OVER (PARTITION BY user_id
        |                                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rk
        |           FROM events),
        |p AS (SELECT user_id,
        |        concat_ws('>', max(CASE WHEN rk = 1 THEN event_type END),
        |                       max(CASE WHEN rk = 2 THEN event_type END),
        |                       max(CASE WHEN rk = 3 THEN event_type END)) AS path
        |      FROM r WHERE rk <= 3 GROUP BY 1)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_users
        |FROM p GROUP BY 1 ORDER BY n_users DESC, path LIMIT 20""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val r = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          row_number().over(w).as("rk"))
        .filter(col("rk") <= 3)
      r.groupBy("user_id")
        .agg(concat_ws(">",
          max(when(col("rk") === 1, col("event_type"))),
          max(when(col("rk") === 2, col("event_type"))),
          max(when(col("rk") === 3, col("event_type")))).as("path"))
        .groupBy("path").agg(count(lit(1)).cast("long").as("n_users"))
        .orderBy(col("n_users").desc, col("path")).limit(20)
    }
  )
}
