package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Wave 14 — weighted shortest paths, Markov removal-effect attribution,
  * and the l-diversity privacy audit.
  *
  *  - sssp1: weighted single-source shortest paths over the gr1
  *    customer↔supplier trade graph ([[graft.graph.Sssp]]) — gr3's BFS
  *    with per-edge integer weights; frontier-only relaxation, edges
  *    partitioned once.
  *  - at3: first-order Markov (removal-effect) attribution — the model
  *    family at1 (last-touch) and at2 (position-weighted) lead to: credit
  *    per channel = how much the absorbing chain's conversion probability
  *    drops when the channel is removed. All chain arithmetic is EXACT
  *    integer (ppm transition probabilities, 1e12-scale mass, truncating
  *    div at every step), so Spark and DuckDB agree bit-for-bit — the
  *    ses1/t11 micro-integer discipline applied to matrix power iteration.
  *  - pa2: l-diversity audit — pa1 (k-anonymity) counts group SIZES; pa2
  *    audits whether the sensitive attribute is DIVERSE within each
  *    quasi-identifier group (a k-anonymous group whose members all share
  *    one sensitive value still leaks it). One keyed distinct-agg to
  *    |groups| rows + a |l-values| rollup.
  */
object Wave14Queries {

  /** at3's unrolled chain depth: mass not yet absorbed after t rounds is
    * ≤ (max row-mass of the transient submatrix)^t of the start mass;
    * 24 rounds drive the truncated remainder far below the 1e-6 grain the
    * ppm arithmetic resolves, and both engines compute the SAME truncated
    * value exactly — the bound is about meaningfulness, not agreement.
    */
  private val at3Rounds = 24

  def all: Seq[Q] = Seq(

    // ── SSSP1: weighted shortest paths (graft.graph.Sssp) — minimum
    // total-weight routes from customer 1 over the customer↔supplier
    // trade graph, edge weight = the lightest trade (min quantity) on the
    // relation. 6 synchronous Bellman–Ford rounds; integer weights + min
    // semantics = exactly reproducible, oracle unrolls the rounds as CTEs
    // (the gr3 contract, weights added).
    Q("sssp1_weighted_paths",
      graft.graph.Sssp.unrolledSql(
        """e0 AS MATERIALIZED (
          |  SELECT CAST(2 * o_custkey AS BIGINT) AS c,
          |         CAST(2 * l_suppkey + 1 AS BIGINT) AS s,
          |         CAST(min(l_quantity) AS BIGINT) AS w
          |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          |  GROUP BY 1, 2),
          |ed AS MATERIALIZED (SELECT c AS src, s AS dst, w FROM e0
          |                    UNION ALL SELECT s, c, w FROM e0)""".stripMargin,
        "seeds AS (SELECT CAST(2 AS BIGINT) AS node)",
        rounds = 6)) { (s, d) =>
      val e0 = Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy((col("o_custkey") * 2).cast("long").as("c"),
          (col("l_suppkey") * 2 + 1).cast("long").as("s"))
        .agg(min(col("l_quantity")).cast("long").as("w"))
      val ed = e0.select(col("c").as("src"), col("s").as("dst"), col("w"))
        .unionByName(e0.select(col("s").as("src"), col("c").as("dst"), col("w")))
      val seeds = s.range(1).select(lit(2L).as("node"))
      graft.graph.Sssp.run(ed, seeds, rounds = 6).orderBy("node")
    },

    // ── AT3: Markov removal-effect attribution. Stage 1 (the data-sized
    // part): per-user journeys cut at the first purchase — one user-keyed
    // window shuffle (at1's ordering: sec, then event_id) — aggregated to
    // a |states|² transition-count table. Stage 2 (O(channels²) rows):
    // ppm transition probabilities, then 24 exact-integer power-iteration
    // rounds run SIMULTANEOUSLY for every removal variant (mass table
    // keyed by (removed_channel, state) — one plan, not one per channel),
    // each round localCheckpointed so lineage stays O(1). Removal effect
    // = base conversion mass minus the variant's; purchase revenue is
    // attributed proportionally in exact integer cents.
    Q("at3_markov_attribution", at3OracleSql) { (s, d) =>
      at3Attribution(s, d)
    },

    // ── PA2: l-diversity audit — for each (lang, length-bucket)
    // quasi-identifier group, l = distinct sensitive values (source);
    // output is the histogram of l with the rows exposed at each level.
    // Groups with small l are the leak surface even when pa1's k is
    // satisfied. Two keyed aggs: corpus → |groups|, then |groups| →
    // |l-values|.
    Q("pa2_l_diversity",
      """WITH q AS (SELECT lang, n_chars // 200 AS len_bucket,
        |             CAST(count(DISTINCT source) AS BIGINT) AS l,
        |             CAST(count(*) AS BIGINT) AS n_rows
        |           FROM documents GROUP BY 1, 2)
        |SELECT l, CAST(count(*) AS BIGINT) AS n_groups,
        |       CAST(sum(n_rows) AS BIGINT) AS n_rows
        |FROM q GROUP BY l ORDER BY l""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("lang"), expr("n_chars div 200").as("len_bucket"))
        .agg(countDistinct(col("source")).as("l"),
          count(lit(1)).as("n_rows"))
        .groupBy("l")
        .agg(count(lit(1)).as("n_groups"), sum("n_rows").cast("long").as("n_rows"))
        .orderBy("l")
    }
  )

  /** at3 stage 1, ONE materialization job: (src, nxt, ppm) transition
    * probabilities from per-user journeys cut at the first purchase
    * (states: 'START', the channel event types, absorbing 'CONV'/'NULL'),
    * UNIONED with one audit row per raw event type (nxt = '__CT__',
    * ppm = that type's total purchase cents) — the channel list and the
    * revenue total ride the same checkpoint instead of costing their own
    * events scans (the former shape paid three passes over the fact table:
    * transitions, DISTINCT event_type, and the revenue sum inside the
    * final action). The two legs are independent subtrees of one job, so
    * their scans overlap on idle cores.
    */
  private[queries] def at3Stage1(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = Window.partitionBy("user_id").orderBy("sec", "event_id")
    val e = Tables.events(s, d).select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts")).as("sec"), col("event_type"))
    // rows before (and including) the user's first purchase: the count of
    // STRICTLY PRECEDING purchases is 0
    val kept = e.withColumn("pprev",
        count(when(col("event_type") === "purchase", 1))
          .over(order.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(coalesce(col("pprev"), lit(0L)) === 0L)
      .select(col("user_id"), col("sec"), col("event_id"),
        when(col("event_type") === "purchase", "CONV")
          .otherwise(col("event_type")).as("st"))
    val seq = kept
      .withColumn("prev", lag(col("st"), 1).over(order))
      .withColumn("rdesc", row_number().over(
        Window.partitionBy("user_id").orderBy(col("sec").desc, col("event_id").desc)))
    val tr = seq.select(coalesce(col("prev"), lit("START")).as("src"), col("st").as("nxt"))
      .unionByName(seq.filter(col("rdesc") === 1 && col("st") =!= "CONV")
        .select(col("st").as("src"), lit("NULL").as("nxt")))
    val c = tr.groupBy("src", "nxt").agg(count(lit(1)).as("n"))
    val tw = Window.partitionBy("src")
    val p = c.withColumn("tot", sum(col("n")).over(tw))
      .select(col("src"), col("nxt"), expr("(n * 1000000L) div tot").as("ppm"))
    // audit leg: per-event-type purchase cents (exact integers); '__CT__'
    // can never collide with a transition row's nxt (event types, CONV,
    // NULL). The leg is one keyed agg with map-side partials.
    val ct = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(sum(when(col("event_type") === "purchase",
        round(col("value") * 100).cast("long")).otherwise(0L))
        .cast("long").as("cents"))
      .select(col("event_type").as("src"), lit("__CT__").as("nxt"),
        col("cents").as("ppm"))
    p.unionByName(ct)
  }

  /** at3 stage 2: exact-integer chain iteration + proportional revenue
    * split. Every DataFrame past the first two aggs is O(channels²) rows.
    */
  private def at3Attribution(s: SparkSession, d: String): DataFrame = {
    // ONE checkpoint job pins transitions + the per-event-type audit rows;
    // the 24 rounds then iterate on in-memory |states|²-row data and the
    // final action never touches the fact table again
    val stage1 = at3Stage1(s, d).localCheckpoint()
    val p = stage1.filter(col("nxt") =!= "__CT__")
    val channels = stage1
      .filter(col("nxt") === "__CT__" && col("src") =!= "purchase")
      .select(col("src").as("rem"))
    val rem = channels.unionByName(
      s.range(1).select(lit("__none__").as("rem")))
    // hash-partition the mass table by rem ONCE: rem never changes through
    // a round (only st does), and HashPartitioning(rem) clusters the
    // round agg's (rem, st) keys — so every round's groupBy runs WITHOUT
    // an exchange and the whole chain between checkpoints is one stage
    var m = rem.select(col("rem"), lit("START").as("st"),
      lit(1000000000000L).as("v")).repartition(col("rem")).localCheckpoint()
    // One round = ONE left join instead of the former absorbed/moved
    // filter-union (which referenced m twice, so plans doubled per
    // un-checkpointed round and m had to be checkpointed EVERY round —
    // 24 jobs over a ~50-row mass table was the query's dominant cost,
    // not arithmetic). The left join touches each mass row once: an
    // absorbed row matches no transition (the join condition excludes
    // absorbing states) and passes through on the null-extended side; a
    // transient row fans out to its surviving transitions and is dropped
    // if removal left it none (inner-join semantics via the post-filter).
    // p is O(|states|²) — broadcast, so the mass side never shuffles for
    // the join. Single-reference rounds grow the plan LINEARLY, so one
    // checkpoint per 8 rounds (3 jobs total; A/B-swept 4/6/8/12 — 8 won,
    // 12 pays superlinear planning) bounds lineage; the
    // truncated-integer arithmetic is checkpoint-cadence-invariant.
    val absorbing = col("m.st").isin("CONV", "NULL")
    for (r <- 1 to at3Rounds) {
      m = m.as("m")
        .join(broadcast(p.as("p")),
          !absorbing && col("p.src") === col("m.st") &&
            col("p.nxt") =!= col("m.rem"), "left")
        .filter(absorbing || col("p.src").isNotNull)
        .select(col("m.rem").as("rem"),
          when(absorbing, col("m.st")).otherwise(col("p.nxt")).as("st"),
          when(absorbing, col("m.v"))
            .otherwise(expr("(v * ppm) div 1000000L")).as("v"))
        .groupBy("rem", "st").agg(sum("v").cast("long").as("v"))
      if (r % 8 == 0) m = m.localCheckpoint()
    }
    val conv = m.filter(col("st") === "CONV").select(col("rem"), col("v"))
    val base = rem.filter(col("rem") === "__none__")
      .join(conv, Seq("rem"), "left")
      .select(coalesce(col("v"), lit(0L)).as("base_conv"))
    val eff = channels.join(conv, Seq("rem"), "left")
      .crossJoin(broadcast(base))
      .select(col("rem").as("channel"),
        greatest(col("base_conv") - coalesce(col("v"), lit(0L)), lit(0L)).as("eff"))
    val tot = stage1.filter(col("nxt") === "__CT__")
      .agg(sum(col("ppm")).cast("long").as("total_cents"))
    val sumEff = eff.agg(sum("eff").cast("long").as("sum_eff"))
    eff.crossJoin(broadcast(tot)).crossJoin(broadcast(sumEff))
      .select(col("channel"), col("eff").as("removal_e12"),
        when(col("sum_eff") > 0,
          expr("(CAST(total_cents AS DECIMAL(38,0)) * eff) div sum_eff"))
          .otherwise(0L).cast("long").as("attributed_cents"))
      .orderBy("channel")
  }

  /** at3's oracle: the identical journey cut, ppm probabilities, and
    * 24 exact-integer rounds unrolled as materialized CTEs (one mass table
    * keyed by (removed, state) — same simultaneous-variant shape as the
    * Spark plan). HUGEINT only where cents × 1e12 exceeds int64.
    */
  private def at3OracleSql: String = {
    val rounds = (1 to at3Rounds).map { i =>
      s"""m$i AS MATERIALIZED (
         |  SELECT rem, st, CAST(sum(v) AS BIGINT) AS v FROM (
         |    SELECT rem, st, v FROM m${i - 1} WHERE st IN ('CONV', 'NULL')
         |    UNION ALL
         |    SELECT m.rem, p.nxt AS st, (m.v * p.ppm) // 1000000 AS v
         |    FROM m${i - 1} m JOIN p ON p.src = m.st AND p.nxt <> m.rem
         |    WHERE m.st NOT IN ('CONV', 'NULL')
         |  ) GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT user_id, event_id, event_type,
       |             date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
       |                       CAST(ts AS TIMESTAMP)) AS sec
       |           FROM events),
       |k AS (SELECT user_id, sec, event_id,
       |        CASE WHEN event_type = 'purchase' THEN 'CONV' ELSE event_type END AS st,
       |        count(CASE WHEN event_type = 'purchase' THEN 1 END)
       |          OVER (PARTITION BY user_id ORDER BY sec, event_id
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pprev
       |      FROM e),
       |j AS (SELECT user_id, sec, event_id, st FROM k WHERE coalesce(pprev, 0) = 0),
       |sq AS (SELECT user_id, st,
       |         lag(st) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev,
       |         row_number() OVER (PARTITION BY user_id
       |                            ORDER BY sec DESC, event_id DESC) AS rdesc
       |       FROM j),
       |tr AS (SELECT coalesce(prev, 'START') AS src, st AS nxt FROM sq
       |       UNION ALL
       |       SELECT st, 'NULL' FROM sq WHERE rdesc = 1 AND st <> 'CONV'),
       |c AS (SELECT src, nxt, CAST(count(*) AS BIGINT) AS n FROM tr GROUP BY 1, 2),
       |p AS MATERIALIZED (SELECT src, nxt,
       |       (n * 1000000) // CAST(sum(n) OVER (PARTITION BY src) AS BIGINT) AS ppm
       |     FROM c),
       |ch AS MATERIALIZED (SELECT DISTINCT event_type AS rem FROM events
       |                    WHERE event_type <> 'purchase'),
       |rem AS (SELECT rem FROM ch UNION ALL SELECT '__none__'),
       |m0 AS MATERIALIZED (SELECT rem, 'START' AS st,
       |                           CAST(1000000000000 AS BIGINT) AS v FROM rem),
       |$rounds,
       |conv AS (SELECT rem, v FROM m$at3Rounds WHERE st = 'CONV'),
       |base AS (SELECT coalesce((SELECT v FROM conv WHERE rem = '__none__'), 0) AS base_conv),
       |eff AS (SELECT ch.rem AS channel,
       |               greatest(base_conv - coalesce(conv.v, 0), 0) AS eff
       |        FROM ch CROSS JOIN base LEFT JOIN conv ON conv.rem = ch.rem),
       |tot AS (SELECT CAST(sum(CASE WHEN event_type = 'purchase'
       |                             THEN CAST(round(value * 100) AS BIGINT)
       |                             ELSE 0 END) AS BIGINT) AS total_cents
       |        FROM events),
       |se AS (SELECT CAST(sum(eff) AS BIGINT) AS sum_eff FROM eff)
       |SELECT channel, CAST(eff AS BIGINT) AS removal_e12,
       |       CAST(CASE WHEN sum_eff > 0
       |                 THEN (CAST(total_cents AS HUGEINT) * eff) // sum_eff
       |                 ELSE 0 END AS BIGINT) AS attributed_cents
       |FROM eff CROSS JOIN tot CROSS JOIN se ORDER BY channel""".stripMargin
  }
}
