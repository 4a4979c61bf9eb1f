package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** Round-6/7 extensions: graph analytics beyond PageRank, deterministic
  * weighted sampling, histogramming, cohort retention, substring-level
  * dedup (ExactSubstr-lite), batch sessionization, bigram-LM quality
  * scoring, cross-table referential expectations, temperature-based source
  * mixture, BPE merge training (graft.text.Bpe) and int8 vector
  * quantization. Each is a first-class operator a training-data or
  * product-analytics pipeline runs, with an exact DuckDB oracle.
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

  import org.apache.spark.sql.DataFrame

  /** Supplier co-purchase edges from (order, supplier) incidence rows: two
    * suppliers are linked when they share an order. The naive pairing
    * self-join on `o` has (suppliers-per-order)² fan-out and an unbounded
    * join group on a hot order, so `maxOrderFanout` caps it — orders with
    * more than `cap` qualifying suppliers are dropped (the same scale guard
    * as dd2's/dd8's document-frequency caps), pinned in the oracle too.
    *
    * With a cap, pair generation needs NO join at all: one keyed shuffle
    * collects each order's (deduped, sorted) supplier set, the size filter
    * applies the cap, and pairs explode narrowly at O(cap²) per order —
    * 2 exchanges total vs the self-join's 4, and measured FASTER than the
    * uncapped join build at sf0.1. The collector is
    * [[graft.functions.CappedCollectSet]]: its aggregation buffer admits at
    * most cap+1 distinct elements (cap+1 observed distinct values already
    * PROVE the order is over the cap), so even an adversarial order with
    * ≫10⁶ suppliers holds O(cap) state — no unbounded collect_set buffer
    * exists anywhere in the build; the `size <= cap` verdict is identical
    * row-for-row (see CappedCollectSet's exactness note).
    *
    * `None` = exact: every co-purchase pair via the inverted-index
    * self-join, join groups unbounded.
    */
  def coPurchaseEdges(base: DataFrame, maxOrderFanout: Option[Int]): DataFrame =
    maxOrderFanout match {
      case Some(cap) =>
        base.groupBy("o").agg(
            graft.functions.CappedCollectSet.sortedSetCapped(cap)(col("s")).as("ss"))
          .filter(size(col("ss")) <= cap)
          .select(explode(col("ss")).as("a"), col("ss"))
          .select(col("a"), explode(col("ss")).as("b"))
          .filter(col("a") < col("b"))
          .select("a", "b").distinct()
      case None =>
        base.as("x").join(base.as("y"),
            col("x.o") === col("y.o") && col("x.s") < col("y.s"))
          .select(col("x.s").as("a"), col("y.s").as("b")).distinct()
    }

  /** dd8's window table: distinct (doc_id, 30-char window) at the given
    * sampling stride. Text rides THROUGH the explode (one generator +
    * substring in the same codegen stage) — re-joining documents on doc_id
    * to fetch it back would cost two avoidable Exchanges at 100 TB.
    * Stride 4 is dd8's production approximation; stride 1 is the exact
    * form dd8b's referee uses over its bounded sample (every shared
    * literal run ≥ 33 chars contains a fully-inside stride-4 window of
    * one side, and the stride-1 side holds every alignment of the other).
    */
  def substringWindows(docs: DataFrame, stride: Int): DataFrame =
    docs.filter(length(col("text")) >= 30)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - 29, lit(stride))).as("i"))
      .select(col("doc_id"), expr("substring(text, i, 30)").as("win"))
      // ONE win-keyed exchange serves the dedup AND every downstream
      // win-keyed consumer: hash(win) co-locates all copies of a
      // (doc_id, win) pair, so the dropDuplicates aggregate runs
      // exchange-free over it, and the df-cap agg / inverted-index
      // self-join / stride-4⋈stride-1 referee join all reuse the same
      // clustering. The former `.distinct()` spelling exchanged the
      // exploded stream TWICE (once on (doc_id, win) for the dedup, again
      // on win for whichever join consumed it).
      .repartition(col("win"))
      .dropDuplicates("doc_id", "win")

  /** dd8's full pair stage — stride-4 windows, document-frequency cap
    * (≤ 20) bounding every join group, inverted-index self-join. Factored
    * so dd8b's referee verifies the EXACT plan dd8 ships, not a re-spelling
    * that could drift.
    */
  def substringPairs(docs: DataFrame): DataFrame = {
    val w = substringWindows(docs, stride = 4)
    val capped = w.groupBy("win").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 20).select("win")
    val wc = w.join(capped, Seq("win"), "left_semi")
    wc.as("x").join(wc.as("y"),
        col("x.win") === col("y.win") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
  }

  /** [[substringPairs]] over the driver corpus, memoized per (session,
    * dir) — dd8 and dd8b's referee both consume it, so a bench/verify run
    * pays the window build + inverted-index join ONCE across the two
    * consumers (the dd2/dd6/dd11 shingle-cache and mm4/mm5 pair-cache
    * pattern; prewarmed outside the timed region by Bench like those).
    */
  def substringPairsCached(s: SparkSession, d: String): DataFrame =
    graft.CacheRegistry.memoized(s, d, "dd8-pairs") {
      substringPairs(Tables.documents(s, d))
    }

  /** Two unrolled HITS rounds from hub₀ = 1 over a bipartite incidence
    * `(s, p)`: round 1 gives auth₁(p) = degree, hub₁(s) = Σ auth₁ of its
    * parts; round 2 gives auth₂(p) = Σ hub₁ of its suppliers. All scores
    * are EXACT integer sums of counts. Returns (p, auth).
    */
  def hitsAuthorities(e: DataFrame): DataFrame = {
    val a1 = e.groupBy("p").agg(count(lit(1)).as("a"))
    val h1 = e.join(a1, "p").groupBy("s").agg(sum(col("a")).as("h"))
    e.join(h1, "s").groupBy("p").agg(sum(col("h")).as("auth"))
  }

  /** Synchronous majority-vote label propagation over undirected edges
    * `(a, b)`: `rounds` sync updates of label(v) ← argmax over neighbor
    * labels (max vote count, tie → smallest label). Deterministic by
    * construction — the async/random-order schedule of the original
    * algorithm can never hash-match an oracle. Returns (node, lbl) for
    * every edge endpoint. Per round: one join shuffling labels onto the
    * symmetric edge list, one (node, cand) count, one argmax-by-struct
    * agg; labels localCheckpoint between rounds so iterative lineage
    * doesn't stack (the gr1 pattern).
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    val sym = edges.select(col("a").as("u"), col("b").as("v"))
      .unionByName(edges.select(col("b").as("u"), col("a").as("v")))
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("lbl", col("node"))
    for (_ <- 1 to rounds) {
      val votes = sym.join(
        labels.select(col("node").as("v"), col("lbl").as("nl")), "v")
        .select(col("u").as("node"), col("nl").as("cand"))
      // argmax(count, then min label) as ONE agg over a struct ordering —
      // (cnt, -cand) max picks the highest count, then the smallest
      // label — cheaper than a per-node rank window and identical rows
      labels = votes.groupBy("node", "cand").agg(count(lit(1)).as("cnt"))
        .groupBy("node")
        .agg(max(struct(col("cnt"), (-col("cand")).as("neg"))).as("m"))
        .select(col("node"), (-col("m.neg")).as("lbl"))
        .localCheckpoint()
    }
    labels
  }

  /** Bounded k-core peel over undirected edges `(a, b)`: `rounds`
    * synchronous rounds of "drop every node whose degree < k, then drop
    * edges touching a dropped node", emitting one (round, n_nodes,
    * n_edges) row per round. The fixpoint is reached when two consecutive
    * rows agree — the caller reads convergence off the rows, and both
    * engines replay the SAME bounded recursion (lp1/gr1's fixed-round
    * class: an unbounded while-loop can never hash-match an oracle).
    * Per round: ONE keyed degree shuffle + two semi-joins; edges
    * localCheckpoint between rounds so iterative lineage doesn't stack.
    */
  def kCore(edges0: DataFrame, k: Int, rounds: Int): DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._
    // materialize the pair build ONCE: round 1 consumes it from three
    // plans (degree agg + both join probes). Serialized columnar
    // persist, NOT localCheckpoint: checkpoint blocks store DESERIALIZED
    // InternalRows (~60 B per 2-long edge), and with two |E|-row
    // generations live during a round build the sf10 peel (115M pairs)
    // needed a 48 GB heap — the compressed columnar cache carries the
    // same rows in ~1/6 the space and the peel fits the default heap.
    // (The per-round counts are SEPARATE actions, so this is the
    // cross-action consumer class where r12 measured persists winning —
    // gm1/lk1 — not the single-action ReusedExchange class of gr2/gr4.)
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var edges = edges0.persist(level)
    edges.count(): Unit // materialize before the loop's triple consumption
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    // DELTA PEEL: only round 1 pays the full 2|E|-row degree shuffle.
    // From round 2 on, a surviving node's degree changes ONLY by its edges
    // into last round's DROPPED set — deg_r(u) = deg_{r-1}(u) − |edges of
    // u into dropped_{r-1}| — so each later round joins the edge cache
    // against the (typically tiny, post-checkpoint stats-sized) dropped
    // set instead of re-aggregating every edge endpoint, and removes dead
    // edges with two anti-joins against the SAME small set instead of two
    // semi-joins against the |V|-sized alive set. Fixpoint rounds (empty
    // dropped) degrade to cheap no-op scans. The r13 memory discipline is
    // unchanged: eager per-round counts, serialized edge persists, prev
    // generation unpersisted before the next is built, node-grain state
    // localCheckpointed (cuts per-round lineage).
    var degAll: DataFrame = null     // (u, dg) over e_{r-1}, checkpointed
    var olderEdges: DataFrame = null // e_{r-2}: the set last round's dropped
                                     // nodes were dropped FROM — the delta
                                     // source; released after the round's
                                     // degree checkpoint, so peak live edge
                                     // generations stay at TWO (unchanged)
    for (r <- 1 to rounds) {
      val deg =
        if (r == 1)
          edges.select(col("a").as("u")).unionAll(edges.select(col("b")))
            .groupBy("u").agg(count(lit(1)).as("dg"))
        else {
          // deg_r(u) = deg_{r-1}(u) − |e_{r-2} edges at u into dropped_{r-1}|
          // for u alive after round r−1: ONE pass over the cached edge set
          // (two tiny probe joins in the same stage — a semi-join per
          // direction would scan the cache twice) emitting only endpoints
          // of edges INCIDENT to the dropped set, so the round's shuffle
          // carries incident-edge rows, never the full 2|E| endpoint
          // stream. An edge with BOTH endpoints dropped contributes only
          // to dropped nodes' deltas, which the alive-keyed left join
          // discards.
          val dropped = degAll.filter(col("dg") < k.toLong).select("u")
          val delta = olderEdges
            .join(dropped.select(col("u").as("da")), col("a") === col("da"), "left")
            .join(dropped.select(col("u").as("db")), col("b") === col("db"), "left")
            .filter(col("da").isNotNull || col("db").isNotNull)
            .select(explode(array(
              when(col("db").isNotNull, col("a")),
              when(col("da").isNotNull, col("b")))).as("u"))
            .filter(col("u").isNotNull)
            .groupBy("u").agg(count(lit(1)).as("rm"))
          degAll.filter(col("dg") >= k.toLong)
            .join(delta, Seq("u"), "left")
            .select(col("u"),
              (col("dg") - coalesce(col("rm"), lit(0L))).as("dg"))
        }
      // node-grain state is checkpointed (≤|V| rows of two longs): the
      // degree build runs ONCE per round; without it the edge filter, the
      // node count and the NEXT round's delta would each recompute it.
      // localCheckpoint here also CUTS the growing per-round lineage at
      // node grain, which the serialized edge persists do not. alive and
      // dropped are cheap FILTERS over this one checkpoint — one
      // materialization job per round, not one per derived set.
      val prevDegAll = degAll
      degAll = deg.localCheckpoint()
      if (olderEdges != null) olderEdges.unpersist()
      if (prevDegAll != null) prevDegAll.unpersist()
      val dropNow = degAll.filter(col("dg") < k.toLong).select("u")
      olderEdges = edges
      edges = edges
        .join(dropNow.select(col("u").as("a")), Seq("a"), "left_anti")
        .join(dropNow.select(col("u").as("b")), Seq("b"), "left_anti")
        .select("a", "b")
        .persist(level)
      // per-round counts are cheap scans of the materialized blocks; they
      // are BOUNDED driver data (two longs per round — the pivot-key
      // collect class), and taking them eagerly lets the dead round's
      // blocks free immediately: holding all rounds at once is what bent
      // the sf10 curve (seven deserialized 113M-row caches spilling +
      // GC-thrashing the heap)
      rows += ((r.toLong,
        degAll.filter(col("dg") >= k.toLong).count(), edges.count()))
    }
    // the result rows are already materialized driver-side (two longs per
    // round); release the final generations' caches before returning
    if (olderEdges != null) olderEdges.unpersist()
    edges.unpersist()
    if (degAll != null) degAll.unpersist()
    rows.toSeq.toDF("round", "n_nodes", "n_edges").orderBy("round")
  }

  def all: Seq[Q] = Seq(

    // ── FI1: frequent co-ordered part pairs (association mining's 2-itemset
    // pass — the support/confidence readout behind "bought together").
    // Baskets are the per-order DISTINCT part sets; the pair explode is
    // bounded by the same CappedCollectSet guard as gr2's co-purchase build
    // (basket > 30 distinct parts ⇒ order dropped, O(cap) aggregation
    // state, O(cap²) pairs per order — a hot order can never quadratic a
    // join group; the cap is pinned in the oracle as the per-order distinct
    // count filter, identical rows both engines). Supports and confidences
    // are exact integers (conf as ppm via div); top-50 under a total order
    // is TakeOrderedAndProject, never a global sort.
    Q("fi1_frequent_pairs",
      """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |sz AS (SELECT o, count(*) AS n FROM b GROUP BY 1),
        |ok AS (SELECT o FROM sz WHERE n <= 30),
        |bb AS (SELECT b.o, b.p FROM b JOIN ok USING (o)),
        |pr AS (SELECT x.p AS pa, y.p AS pb, CAST(count(*) AS BIGINT) AS support
        |       FROM bb x JOIN bb y ON x.o = y.o AND x.p < y.p GROUP BY 1, 2),
        |s1 AS (SELECT p, CAST(count(*) AS BIGINT) AS np FROM bb GROUP BY 1)
        |SELECT pa, pb, support,
        |       (support * 1000000) // sa.np AS conf_a_ppm,
        |       (support * 1000000) // sb.np AS conf_b_ppm
        |FROM pr JOIN s1 sa ON sa.p = pr.pa JOIN s1 sb ON sb.p = pr.pb
        |WHERE support >= 2
        |ORDER BY support DESC, pa, pb LIMIT 50""".stripMargin) { (s, d) =>
      // no pre-distinct (the gr2 lesson): the capped set collector dedups
      // (o, p) itself map-side, so the raw incidence rows reach the basket
      // agg through ONE exchange — the explicit distinct() was a second
      // full 60M-row shuffle buying nothing
      val b = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val baskets = b.groupBy("o")
        .agg(graft.functions.CappedCollectSet.sortedSetCapped(30)(col("p")).as("ss"))
        .filter(size(col("ss")) <= 30)
      val pairs = baskets
        .select(explode(col("ss")).as("pa"), col("ss"))
        .select(col("pa"), explode(col("ss")).as("pb"))
        .filter(col("pa") < col("pb"))
        .groupBy("pa", "pb").agg(count(lit(1)).as("support"))
      val singles = baskets.select(explode(col("ss")).as("p"))
        .groupBy("p").agg(count(lit(1)).as("np"))
      // top-50 FIRST (TakeOrdered on support alone — the ordering keys
      // don't need the confidences), THEN the confidence joins: the 50-row
      // side broadcasts against the part catalog, which at scale is a dim
      // too large to broadcast whole
      val top = pairs.filter(col("support") >= 2)
        .orderBy(col("support").desc, col("pa"), col("pb")).limit(50)
      val withNa = singles.withColumnRenamed("p", "pa").withColumnRenamed("np", "na")
        .join(broadcast(top), "pa")
      val full = singles.withColumnRenamed("p", "pb").withColumnRenamed("np", "nb")
        .join(broadcast(withNa), "pb")
      full.select(col("pa"), col("pb"), col("support"),
          expr("(support * 1000000L) div na").as("conf_a_ppm"),
          expr("(support * 1000000L) div nb").as("conf_b_ppm"))
        .orderBy(col("support").desc, col("pa"), col("pb"))
    },

    // ── GR2: per-node triangle counts on the supplier co-purchase graph
    // (suppliers linked when a high-quantity item of each shares an order).
    // Degree orientation makes each triangle discoverable exactly once
    // (rank(a) < rank(b) < rank(c) under (deg, id) order), so the count is
    // wedge-join + semi-join closure — no post-hoc dedup, no cartesian.
    // e/deg/dir are MATERIALIZED: dir is referenced three times and DuckDB
    // inlines plain CTEs, so without the hint the whole edge pipeline is
    // re-derived per reference — at sf10 that recomputation overflowed 73 GB
    // of spill; materialized, the oracle runs in minutes (sf10 probe).
    Q("gr2_triangle_count",
      """WITH base AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
        |              FROM lineitem WHERE l_quantity >= 40),
        |hot AS (SELECT o FROM base GROUP BY o HAVING count(*) > 25),
        |bc AS (SELECT b.o, b.s FROM base b
        |       WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.o = b.o)),
        |e AS MATERIALIZED (SELECT DISTINCT x.s AS a, y.s AS b
        |      FROM bc x JOIN bc y ON x.o = y.o AND x.s < y.s),
        |deg AS MATERIALIZED (SELECT n, count(*) AS d
        |        FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        |dir AS MATERIALIZED (SELECT CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.a ELSE e.b END AS src,
        |               CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.b ELSE e.a END AS dst
        |        FROM e JOIN deg da ON da.n = e.a JOIN deg db ON db.n = e.b),
        |tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        |        FROM dir e1 JOIN dir e2 ON e1.dst = e2.src
        |        JOIN dir e3 ON e3.src = e1.src AND e3.dst = e2.dst)
        |SELECT n AS node, count(*) AS n_tri
        |FROM (SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
        |      UNION ALL SELECT c FROM tri)
        |GROUP BY 1 ORDER BY n_tri DESC, node LIMIT 20""".stripMargin) { (s, d) =>
      // no pre-distinct: the capped path's collect_set dedups (o, s) itself,
      // so raw incidence rows save an exchange
      val base = Tables.lineitem(s, d).filter(col("l_quantity") >= 40)
        .select(col("l_orderkey").as("o"), col("l_suppkey").as("s"))
      // fan-out cap 25 pinned in the oracle (qualifying suppliers/order is
      // ~7 on this corpus — AnalyticsSpec asserts the cap changes nothing).
      // NOT persisted: e and dir each feed several consumers, but their
      // exchanges are deduped by Catalyst's ReusedExchange (plan-asserted
      // in Wave12Spec) — a round-13 A/B at sf10 measured an explicit
      // MEMORY_AND_DISK persist of e/dir 20% SLOWER than the reused
      // exchanges (cache materialization + spill vs free shuffle reuse)
      val e = coPurchaseEdges(base, maxOrderFanout = Some(25))
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

    // ── KC1: k-core decomposition (bounded peel) over the PART
    // co-purchase graph — the density filter the graph family lacked:
    // gr2 counts triangles (local density), dd6 merges components
    // (reachability); the k-core is the maximal subgraph where EVERY
    // node keeps ≥ k neighbors — the "dense nucleus" recommendation and
    // fraud pipelines cut to. k = 80 on the part graph (median degree
    // ~115 at sf0.01, so the peel genuinely iterates: 5 rounds to the
    // fixpoint there). Six UNROLLED rounds, convergence read off two
    // consecutive equal rows — the fixed-round contract (lp1/gr1's
    // class) both engines replay identically; the oracle is the same
    // six rounds as materialized CTEs. Edges build through the capped
    // collector (order fanout ≤ 16 — lines/order is structurally ~13 on
    // this schema, so the cap is a pure adversarial guard, pinned in
    // the oracle as NOT EXISTS hot). Per round: ONE keyed degree
    // shuffle + two semi-joins, edges localCheckpointed between rounds.
    // 100 TB: pair explosion is O(|orders|·cap²) narrow generation (no
    // self-join), round count is fixed, and every per-round shuffle
    // keys on the node id — the whole peel is 18 bounded shuffles
    // whatever the corpus size.
    Q("kc1_kcore", {
      val roundCtes = (1 to 6).map { r =>
        s"""d$r AS MATERIALIZED (SELECT u, count(*) AS dg
           |  FROM (SELECT a AS u FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1}) GROUP BY 1),
           |a$r AS MATERIALIZED (SELECT u FROM d$r WHERE dg >= 80),
           |e$r AS MATERIALIZED (SELECT a, b FROM e${r - 1}
           |  WHERE a IN (SELECT u FROM a$r) AND b IN (SELECT u FROM a$r))""".stripMargin
      }.mkString(",\n")
      val roundRows = (1 to 6).map { r =>
        s"SELECT CAST($r AS BIGINT) AS round," +
          s" (SELECT CAST(count(*) AS BIGINT) FROM a$r) AS n_nodes," +
          s" (SELECT CAST(count(*) AS BIGINT) FROM e$r) AS n_edges"
      }.mkString(" UNION ALL ")
      s"""WITH inc AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS s FROM lineitem),
         |hot AS (SELECT o FROM inc GROUP BY o HAVING count(*) > 16),
         |e0 AS MATERIALIZED (SELECT DISTINCT x.s AS a, y.s AS b
         |  FROM inc x JOIN inc y ON x.o = y.o AND x.s < y.s
         |  WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.o = x.o)),
         |$roundCtes
         |SELECT * FROM ($roundRows) ORDER BY round""".stripMargin
    }) { (s, d) =>
      val base = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("s"))
      kCore(coPurchaseEdges(base, maxOrderFanout = Some(16)), k = 80, rounds = 6)
    },

    // ── LP1: community detection by synchronous majority-vote label
    // propagation (Raghavan et al. 2007) over gr2's supplier co-purchase
    // graph — the community readout dd6's connected components can't give
    // (CC merges everything reachable; LPA finds densely-linked groups
    // inside one component). Three SYNCHRONOUS rounds with a total
    // tie-break (max vote count, then smallest label) make the fixpoint-
    // free schedule a pure function of the data: async/random-order LPA —
    // the paper's default — can never hash-match an oracle. Per round the
    // plan is one join (labels onto the symmetric edge list, shuffles on
    // key), one (node, cand) keyed count, and one argmax-by-struct agg —
    // rank-carrying rows only, the gr1 iteration pattern, with labels
    // localCheckpointed between rounds so lineage doesn't stack. Edges
    // build once through the capped collector and are localCheckpointed
    // before 3 rounds × 2 directions of reuse.
    Q("lp1_label_propagation", {
      def round(prev: String, cur: String): String =
        s"""c$cur AS (SELECT s.u AS node, l.lbl AS cand, count(*) AS cnt
           |       FROM sym s JOIN l$prev l ON l.node = s.v GROUP BY 1, 2),
           |l$cur AS MATERIALIZED (SELECT node, cand AS lbl FROM
           |  (SELECT node, cand, row_number() OVER (PARTITION BY node
           |     ORDER BY cnt DESC, cand) AS rn FROM c$cur) WHERE rn = 1)"""
          .stripMargin
      s"""WITH base AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
         |              FROM lineitem WHERE l_quantity >= 40),
         |hot AS (SELECT o FROM base GROUP BY o HAVING count(*) > 25),
         |bc AS (SELECT b.o, b.s FROM base b
         |       WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.o = b.o)),
         |e AS MATERIALIZED (SELECT DISTINCT x.s AS a, y.s AS b
         |      FROM bc x JOIN bc y ON x.o = y.o AND x.s < y.s),
         |sym AS MATERIALIZED (SELECT a AS u, b AS v FROM e
         |                     UNION ALL SELECT b, a FROM e),
         |l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM sym),
         |${round("0", "1")},
         |${round("1", "2")},
         |${round("2", "3")}
         |SELECT node, lbl FROM l3 ORDER BY node""".stripMargin
    }) { (s, d) =>
      val base = Tables.lineitem(s, d).filter(col("l_quantity") >= 40)
        .select(col("l_orderkey").as("o"), col("l_suppkey").as("s"))
      val e = coPurchaseEdges(base, maxOrderFanout = Some(25)).localCheckpoint()
      labelPropagation(e, rounds = 3).orderBy("node")
    },

    // ── HUB1: HITS hubs & authorities (Kleinberg 1999) on the BIPARTITE
    // supplier→part incidence — the mutually-recursive centrality gr1's
    // damped PageRank isn't (PageRank ranks within one node set; HITS
    // scores the two sides of an incidence against each other: a part is
    // authoritative when stocked by good hubs, a supplier a good hub when
    // it stocks authoritative parts). Two unrolled sync rounds from
    // hub₀ = 1, kept in EXACT integers — every score is a sum of counts
    // (magnitude ≤ maxdeg⁴, far inside BIGINT), so there is no float
    // normalization step to disagree on and the oracle replays the
    // arithmetic verbatim. Plan: two keyed join+agg rounds over the
    // distinct incidence (shuffles on s / p only carry the score column),
    // top-20 via TakeOrderedAndProject — never a global sort.
    Q("hub1_hits",
      """WITH e AS MATERIALIZED (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
        |      FROM lineitem WHERE l_quantity >= 40),
        |a1 AS (SELECT p, count(*) AS a FROM e GROUP BY 1),
        |h1 AS (SELECT e.s, CAST(sum(a1.a) AS BIGINT) AS h
        |       FROM e JOIN a1 USING (p) GROUP BY 1),
        |a2 AS (SELECT e.p, CAST(sum(h1.h) AS BIGINT) AS auth
        |       FROM e JOIN h1 USING (s) GROUP BY 1)
        |SELECT p AS part, auth FROM a2
        |ORDER BY auth DESC, part LIMIT 20""".stripMargin) { (s, d) =>
      val e = Tables.lineitem(s, d).filter(col("l_quantity") >= 40)
        .select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
        .distinct().localCheckpoint()
      hitsAuthorities(e)
        .select(col("p").as("part"), col("auth"))
        .orderBy(col("auth").desc, col("part")).limit(20)
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
      substringPairsCached(s, d).orderBy("a", "b")
    },

    // ── GR3: multi-hop BFS (graft.graph.Bfs) — hop distances ≤3 from
    // customer 1 over the customer↔supplier trade graph (gr1's graph).
    // Each round expands ONLY the frontier; the settled interior never
    // re-joins. Integer distances + min semantics = exactly reproducible,
    // so the oracle just unrolls the rounds as CTEs.
    Q("gr3_bfs_hops",
      """WITH e0 AS MATERIALIZED (
        |  SELECT DISTINCT CAST(2 * o_custkey AS BIGINT) AS c,
        |                  CAST(2 * l_suppkey + 1 AS BIGINT) AS s
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |ed AS MATERIALIZED (SELECT c AS src, s AS dst FROM e0 UNION SELECT s, c FROM e0),
        |d0 AS (SELECT CAST(2 AS BIGINT) AS node, 0 AS dist),
        |r1 AS (SELECT DISTINCT ed.dst AS node FROM ed JOIN d0 ON ed.src = d0.node),
        |a1 AS (SELECT node, dist FROM d0 UNION ALL
        |       SELECT node, 1 FROM r1 WHERE node NOT IN (SELECT node FROM d0)),
        |r2 AS (SELECT DISTINCT ed.dst AS node FROM ed JOIN a1 ON ed.src = a1.node AND a1.dist = 1),
        |a2 AS (SELECT node, dist FROM a1 UNION ALL
        |       SELECT node, 2 FROM r2 WHERE node NOT IN (SELECT node FROM a1)),
        |r3 AS (SELECT DISTINCT ed.dst AS node FROM ed JOIN a2 ON ed.src = a2.node AND a2.dist = 2),
        |a3 AS (SELECT node, dist FROM a2 UNION ALL
        |       SELECT node, 3 FROM r3 WHERE node NOT IN (SELECT node FROM a2))
        |SELECT node, dist FROM a3 ORDER BY node""".stripMargin) { (s, d) =>
      // parity-disjoint node ids (customer = 2k, supplier = 2k+1): unlike a
      // fixed additive offset this cannot collide at ANY scale factor
      val e0 = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).cast("long").as("c"),
          (col("l_suppkey") * 2 + 1).cast("long").as("s"))
        .distinct()
      // directions are disjoint (c even, s odd): union == UNION's dedup
      val ed = e0.select(col("c").as("src"), col("s").as("dst"))
        .union(e0.select(col("s").as("src"), col("c").as("dst")))
      val seeds = s.range(1, 2).select((col("id") * 2).as("node")) // customer 1 → 2
      graft.graph.Bfs.run(ed, seeds, maxHops = 3).orderBy("node")
    },

    // ── DQ1: data-quality expectations / column profiling (the ANALYZE-
    // style operator a pipeline runs before trusting a new drop): per-
    // column row count, null count, distinct count, min/max rendered as
    // strings. Each metric set is a column-pruned scan + 1-row agg; the
    // 100 TB form swaps n_distinct for the HLL sketch — that variant is
    // dq1b below, oracle-gated with agg4's bound-flag pattern.
    Q("dq1_expectations",
      """SELECT 'l_returnflag' AS col_name, count(*) AS n,
        |       count(*) - count(l_returnflag) AS n_null,
        |       count(DISTINCT l_returnflag) AS n_distinct,
        |       CAST(min(l_returnflag) AS VARCHAR) AS min_s,
        |       CAST(max(l_returnflag) AS VARCHAR) AS max_s
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
        |       count(DISTINCT l_quantity),
        |       CAST(min(l_quantity) AS VARCHAR), CAST(max(l_quantity) AS VARCHAR)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
        |       count(DISTINCT l_shipdate),
        |       strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S'),
        |       strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S')
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_linestatus', count(*), count(*) - count(l_linestatus),
        |       count(DISTINCT l_linestatus),
        |       CAST(min(l_linestatus) AS VARCHAR), CAST(max(l_linestatus) AS VARCHAR)
        |FROM lineitem
        |ORDER BY col_name""".stripMargin) { (s, d) =>
      // One per-column HASH-aggregate profile per metric set, unioned.
      // The former single-aggregate form planned the 4 distinct-aggs as an
      // Expand (5 rows out per scanned row) whose grouping keys mix all
      // four columns — Spark falls back to SortAggregate for it, so every
      // expanded row paid a 5-key SORT before any aggregation (measured:
      // the sort dominated the query, 6.0 s at sf0.1 for a 600k-row scan).
      // Here each column profiles independently: groupBy(value) hash-agg
      // (map-side partials → the exchange carries one row per distinct
      // value per partition), then a 1-row finish. Columnar storage makes
      // the "4 scans" read the SAME total bytes as the old 1 scan — each
      // leg prunes to exactly its own column (ReadSchema asserted in
      // PlanSpec) — and no sort of fact-sized data exists anywhere.
      val li = Tables.lineitem(s, d)
      import org.apache.spark.sql.Column
      val cols = Seq[(String, Column => Column)](
        ("l_returnflag", _.cast("string")),
        ("l_quantity", _.cast("string")),
        ("l_shipdate", date_format(_, "yyyy-MM-dd HH:mm:ss")),
        ("l_linestatus", _.cast("string")))
      cols.map { case (c, render) =>
        li.select(col(c)).groupBy(col(c)).agg(count(lit(1)).as("cnt"))
          .agg(sum("cnt").cast("long").as("n"),
            coalesce(sum(when(col(c).isNull, col("cnt"))), lit(0L))
              .cast("long").as("n_null"),
            count(col(c)).cast("long").as("n_distinct"),
            render(min(col(c))).as("min_s"),
            render(max(col(c))).as("max_s"))
          .select(lit(c).as("col_name"), col("n"), col("n_null"),
            col("n_distinct"), col("min_s"), col("max_s"))
      }.reduce(_.unionByName(_))
        .orderBy("col_name")
    },

    // ── DQ1B: sketch-based column profiling — dq1's 100 TB form, executed
    // rather than promised in a comment: n_distinct comes from the HLL++
    // sketch (fixed-size mergeable state, map-side partials — no
    // one-row-per-distinct-value shuffle), still ONE scan for all columns.
    // Oracle shape is agg4's keys-exact pattern: the hashed result carries
    // the EXACT distinct companion plus `approx_ok`, the ±5% relative
    // bound evaluated in-engine, which DuckDB asserts as literal 1 — a
    // wrong or drifting sketch flips the flag and the driver hash
    // mismatches, so the sketch itself stays oracle-gated. dq1 remains the
    // exact twin.
    Q("dq1b_expectations_sketch",
      """SELECT 'l_returnflag' AS col_name, count(*) AS n,
        |       count(*) - count(l_returnflag) AS n_null,
        |       count(DISTINCT l_returnflag) AS n_distinct, 1 AS approx_ok
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
        |       count(DISTINCT l_quantity), 1
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
        |       count(DISTINCT l_shipdate), 1
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_linestatus', count(*), count(*) - count(l_linestatus),
        |       count(DISTINCT l_linestatus), 1
        |FROM lineitem
        |ORDER BY col_name""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val cols = Seq("l_returnflag", "l_quantity", "l_shipdate", "l_linestatus")
      // approx_ok bound = 3·rsd (rsd=0.02 → ±6%): a 3σ margin on the HLL++
      // estimator's standard error, so a genuinely high-cardinality column
      // on a future dataset stays inside the gate with ~99.7% headroom
      // instead of the old ±5% (≈2.5σ) bound that the sketch could
      // deterministically exceed while behaving exactly as configured.
      val rsdBound = 3 * 0.02
      // dq1's per-column hash-agg legs (the exact countDistinct companion
      // forced the same multi-distinct Expand here — 5 rows out per
      // scanned row); the HLL++ sketch is duplicate-INSENSITIVE (same
      // value → same register), so running it over the grouped values is
      // bit-identical to running it over the raw rows, and both the exact
      // and approx counts finish from the same tiny grouped table.
      cols.map { c =>
        li.select(col(c)).groupBy(col(c)).agg(count(lit(1)).as("cnt"))
          .agg(sum("cnt").cast("long").as("n"),
            coalesce(sum(when(col(c).isNull, col("cnt"))), lit(0L))
              .cast("long").as("n_null"),
            count(col(c)).cast("long").as("n_distinct"),
            approx_count_distinct(col(c), 0.02).as("apx"))
          .select(lit(c).as("col_name"), col("n"), col("n_null"),
            col("n_distinct"),
            when(abs(col("apx") - col("n_distinct")) / col("n_distinct")
              <= rsdBound, lit(1)).otherwise(lit(0)).as("approx_ok"))
      }.reduce(_.unionByName(_))
        .orderBy("col_name")
    },

    // ── T10: vocabulary encoding — the tokenize-to-ids step of a training
    // pipeline: vocab = top-100 corpus words by (count desc, word), ids by
    // rank; documents encode as (doc_id, pos, token_id), OOV = -1. The
    // vocab is bounded (top-k, then a 100-row window for ids) and joins
    // back as a BROADCAST — the corpus never shuffles to be encoded.
    Q("t10_vocab_encode",
      """WITH u AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '[ \t\n\f\r]+')) AS w
        |           FROM documents),
        |vc AS (SELECT w, count(*) AS c FROM u GROUP BY 1),
        |v AS (SELECT w, row_number() OVER (ORDER BY c DESC, w) AS id
        |      FROM vc ORDER BY c DESC, w LIMIT 100),
        |tok AS (SELECT doc_id,
        |               unnest(regexp_split_to_array(trim(text), '[ \t\n\f\r]+')) AS w,
        |               generate_subscripts(regexp_split_to_array(trim(text), '[ \t\n\f\r]+'), 1) AS pos
        |        FROM documents WHERE doc_id <= 50)
        |SELECT tok.doc_id, tok.pos, coalesce(v.id, -1) AS token_id
        |FROM tok LEFT JOIN v USING (w)
        |ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val u = docs.select(col("doc_id"),
        explode(split(trim(col("text")), "[ \\t\\n\\f\\r]+")).as("w"))
      val v = u.groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(100)
        .withColumn("id",
          row_number().over(Window.orderBy(col("c").desc, col("w"))).cast("long"))
        .select("w", "id")
      val tok = docs.filter(col("doc_id") <= 50)
        .select(col("doc_id"),
          posexplode(split(trim(col("text")), "[ \\t\\n\\f\\r]+")).as(Seq("pos0", "w")))
        .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("w"))
      tok.join(broadcast(v), Seq("w"), "left")
        .select(col("doc_id"), col("pos"),
          coalesce(col("id"), lit(-1L)).as("token_id"))
        .orderBy("doc_id", "pos")
    },

    // ── W6: batch sessionization — gap-based session ids (new session when
    // a user is idle > 30 min), the batch twin of st2's streaming session
    // window. Two window passes over the SAME (user_id, sec, event_id)
    // ordering — one shuffle on user_id total — then a keyed rollup.
    // Timestamps travel as floor-seconds BIGINTs in both engines (Spark
    // unix_timestamp vs DuckDB date_diff from epoch), sidestepping ns/µs
    // representation drift entirely.
    Q("w6_sessionize",
      """WITH e AS (SELECT user_id, event_id,
        |             date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
        |                       CAST(ts AS TIMESTAMP)) AS sec
        |           FROM events),
        |x AS (SELECT user_id, event_id, sec,
        |             CASE WHEN lag(sec) OVER w IS NULL
        |                    OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
        |s AS (SELECT user_id, sec,
        |             CAST(sum(is_new) OVER (PARTITION BY user_id
        |                                    ORDER BY sec, event_id) AS BIGINT) AS session_id
        |      FROM x)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(sec) AS start_s, max(sec) AS end_s
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
      val e = Tables.events(s, d).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"))
      e.withColumn("is_new",
          when(lag(col("sec"), 1).over(w).isNull ||
            col("sec") - lag(col("sec"), 1).over(w) > 1800, 1).otherwise(0))
        .withColumn("session_id", sum(col("is_new")).over(w).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("sec")).as("start_s"), max(col("sec")).as("end_s"))
        .orderBy("user_id", "session_id")
    },

    // ── T11: bigram-LM quality scoring (the CCNet-style perplexity filter
    // of a training pipeline): an add-one-smoothed bigram model built FROM
    // the corpus scores each document by mean log-probability of its
    // bigrams. Bigram formation is narrow (transform over the token array,
    // no self-join); the LM is a keyed count table; docs pre-aggregate
    // per (doc, bigram) before the LM join so the join input is distinct
    // bigrams per doc, not token positions (map-side combine). Context
    // totals and vocab size travel as 1-row broadcasts. Per-bigram log
    // probs round to 6 decimals in both engines (the t7/t9 contract) so
    // the doc average hashes identically.
    Q("t11_bigram_lm_score",
      """WITH toks AS (SELECT doc_id,
        |                regexp_split_to_array(trim(text), '[ \t\n\f\r]+') AS t
        |              FROM documents),
        |bg AS (SELECT doc_id,
        |         unnest(list_transform(range(1, len(t)),
        |                               i -> t[i] || ' ' || t[i+1])) AS b
        |       FROM toks WHERE len(t) >= 2),
        |bc AS (SELECT b, count(*) AS cb FROM bg GROUP BY 1),
        |ctx AS (SELECT split_part(b, ' ', 1) AS w, sum(cb) AS cw FROM bc GROUP BY 1),
        |vv AS (SELECT count(*) AS v FROM ctx),
        |lp AS (SELECT bc.b,
        |              CAST(round(ln((bc.cb + 1.0) / (ctx.cw + vv.v)) * 1e6) AS BIGINT) AS lpm
        |       FROM bc JOIN ctx ON ctx.w = split_part(bc.b, ' ', 1) CROSS JOIN vv),
        |db AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY 1, 2)
        |SELECT db.doc_id, CAST(sum(db.n) AS BIGINT) AS n_bigrams,
        |       CAST(sum(db.n * lp.lpm) AS BIGINT) AS score_micro
        |FROM db JOIN lp USING (b)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d).select(col("doc_id"),
        split(trim(col("text")), "[ \\t\\n\\f\\r]+").as("t"))
      val bg = toks.filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(slice(t, 1, size(t)-1), (x, i) -> concat(x, ' ', t[i+1]))")).as("b"))
      val bc = bg.groupBy("b").agg(count(lit(1)).as("cb"))
      val ctx = bc.groupBy(expr("split_part(b, ' ', 1)").as("w"))
        .agg(sum(col("cb")).as("cw"))
      val vv = ctx.agg(count(lit(1)).as("v"))
      // per-bigram log prob in INTEGER micro-units: the doc score is then an
      // exact integer sum — a rounded double average can land on a .5e-6
      // boundary where engines disagree in the last digit
      val lp = bc.join(ctx, expr("split_part(b, ' ', 1)") === col("w"))
        .crossJoin(broadcast(vv))
        .select(col("b"),
          round(log((col("cb") + 1.0) / (col("cw") + col("v"))) * 1e6)
            .cast("long").as("lpm"))
      val db = bg.groupBy("doc_id", "b").agg(count(lit(1)).as("n"))
      db.join(lp, "b").groupBy("doc_id")
        .agg(sum(col("n")).cast("long").as("n_bigrams"),
          sum(col("n") * col("lpm")).cast("long").as("score_micro"))
        .orderBy("doc_id")
    },

    // ── DSIR1: hashed-n-gram importance weighting (Xie et al. 2023,
    // arXiv:2302.03169 — the data-selection op of modern pretraining):
    // score every document by how target-like its hashed bigram features
    // are, weight = Σ count(bucket)·ln(p_target(bucket)/p_source(bucket)).
    // Here target = the corpus's `lang = 'en'` slice, source = the whole
    // corpus; features are bigrams hashed into 1024 buckets (the hashing
    // trick — fixed-size LMs regardless of vocabulary) via the md5
    // 16-bit bucket (graft.operators.Sampling, the sp1 arithmetic) mod
    // 1024, identical in both engines. Both LMs are 1024-row tables →
    // broadcast joins; totals are 1-row broadcasts; the corpus-side work
    // is one narrow bigram generator + keyed aggs on (doc, bucket). Log
    // ratios travel as INTEGER micro-units (the t11 contract) so the
    // per-doc sum is exact. Docs with < 2 tokens emit no row.
    //
    // KNOWN RISK (accepted): round(ln(ratio)*1e6) can differ by 1 between
    // libm (DuckDB) and the JVM when ln() lands within 1 ulp of a .5e-6
    // boundary — current corpora verify exact at every SF; if a future
    // corpus flakes here, the fix is a shared integer rational-to-fixed-
    // point log, not loosening the compare.
    Q("dsir1_importance",
      """WITH toks AS (SELECT doc_id, lang,
        |                regexp_split_to_array(trim(text), '[ \t\n\f\r]+') AS t
        |              FROM documents),
        |bg AS (SELECT doc_id, lang,
        |         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS b
        |       FROM toks WHERE len(t) >= 2),
        |hb AS (SELECT doc_id, lang,
        |         ((strpos('0123456789abcdef', substr(md5(b), 1, 1)) - 1) * 4096
        |        + (strpos('0123456789abcdef', substr(md5(b), 2, 1)) - 1) * 256
        |        + (strpos('0123456789abcdef', substr(md5(b), 3, 1)) - 1) * 16
        |        + (strpos('0123456789abcdef', substr(md5(b), 4, 1)) - 1)) % 1024 AS k
        |       FROM bg),
        |src AS (SELECT k, count(*) AS cs FROM hb GROUP BY 1),
        |tgt AS (SELECT k, count(*) AS ct FROM hb WHERE lang = 'en' GROUP BY 1),
        |tot AS (SELECT (SELECT count(*) FROM hb) AS ts,
        |               (SELECT count(*) FROM hb WHERE lang = 'en') AS tt),
        |lr AS (SELECT src.k,
        |         CAST(round(ln(((coalesce(tgt.ct, 0) + 1.0) / (tot.tt + 1024))
        |                     / ((src.cs + 1.0) / (tot.ts + 1024))) * 1e6) AS BIGINT) AS lrm
        |       FROM src LEFT JOIN tgt ON tgt.k = src.k CROSS JOIN tot),
        |db AS (SELECT doc_id, k, count(*) AS n FROM hb GROUP BY 1, 2)
        |SELECT db.doc_id, CAST(sum(db.n) AS BIGINT) AS n_feats,
        |       CAST(sum(db.n * lr.lrm) AS BIGINT) AS weight_micro
        |FROM db JOIN lr USING (k)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        split(trim(col("text")), "[ \\t\\n\\f\\r]+").as("t"))
      val bg = toks.filter(size(col("t")) >= 2)
        .select(col("doc_id"), col("lang"), explode(expr(
          "transform(slice(t, 1, size(t)-1), (x, i) -> concat(x, ' ', t[i+1]))")).as("b"))
      val hb = bg.select(col("doc_id"), col("lang"),
        pmod(graft.operators.Sampling.bucket(col("b")), lit(1024)).as("k"))
      val src = hb.groupBy("k").agg(count(lit(1)).as("cs"))
      val tgt = hb.filter(col("lang") === "en")
        .groupBy("k").agg(count(lit(1)).as("ct"))
      val tot = hb.agg(count(lit(1)).as("ts"),
        count(when(col("lang") === "en", lit(1))).as("tt"))
      val lr = src.join(tgt, Seq("k"), "left").crossJoin(broadcast(tot))
        .select(col("k"),
          round(log(((coalesce(col("ct"), lit(0L)) + 1.0) / (col("tt") + 1024)) /
            ((col("cs") + 1.0) / (col("ts") + 1024))) * 1e6)
            .cast("long").as("lrm"))
      val db = hb.groupBy("doc_id", "k").agg(count(lit(1)).as("n"))
      db.join(broadcast(lr), "k").groupBy("doc_id")
        .agg(sum(col("n")).cast("long").as("n_feats"),
          sum(col("n") * col("lrm")).cast("long").as("weight_micro"))
        .orderBy("doc_id")
    },

    // ── DQ2: cross-table referential expectations — the multi-table half
    // of dq1's single-table profiling: orphan foreign keys, duplicate
    // primary keys, and a deliberately-failing check (events.user_id is a
    // different id space than customer) proving violations are counted,
    // not just asserted zero. Each check is one anti-join (or keyed dup
    // count) + a 1-row count — at 100 TB the dim side broadcasts or a
    // runtime bloom prunes the fact shuffle (asserted for joins generally
    // in PlanSpec's bloom test).
    Q("dq2_referential",
      """SELECT 'c1_lineitem_orphan_order' AS check_name, count(*) AS n_bad
        |FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'c2_order_orphan_customer', count(*)
        |FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |UNION ALL
        |SELECT 'c3_lineitem_orphan_part', count(*)
        |FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
        |UNION ALL
        |SELECT 'c4_lineitem_orphan_supplier', count(*)
        |FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
        |UNION ALL
        |SELECT 'c5_duplicate_orderkey', count(*)
        |FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
        |UNION ALL
        |SELECT 'c6_events_user_not_customer', count(*)
        |FROM events e
        |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
        |ORDER BY check_name""".stripMargin) { (s, d) =>
      // the three lineitem checks ride ONE scan (dq1's single-pass lesson):
      // left joins against the three pk dims + conditional counts, stacked
      // to rows. Dim keys are primary keys (c5 asserts o_orderkey; TPC-H
      // part/supplier pks likewise unique) so the left joins preserve
      // row counts and each NULL right key IS one orphan fact row.
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_partkey", "l_suppkey")
      val liChecks = li
        .join(Tables.orders(s, d).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left")
        .join(Tables.part(s, d).select(col("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left")
        .join(Tables.supplier(s, d).select(col("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left")
        .agg(sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("c1"),
          sum(when(col("p_partkey").isNull, 1L).otherwise(0L)).as("c3"),
          sum(when(col("s_suppkey").isNull, 1L).otherwise(0L)).as("c4"))
        .select(explode(array(
          struct(lit("c1_lineitem_orphan_order").as("check_name"), col("c1").as("n_bad")),
          struct(lit("c3_lineitem_orphan_part").as("check_name"), col("c3").as("n_bad")),
          struct(lit("c4_lineitem_orphan_supplier").as("check_name"), col("c4").as("n_bad"))))
          .as("r"))
        .select(col("r.*"))
      def orphan(label: String, fact: DataFrame, factKey: String,
                 dim: DataFrame, dimKey: String): DataFrame =
        fact.join(dim, col(factKey) === col(dimKey), "left_anti")
          .agg(count(lit(1)).as("n_bad"))
          .select(lit(label).as("check_name"), col("n_bad"))
      val dup = Tables.orders(s, d).groupBy("o_orderkey")
        .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)
        .agg(count(lit(1)).as("n_bad"))
        .select(lit("c5_duplicate_orderkey").as("check_name"), col("n_bad"))
      liChecks
        .unionByName(orphan("c2_order_orphan_customer",
          Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d).select("c_custkey"), "c_custkey"))
        .unionByName(dup)
        .unionByName(orphan("c6_events_user_not_customer",
          Tables.events(s, d), "user_id",
          Tables.customer(s, d).select("c_custkey"), "c_custkey"))
        .orderBy("check_name")
    },

    // ── SP5: temperature-based source mixture sampling (the DoReMi/Pile-
    // style domain reweighting step): target share per source ∝ count^0.5,
    // realized by deterministic per-row hash thresholds (sp4's md5-bucket
    // device) so the SAME rows are chosen on every run, engine, and
    // partitioning. Per-source rates are a tiny broadcast; the corpus pass
    // is a narrow filter — one aggregation + one map over the data.
    Q("sp5_source_mixture",
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        |w AS (SELECT source, n, sqrt(n) AS wt FROM c),
        |tw AS (SELECT sum(wt) AS tot FROM w),
        |r AS (SELECT source, least(1.0, (200.0 * wt / tot) / n) AS rate
        |      FROM w CROSS JOIN tw),
        |b AS (SELECT doc_id, source,
        |  (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |+ (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |+ (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |+ (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) AS bkt
        |FROM documents)
        |SELECT b.doc_id, b.source FROM b JOIN r USING (source)
        |WHERE (b.bkt + 0.5) / 65536.0 < r.rate
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val c = docs.groupBy("source").agg(count(lit(1)).as("n"))
      val w = c.withColumn("wt", sqrt(col("n")))
      val tw = w.agg(sum(col("wt")).as("tot"))
      val r = w.crossJoin(broadcast(tw)).select(col("source"),
        least(lit(1.0), (lit(200.0) * col("wt") / col("tot")) / col("n")).as("rate"))
      val b = docs.select(col("doc_id"), col("source"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("int").as("bkt"))
      b.join(broadcast(r), "source")
        .filter((col("bkt") + 0.5) / 65536.0 < col("rate"))
        .select("doc_id", "source").orderBy("doc_id")
    },

    // ── BPE1: tokenizer training — the first 5 BPE merges over the corpus
    // word-count vocabulary (graft.text.Bpe). All rounds run on the VOCAB
    // (|distinct words| rows), never the corpus; greedy-leftmost same-
    // symbol runs resolve via gaps-and-islands windows, structurally
    // identical in the unrolled DuckDB oracle.
    Q("bpe1_train_merges",
      graft.text.Bpe.unrolledSql(
        """SELECT w AS word, count(*) AS cnt FROM (
          |  SELECT unnest(regexp_split_to_array(trim(text), '[ \t\n\f\r]+')) AS w
          |  FROM documents) WHERE w <> '' GROUP BY 1""".stripMargin,
        k = 5)) { (s, d) =>
      val vocab = Tables.documents(s, d)
        .select(explode(split(trim(col("text")), "[ \\t\\n\\f\\r]+")).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w").as("word")).agg(count(lit(1)).as("cnt"))
      graft.text.Bpe.trainMerges(vocab, k = 5).orderBy("merge_rank")
    },

    // ── BPE2: tokenizer application — bpe1's trained merges APPLIED: the
    // symbol table after round k IS the encoded vocabulary (how real
    // tokenizers encode: merge rules replay against the word list, and
    // documents inherit by word lookup — the corpus is never re-segmented,
    // so encoding 100 TB costs one vocab-count scan plus vocab-sized
    // rounds). Output = each word's token sequence + token count; the
    // reassembly digest (pos-ordered string_agg vs the collect_list/
    // array_sort twin) pins greedy-leftmost merge order end to end.
    Q("bpe2_apply_merges",
      graft.text.Bpe.encodeSql(
        """SELECT w AS word, count(*) AS cnt FROM (
          |  SELECT unnest(regexp_split_to_array(trim(text), '[ \t\n\f\r]+')) AS w
          |  FROM documents) WHERE w <> '' GROUP BY 1""".stripMargin,
        k = 5)) { (s, d) =>
      encodedVocabDf(s, d)
        .groupBy("word", "cnt")
        .agg(expr("array_join(transform(array_sort(collect_list(" +
            "struct(pos, sym))), x -> x.sym), ' ')").as("tokens"),
          count(lit(1)).as("n_tokens"))
        .orderBy("word")
    },

    // ── TOK1: tokenizer fertility distribution — the evaluation step after
    // bpe1 (train) and bpe2 (apply): how many tokens does the tokenizer
    // spend per word, weighted by corpus frequency (word_mass)? The metric
    // behind "this tokenizer wastes context window on language X". Buckets
    // by tokens-per-word; mass_ppm (integer ppm via div) gives the
    // frequency-weighted shape — fertility = Σ n_tokens·mass / Σ mass is
    // derivable from the rows. All heavy work is the vocab-sized encode
    // chain; the rollups are |token-count buckets| rows, and the one
    // unpartitioned window runs over THAT bounded table (≤ max word
    // length), never data-sized.
    Q("tok1_fertility", {
      val enc = graft.text.Bpe.encodeSql(
        """SELECT w AS word, count(*) AS cnt FROM (
          |  SELECT unnest(regexp_split_to_array(trim(text), '[ \t\n\f\r]+')) AS w
          |  FROM documents) WHERE w <> '' GROUP BY 1""".stripMargin,
        k = 5)
      s"""SELECT n_tokens, n_words, word_mass,
         |       CAST(word_mass * 1000000
         |            // CAST(sum(word_mass) OVER () AS BIGINT) AS BIGINT) AS mass_ppm
         |FROM (SELECT n_tokens, CAST(count(*) AS BIGINT) AS n_words,
         |             CAST(sum(cnt) AS BIGINT) AS word_mass
         |      FROM ($enc) GROUP BY 1)
         |ORDER BY n_tokens""".stripMargin
    }) { (s, d) =>
      encodedVocabDf(s, d)
        .groupBy("word", "cnt").agg(count(lit(1)).as("n_tokens"))
        .groupBy("n_tokens")
        .agg(count(lit(1)).as("n_words"), sum("cnt").as("word_mass"))
        .select(col("n_tokens"), col("n_words"), col("word_mass"),
          expr("word_mass * 1000000 div sum(word_mass) over ()").as("mass_ppm"))
        .orderBy("n_tokens")
    },

    // ── EMB1: int8 vector quantization — the storage-compression step of
    // an embedding pipeline (4× smaller than float32; the per-vector norm
    // is the dequantization scale). Pure narrow maps, no shuffle: norm =
    // sequential fold over the array (identical accumulation order in both
    // engines — Spark `aggregate` with 0.0 init ≡ DuckDB `list_reduce`,
    // since 0+x² == x² exactly; a zero-length embedding is norm 0 / q8 ''
    // on BOTH sides, guarded in the oracle because list_reduce errors on
    // empty lists), elements round away-from-zero in both.
    // The quantized vector travels as a comma-joined string so the hash
    // compare is representation-exact.
    Q("emb1_quantize_int8",
      """WITH n AS (SELECT vec_id, embedding,
        |  CASE WHEN len(embedding) = 0 THEN CAST(0 AS DOUBLE)
        |       ELSE sqrt(list_reduce(list_transform(embedding,
        |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))
        |  END AS norm
        |  FROM embeddings)
        |SELECT vec_id, round(norm, 6) AS norm_r,
        |  CASE WHEN norm = 0 THEN '' ELSE
        |    array_to_string(list_transform(embedding,
        |      x -> CAST(CAST(round(CAST(x AS DOUBLE) / norm * 127) AS INTEGER) AS VARCHAR)), ',')
        |  END AS q8
        |FROM n ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .withColumn("norm", expr(
          "sqrt(aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"))
        .select(col("vec_id"), round(col("norm"), 6).as("norm_r"),
          when(col("norm") === 0.0, lit("")).otherwise(expr(
            "array_join(transform(embedding, " +
              "x -> CAST(CAST(round(CAST(x AS DOUBLE) / norm * 127) AS INT) AS STRING)), ',')"))
            .as("q8"))
        .orderBy("vec_id")
    },

    // ── BF1: Bloom-filter semi-join — the runtime-filter pattern Spark's
    // own InjectRuntimeFilter rule uses, here as an explicit operator with
    // a measured contract: build a 2048-bit / 3-hash Bloom filter from the
    // FILTERED dim side (customers with c_acctbal > 7500), probe every
    // orders row, and report probe/exact/candidate/false-positive counts
    // plus a no-false-negatives flag the oracle asserts as literal 1.
    // Scale shape: the build side collapses to ≤ 2048 distinct bit
    // positions → a 1-ROW broadcast array; the probe is a narrow per-row
    // array_contains ×3 inside codegen — the fact table NEVER shuffles
    // (contrast j3's semi-join, which shuffles both sides). Hashes are
    // md5-nibble arithmetic (the sp1/sp4 family), identical in both
    // engines; every output is an exact integer.
    Q("bf1_bloom_semijoin", {
      def posSql(expr: String, i: Int): String = {
        val h = s"md5('$i:' || CAST($expr AS VARCHAR))"
        s"(((strpos('0123456789abcdef', substr($h, 1, 1)) - 1) * 4096 " +
          s"+ (strpos('0123456789abcdef', substr($h, 2, 1)) - 1) * 256 " +
          s"+ (strpos('0123456789abcdef', substr($h, 3, 1)) - 1) * 16 " +
          s"+ (strpos('0123456789abcdef', substr($h, 4, 1)) - 1)) % 2048)"
      }
      val buildPos = (0 until 3).map(posSql("k", _))
      val probeIn = (0 until 3)
        .map(i => s"${posSql("o.o_custkey", i)} IN (SELECT pos FROM bits)")
        .mkString(" AND ")
      s"""WITH b AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 7500),
         |bits AS (SELECT DISTINCT unnest(ARRAY[${buildPos.mkString(", ")}]) AS pos FROM b),
         |p AS (SELECT o.o_orderkey,
         |             CAST($probeIn AS INT) AS pass,
         |             CAST(o.o_custkey IN (SELECT k FROM b) AS INT) AS is_exact
         |      FROM orders o)
         |SELECT count(*) AS n_probe,
         |       CAST(sum(is_exact) AS BIGINT) AS n_exact,
         |       CAST(sum(pass) AS BIGINT) AS n_candidates,
         |       CAST(sum(CASE WHEN pass = 1 AND is_exact = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_fp,
         |       CAST(sum(CASE WHEN is_exact = 1 AND pass = 0 THEN 1 ELSE 0 END) = 0 AS INT) AS no_fn
         |FROM p""".stripMargin
    }) { (s, d) =>
      val bf = graft.operators.BloomFilter
      val build = Tables.customer(s, d).filter(col("c_acctbal") > 7500)
        .select(col("c_custkey").as("k"))
      // ≤ 2048 distinct bit positions → ONE row, broadcast everywhere
      val bitsRow = bf.build(build, "k")
      val keys = build.distinct().withColumn("is_exact", lit(1))
      Tables.orders(s, d)
        .join(broadcast(keys), col("o_custkey") === col("k"), "left")
        .crossJoin(broadcast(bitsRow))
        .select(
          bf.mightContain(col("bloom_bits"), col("o_custkey"))
            .cast("int").as("pass"),
          coalesce(col("is_exact"), lit(0)).as("is_exact"))
        .agg(count(lit(1)).as("n_probe"),
          sum(col("is_exact")).cast("long").as("n_exact"),
          sum(col("pass")).cast("long").as("n_candidates"),
          sum(when(col("pass") === 1 && col("is_exact") === 0, 1).otherwise(0))
            .cast("long").as("n_fp"),
          (sum(when(col("is_exact") === 1 && col("pass") === 0, 1).otherwise(0)) === 0)
            .cast("int").as("no_fn"))
    },

    // ── DQ3: PSI distribution drift — the standard production-ML monitor
    // (population stability index) between a slice (lang='en', the
    // "current window") and the whole corpus (the "reference"): bucket
    // n_chars into fixed 100-char bins (h1's data-independent binning —
    // no quantile pass), PSI contribution = (p−q)·ln(p/q) per bin with
    // add-one smoothing over the union bin set so empty bins are defined.
    // Contributions travel as INTEGER micro-units (exact Σ); the final
    // row carries total_psi_micro + the drift verdict at the industry
    // 0.2 threshold. Two keyed aggs + 1-row broadcast totals — the corpus
    // scans once, bins are the only shuffle key.
    Q("dq3_psi_drift",
      """WITH b AS (SELECT CAST(n_chars // 100 AS BIGINT) AS bucket,
        |                  CAST(lang = 'en' AS INT) AS is_en FROM documents),
        |cnt AS (SELECT bucket, count(*) AS nq, CAST(sum(is_en) AS BIGINT) AS np FROM b GROUP BY 1),
        |tot AS (SELECT CAST(sum(nq) AS DOUBLE) AS tq, CAST(sum(np) AS DOUBLE) AS tp,
        |               count(*) AS nb FROM cnt),
        |c AS (SELECT bucket, np, nq,
        |             (np + 1) / (tp + nb) AS p, (nq + 1) / (tq + nb) AS q
        |      FROM cnt, tot),
        |psi AS (SELECT bucket, np, nq,
        |               CAST(round(1000000 * ((p - q) * ln(p / q))) AS BIGINT) AS psi_micro
        |        FROM c)
        |SELECT bucket, np, nq, psi_micro,
        |       CAST(sum(psi_micro) OVER () AS BIGINT) AS total_psi_micro,
        |       CAST(sum(psi_micro) OVER () > 200000 AS INT) AS drifted
        |FROM psi ORDER BY bucket""".stripMargin) { (s, d) =>
      val b = Tables.documents(s, d).select(
        expr("n_chars div 100").as("bucket"),
        (col("lang") === "en").cast("int").as("is_en"))
      val cnt = b.groupBy("bucket")
        .agg(count(lit(1)).as("nq"), sum(col("is_en")).cast("long").as("np"))
      val tot = cnt.agg(sum(col("nq")).cast("double").as("tq"),
        sum(col("np")).cast("double").as("tp"), count(lit(1)).as("nb"))
      val psi = cnt.crossJoin(broadcast(tot))
        .select(col("bucket"), col("np"), col("nq"),
          round(lit(1000000) * ((((col("np") + 1) / (col("tp") + col("nb")))
              - ((col("nq") + 1) / (col("tq") + col("nb"))))
            * log(((col("np") + 1) / (col("tp") + col("nb")))
              / ((col("nq") + 1) / (col("tq") + col("nb"))))))
            .cast("long").as("psi_micro"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      psi.select(col("bucket"), col("np"), col("nq"), col("psi_micro"),
          sum(col("psi_micro")).over(w).cast("long").as("total_psi_micro"),
          (sum(col("psi_micro")).over(w) > 200000).cast("int").as("drifted"))
        .orderBy("bucket")
    },

    // ── DQ4: Benford first-digit audit — the fabricated-data screen
    // (Benford 1938; the standard forensic-accounting test): the first
    // significant digit of organic monetary amounts follows
    // P(d) = log10(1 + 1/d); a synthesized or truncated feed deviates.
    // The expected shares are nine CONSTANTS (hard-coded ppm literals, so
    // no engine ever calls log10), the observed shares and the chi-square
    // contribution are pure integer arithmetic (div), and the per-digit
    // deviation makes the readout actionable (WHICH digit is off, not
    // just "something is"). One keyed agg to 9 rows + a 9-row window —
    // the corpus scans once at any scale.
    Q("dq4_benford",
      """WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |           FROM orders),
        |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
        |e(digit, exp_ppm) AS (VALUES (1, 301030), (2, 176091), (3, 124939),
        |                             (4, 96910), (5, 79181), (6, 66947),
        |                             (7, 58004), (8, 51153), (9, 45757)),
        |t AS (SELECT c.digit, n, CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
        |             CAST(sum(n) OVER () AS BIGINT) AS total
        |      FROM c JOIN e ON e.digit = c.digit)
        |SELECT digit, n,
        |       n * 1000000 // total AS obs_ppm, exp_ppm,
        |       abs(n * 1000000 // total - exp_ppm) AS dev_ppm,
        |       CAST(CAST(n - exp_ppm * total // 1000000 AS HUGEINT)
        |              * (n - exp_ppm * total // 1000000)
        |              // (exp_ppm * total // 1000000) AS BIGINT) AS chi2
        |FROM t ORDER BY digit""".stripMargin) { (s, d) =>
      benfordAudit(Tables.orders(s, d), "o_totalprice").orderBy("digit")
    },

    // ── SCD1: slowly-changing-dimension type-2 history build — the CDC
    // op downstream of m1's upsert: collapse each user's event stream to
    // its event_type TRANSITIONS, each carrying [valid_from, valid_to)
    // and an is_current flag (lead(ts) per user). Two windows on the SAME
    // (user_id)(ts, event_id) ordering → ONE shuffle on the natural key,
    // then everything is per-partition; ties on ts break on event_id so
    // the history is a pure function of the data. since_event keeps the
    // initiating event for lineage (and makes the output order total).
    Q("scd1_type2_history",
      """WITH e AS (SELECT user_id, event_id, ts, event_type,
        |                  lag(event_type) OVER (PARTITION BY user_id
        |                    ORDER BY ts, event_id) AS prev
        |           FROM events),
        |ch AS (SELECT user_id, event_id, ts, event_type FROM e
        |       WHERE prev IS NULL OR prev <> event_type),
        |v AS (SELECT user_id, event_type, ts AS valid_from,
        |             lead(ts) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS valid_to,
        |             event_id AS since_event
        |      FROM ch)
        |SELECT user_id, event_type, valid_from, valid_to, since_event,
        |       CAST(valid_to IS NULL AS INT) AS is_current
        |FROM v ORDER BY user_id, valid_from, since_event""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val ch = Tables.events(s, d)
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      ch.select(col("user_id"), col("event_type"),
          col("ts").as("valid_from"),
          lead(col("ts"), 1).over(w).as("valid_to"),
          col("event_id").as("since_event"))
        .withColumn("is_current", col("valid_to").isNull.cast("int"))
        .orderBy("user_id", "valid_from", "since_event")
    },

    // ── TS1: time-series resample + gap fill — hourly per-type event
    // rollup on a DENSE hour grid (215 genuinely empty cells at sf0.01),
    // empty hours carried forward with last-non-null (the standard
    // downsample-then-ffill). The grid is dims-only (types × hours, both
    // from 1-row/broadcast aggregates) — the fact table aggregates ONCE
    // on (event_type, hour) with map-side partials and exact integer
    // cents; the fill is one window per type ordered by hour. At 100 TB
    // the grid stays tiny while the fact scan is the only heavy stage.
    Q("ts1_resample_ffill",
      """WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0,
        |                  date_trunc('hour', max(ts)) AS h1 FROM events),
        |hours AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b),
        |et AS (SELECT DISTINCT event_type FROM events),
        |grid AS (SELECT et.event_type, hours.hour FROM et, hours),
        |a AS (SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n,
        |             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |      FROM events GROUP BY 1, 2),
        |j AS (SELECT g.event_type, g.hour, coalesce(a.n, 0) AS n, a.cents
        |      FROM grid g LEFT JOIN a ON a.event_type = g.event_type AND a.hour = g.hour)
        |SELECT event_type, hour, n,
        |       last_value(cents IGNORE NULLS) OVER (
        |         PARTITION BY event_type ORDER BY hour
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
        |FROM j ORDER BY event_type, hour""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val b = ev.agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      val hours = b.select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
      val grid = ev.select("event_type").distinct().crossJoin(broadcast(hours))
      val a = ev.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
      val w = Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(a, Seq("event_type", "hour"), "left")
        .select(col("event_type"), col("hour"),
          coalesce(col("n"), lit(0L)).as("n"),
          last(col("cents"), ignoreNulls = true).over(w).as("filled_cents"))
        .orderBy("event_type", "hour")
    },

    // ── ED1: entity resolution via sorted-neighborhood blocking (Hernández
    // & Stolfo, SIGMOD'95): rank records in total (p_name, p_partkey) order
    // and compare each record ONLY to its next `w`=3 successors — O(n·w)
    // candidate pairs at any corpus size, where key-equality blocking
    // leaves n²/blocks and all-pairs is out of the question. The rank
    // comes from GlobalIds (range repartition + O(P) prefix sum — no
    // single-partition window over the data), the offset probe is a narrow
    // explode of 3 longs, the pair join is an equi-join on the rank, and
    // levenshtein runs codegen'd on candidates only. Pairs are emitted in
    // canonical (least, greatest) key orientation; rank uniqueness makes
    // each pair appear exactly once.
    Q("ed1_fuzzy_neighbors",
      """WITH r AS (SELECT p_partkey, p_name,
        |            row_number() OVER (ORDER BY p_name, p_partkey) - 1 AS rn
        |          FROM part),
        |pr AS (SELECT least(x.p_partkey, y.p_partkey) AS a,
        |              greatest(x.p_partkey, y.p_partkey) AS b,
        |              levenshtein(x.p_name, y.p_name) AS d
        |       FROM r x JOIN r y ON y.rn BETWEEN x.rn + 1 AND x.rn + 3)
        |SELECT a, b, CAST(d AS BIGINT) AS d FROM pr WHERE d <= 4
        |ORDER BY a, b""".stripMargin) { (s, dir) =>
      val p = Tables.part(s, dir).select("p_partkey", "p_name")
      val r = graft.operators.GlobalIds
        .withGlobalId(p, "rn", col("p_name"), col("p_partkey"))
      val probes = r
        .select(col("p_partkey").as("xk"), col("p_name").as("xn"),
          explode(sequence(col("rn") + 1, col("rn") + 3)).as("rn"))
      probes.join(r, "rn")
        .select(least(col("xk"), col("p_partkey")).as("a"),
          greatest(col("xk"), col("p_partkey")).as("b"),
          levenshtein(col("xn"), col("p_name")).cast("long").as("d"))
        .filter(col("d") <= 4)
        .orderBy("a", "b")
    },

    // ── OLS1: grouped closed-form least squares (price on quantity per
    // return flag) from the five sufficient statistics (n, Σx, Σy, Σxy,
    // Σx²) — ONE keyed agg with map-side partials over exact integer units
    // (quantity units / price cents), so the sums are identical at any
    // partition count; slope/intercept are a handful of driver-free double
    // ops on the 3-row aggregate. The 100 TB story is the whole point:
    // regression over any corpus is a single pass + O(groups) arithmetic,
    // never an iterative solver. Both engines run the same expression
    // shapes on the same exact sums, so the rounded outputs match bitwise.
    Q("ols1_group_regression",
      """WITH s AS (SELECT l_returnflag,
        |             count(*) AS n,
        |             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sx,
        |             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sy,
        |             CAST(sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sxx,
        |             CAST(sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sxy
        |           FROM lineitem GROUP BY 1),
        |t AS (SELECT l_returnflag, n, sx, sy,
        |        (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS sc
        |      FROM s)
        |SELECT l_returnflag, n, round(sc / 100.0, 6) AS slope,
        |       round((CAST(sy AS DOUBLE) / 100.0 - sc / 100.0 * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept
        |FROM t ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val qty = round(col("l_quantity")).cast("long")
      val cents = round(col("l_extendedprice") * 100).cast("long")
      val sums = Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(qty).as("sx"), sum(cents).as("sy"),
          sum(qty * qty).as("sxx"), sum(qty * cents).as("sxy"))
      val d = (c: String) => col(c).cast("double")
      val sc = (d("n") * d("sxy") - d("sx") * d("sy")) /
        (d("n") * d("sxx") - d("sx") * d("sx"))
      sums.withColumn("sc", sc)
        .select(col("l_returnflag"), col("n"),
          round(col("sc") / 100.0, 6).as("slope"),
          round((d("sy") / 100.0 - col("sc") / 100.0 * d("sx")) / d("n"), 6)
            .as("intercept"))
        .orderBy("l_returnflag")
    }
  )

  /** BPE-encoded corpus vocabulary (5 merges), memoized per (session, dir)
    * like the shingle cache: bpe2 and tok1 both consume the same 5-round
    * merge chain, so the chain runs once per dataset, not once per query.
    * Correctness never depends on the memo — a dropped entry rebuilds.
    */
  private def encodedVocabDf(s: SparkSession, d: String): DataFrame =
    graft.CacheRegistry.memoized(s, d, "bpe-encoded") {
      val vocab = Tables.documents(s, d)
        .select(explode(split(trim(col("text")), "[ \\t\\n\\f\\r]+")).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w").as("word")).agg(count(lit(1)).as("cnt"))
      graft.text.Bpe.encodeVocab(vocab, k = 5)
    }

  /** dq4's operator: Benford first-digit audit of a monetary column
    * (amounts in dollars; first digit taken from exact integer cents).
    * Expected shares are hard-coded log10(1+1/d) ppm literals — neither
    * engine calls log10 — and the chi-square contribution squares through
    * decimal(38,0) (HUGEINT twin) so it never overflows int64.
    */
  def benfordAudit(df: DataFrame, amountCol: String): DataFrame = {
    val s = df.sparkSession
    val digits = df.select(
      expr(s"cast(substring(cast(cast(round($amountCol * 100) as bigint) as string), 1, 1) as bigint)")
        .as("digit"))
    val c = digits.groupBy("digit").agg(count(lit(1)).as("n"))
    val e = s.createDataFrame(Seq(
      (1L, 301030L), (2L, 176091L), (3L, 124939L), (4L, 96910L),
      (5L, 79181L), (6L, 66947L), (7L, 58004L), (8L, 51153L),
      (9L, 45757L))).toDF("digit", "exp_ppm")
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    c.join(broadcast(e), "digit")
      .withColumn("total", sum(col("n")).over(w).cast("long"))
      .select(col("digit"), col("n"),
        expr("n * 1000000 div total").as("obs_ppm"), col("exp_ppm"),
        expr("abs(n * 1000000 div total - exp_ppm)").as("dev_ppm"),
        // the quotient floors identically in both engines (operands >= 0)
        expr("""cast(floor(cast(n - exp_ppm * total div 1000000 as decimal(38,0))
                * (n - exp_ppm * total div 1000000)
                / (exp_ppm * total div 1000000)) as bigint)""").as("chi2"))
  }
}
