package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}
import graft.operators.{GlobalIds, Sampling}

/** Round-12 extensions, wave 9: the engine-operations wave — personalized
  * PageRank (ppr1: "what's near THESE nodes", completing the PageRank
  * pair), farthest-point k-means seeding (km3: the deterministic k-center
  * init km1/km2 assumed), a top-k-with-OTHER pivot guard (v2: the cap that
  * makes v1's dynamic pivot safe on unbounded key domains), a range-split
  * planner (rp1: the balanced repartitionByRange boundaries Spark derives
  * by driver-side sampling, computed IN-PLAN from a deterministic hash
  * sample), and grouped-jackknife error bars (ci1: the standard error a
  * corpus metric needs before anyone acts on a day-over-day delta).
  *
  * Determinism contracts: integer ppm/micro with truncating division and
  * the sign device; embedding distances are the km1 family's documented
  * round(·,4) doubles; ppr1 uses gr1's per-round rounding; ci1's terminal
  * sqrt is wt1's one-double-expression device.
  *
  * Scale design (100 TB):
  *  - ppr1 inherits PageRank's contract: edges partitioned once + cached,
  *    only the O(|nodes|) rank side shuffles per round, seeds broadcast.
  *  - km3's three rounds are each ONE corpus scan against a ≤2-row
  *    broadcast of chosen centroids, argmax via TakeOrdered(1) — no
  *    driver-side vectors, no global sort.
  *  - v2 collects only the BOUNDED top-k key list (3 rows — the pivot-key
  *    collect class, v1's device made safe: the cap holds whatever the
  *    key-domain cardinality), everything else folds into 'other'.
  *  - rp1 ranks the deterministic sample with GlobalIds (range-repartition
  *    + O(P) prefix sum — never a single-partition sort), picks the 15
  *    boundary keys by rank arithmetic against a 1-row broadcast, and
  *    measures achieved balance with ONE fact scan against the 16-row
  *    broadcast interval table.
  *  - ci1 is one keyed agg to 32 bucket rows; all jackknife arithmetic
  *    happens on that bounded table.
  */
object Wave9Queries {

  def all: Seq[Q] = Seq(

    // ── PPR1: personalized PageRank from the NATION_1 suppliers on the
    // supplier co-purchase graph — gr1 ranks global importance; ppr1 ranks
    // proximity to a seed set (the "related to your catalog" query behind
    // recommendation candidates). Three unrolled rounds, teleport mass
    // 0.15/|seeds| on seeds only, per-round round(·,9) keeps both engines
    // in lockstep (gr1's device); never-reached nodes (pr = 0) drop so
    // the result is the seeds' 3-hop neighborhood ranking. Edge build =
    // gr2's capped collector (fanout ≤ 25, pinned in the oracle).
    Q("ppr1_personalized_pagerank",
      graft.graph.PageRank.personalizedSql(
        """WITH base AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
          |              FROM lineitem WHERE l_quantity >= 40),
          |hot AS (SELECT o FROM base GROUP BY o HAVING count(*) > 25),
          |bc AS (SELECT b.o, b.s FROM base b
          |       WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.o = b.o)),
          |e AS MATERIALIZED (SELECT DISTINCT x.s AS a, y.s AS b
          |     FROM bc x JOIN bc y ON x.o = y.o AND x.s < y.s),
          |ed AS MATERIALIZED (SELECT a AS src, b AS dst FROM e
          |     UNION SELECT b, a FROM e),
          |seeds0 AS (SELECT CAST(s_suppkey AS BIGINT) AS node FROM supplier
          |           WHERE s_nationkey = 1)""".stripMargin,
        iters = 3, topK = 20)) { (s, d) =>
      val base = Tables.lineitem(s, d).filter(col("l_quantity") >= 40)
        .select(col("l_orderkey").as("o"), col("l_suppkey").as("s"))
      val e = AnalyticsQueries.coPurchaseEdges(base, maxOrderFanout = Some(25))
      val ed = e.select(col("a").as("src"), col("b").as("dst"))
        .union(e.select(col("b").as("src"), col("a").as("dst")))
      val seeds = Tables.supplier(s, d).filter(col("s_nationkey") === 1)
        .select(col("s_suppkey").cast("long").as("node"))
      graft.graph.PageRank.runPersonalized(ed, seeds, iters = 3)
        .filter(col("pr") > 0.0)
        .orderBy(col("pr").desc, col("node")).limit(20)
    },

    // ── KM3: farthest-point (k-center / maxmin) k-means seeding — the
    // deterministic init km1/km2 assumed as given (their codebooks are
    // "vec_id < k" by convention; km3 is the principled seeding: each new
    // centroid is the point FARTHEST from the chosen set, the standard
    // 2-approximation to k-center and the deterministic cousin of
    // kmeans++). Three rounds, each ONE corpus scan against the ≤2-row
    // broadcast of chosen vectors; distances are the km1 family's
    // round(Σ(Δ²), 4) doubles; argmax ties break to the smallest vec_id
    // via TakeOrdered(1) on (dist desc, vec_id). Seed 1 is the minimum
    // vec_id (1-row broadcast anchor).
    Q("km3_farthest_init",
      """WITH m AS (SELECT min(vec_id) AS c1 FROM embeddings),
        |p1 AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[64]) AS v
        |       FROM embeddings e JOIN m ON e.vec_id = m.c1),
        |d1 AS (SELECT e.vec_id,
        |         round(sum((CAST(e.embedding[r.range+1] AS DOUBLE) - p1.v[r.range+1])
        |                 * (CAST(e.embedding[r.range+1] AS DOUBLE) - p1.v[r.range+1])), 4) AS dist
        |       FROM embeddings e, p1, range(64) r GROUP BY 1),
        |c2 AS (SELECT vec_id, dist FROM d1 ORDER BY dist DESC, vec_id LIMIT 1),
        |ch AS (SELECT m.c1 AS vec_id FROM m UNION ALL SELECT vec_id FROM c2),
        |d2 AS (SELECT e.vec_id, min(dd.dist) AS dist
        |       FROM embeddings e,
        |            LATERAL (SELECT round(sum((CAST(e.embedding[r.range+1] AS DOUBLE)
        |                              - CAST(c.embedding[r.range+1] AS DOUBLE))
        |                            * (CAST(e.embedding[r.range+1] AS DOUBLE)
        |                              - CAST(c.embedding[r.range+1] AS DOUBLE))), 4) AS dist
        |                     FROM ch JOIN embeddings c ON c.vec_id = ch.vec_id, range(64) r
        |                     GROUP BY ch.vec_id) dd
        |       GROUP BY 1),
        |c3 AS (SELECT vec_id, dist FROM d2 ORDER BY dist DESC, vec_id LIMIT 1)
        |SELECT CAST(1 AS BIGINT) AS round, m.c1 AS vec_id, CAST(NULL AS DOUBLE) AS dist FROM m
        |UNION ALL SELECT 2, vec_id, dist FROM c2
        |UNION ALL SELECT 3, vec_id, dist FROM c3
        |ORDER BY round""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      def sq(a: Column, b: Column): Column =
        round(expr("aggregate(zip_with(cast(va as array<double>), cast(vb as array<double>)," +
          " (x, y) -> (x - y) * (x - y)), 0d, (acc, z) -> acc + z)"), 4)
      val m = emb.agg(min("vec_id").as("c1"))
      val p1 = emb.join(broadcast(m), col("vec_id") === col("c1"))
        .select(col("vec_id").as("cid"), col("embedding").as("vb"))
      def minDist(chosen: DataFrame): DataFrame = emb
        .select(col("vec_id"), col("embedding").as("va"))
        .crossJoin(broadcast(chosen))
        .select(col("vec_id"), sq(col("va"), col("vb")).as("dist"))
        .groupBy("vec_id").agg(min("dist").as("dist"))
      val c2 = minDist(p1).orderBy(col("dist").desc, col("vec_id")).limit(1)
      val ch2 = p1.select("cid")
        .unionAll(c2.select(col("vec_id").as("cid")))
        .join(emb, col("cid") === emb("vec_id"))
        .select(col("cid"), col("embedding").as("vb"))
      val c3 = minDist(ch2).orderBy(col("dist").desc, col("vec_id")).limit(1)
      m.select(lit(1L).as("round"), col("c1").as("vec_id"),
          lit(null).cast("double").as("dist"))
        .unionAll(c2.select(lit(2L).as("round"), col("vec_id"), col("dist")))
        .unionAll(c3.select(lit(3L).as("round"), col("vec_id"), col("dist")))
        .orderBy("round")
    },

    // ── V2: top-k-with-OTHER pivot guard — v1's dynamic pivot collects
    // the DISTINCT key set to the driver, which is only safe while the
    // key domain is column-dimension-bounded; v2 is the cap that makes it
    // safe on ANY domain: pivot columns = the top-3 event types by global
    // count (total order: count desc, then name), everything else folds
    // into 'other'. The collect is 3 rows BY CONSTRUCTION (the pivot-key
    // class with a guaranteed bound). The wide pivot then unpivots back to
    // long form so the oracle stays SF-general (pivot column NAMES are
    // data-dependent; a long-form compare is the v1/p9 pair's device).
    Q("v2_pivot_topk_other",
      """WITH cnt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |             FROM events GROUP BY 1),
        |top AS (SELECT event_type FROM cnt ORDER BY n DESC, event_type LIMIT 3),
        |mapped AS (SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)),
        |                           '%Y-%m-%d') AS day,
        |             CASE WHEN event_type IN (SELECT event_type FROM top)
        |                  THEN event_type ELSE 'other' END AS bucket
        |           FROM events)
        |SELECT day, bucket, CAST(count(*) AS BIGINT) AS n
        |FROM mapped GROUP BY 1, 2 ORDER BY day, bucket""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      // BOUNDED driver collect (3 rows by construction — the pivot-key
      // class with a cap the data cannot exceed)
      val top = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("event_type")).limit(3)
        .collect().map(_.getString(0)).toSeq
      // an event_type literally named 'other' must not yield a duplicate
      // pivot column (its rows and the folded tail are the same bucket)
      val buckets = (top :+ "other").distinct
      val mapped = ev.select(
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        when(col("event_type").isin(top: _*), col("event_type"))
          .otherwise("other").as("bucket"))
      val wide = mapped.groupBy("day").pivot("bucket", buckets).count()
      // unpivot back to long form (p9's device) so the compare is
      // SF-general; pivot NULLs (day × absent bucket) drop like the
      // oracle's missing GROUP BY combinations. The pivot columns are
      // rebound POSITIONALLY (toDF) before unpivoting — event types are
      // data, and a name holding a quote/backtick must never reach a
      // parsed SQL fragment
      val safe = wide.toDF("day" +: buckets.indices.map(i => s"b$i"): _*)
      safe.select(col("day"), explode(array(buckets.indices.map(i =>
          struct(lit(buckets(i)).as("bucket"), col(s"b$i").as("n"))): _*)).as("x"))
        .filter(col("x.n").isNotNull)
        .select(col("day"), col("x.bucket").as("bucket"),
          col("x.n").cast("long").as("n"))
        .orderBy("day", "bucket")
    },

    // ── RP1: range-split planner — the balanced repartitionByRange
    // boundaries, computed IN-PLAN: Spark's range partitioner samples to
    // the DRIVER and is boundary-nondeterministic run to run; rp1 derives
    // 16 splits on l_orderkey from a DETERMINISTIC 2% md5 sample (sp1's
    // device, pinned in the oracle), ranks the sampled keys with
    // GlobalIds (range-repartition + O(P) prefix sum — no single-
    // partition sort), picks boundary j at sample rank (j·n) div 16
    // against a 1-row broadcast, and then measures ACHIEVED balance with
    // one fact scan against the 16-row broadcast interval table — the
    // report that tells you whether these splits would spill before you
    // launch the real job. share in ppm; an empty split keeps its row
    // with n_rows = 0 (intervals LEFT JOIN counts).
    Q("rp1_range_splits", {
      val bucket = (c: String) =>
        s"(strpos('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), 1, 1)) - 1) * 4096" +
          s" + (strpos('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), 2, 1)) - 1) * 256" +
          s" + (strpos('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), 3, 1)) - 1) * 16" +
          s" + (strpos('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), 4, 1)) - 1)"
      s"""WITH samp AS (SELECT DISTINCT l_orderkey AS k FROM lineitem
         |              WHERE ${bucket("l_orderkey")} < 1310),
         |rk AS (SELECT k, row_number() OVER (ORDER BY k) - 1 AS r FROM samp),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM samp),
         |b AS (SELECT j.range AS j, rk.k
         |      FROM range(1, 16) j JOIN n ON true
         |      JOIN rk ON rk.r = (j.range * n.n) // 16),
         |iv AS (SELECT j, k AS lo, lead(k) OVER (ORDER BY j) AS hi FROM b),
         |iv0 AS (SELECT CAST(0 AS BIGINT) AS split_no, CAST(NULL AS BIGINT) AS lo,
         |               (SELECT min(k) FROM b WHERE j = 1) AS hi
         |        UNION ALL SELECT j, lo, hi FROM iv),
         |cts AS (SELECT i.split_no, CAST(count(l.l_orderkey) AS BIGINT) AS n_rows
         |        FROM iv0 i LEFT JOIN lineitem l
         |          ON (i.lo IS NULL OR l.l_orderkey >= i.lo)
         |         AND (i.hi IS NULL OR l.l_orderkey < i.hi)
         |        GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM lineitem)
         |SELECT i.split_no, i.lo, i.hi, c.n_rows,
         |       CASE WHEN tot.nt = 0 THEN NULL
         |            ELSE CAST((CAST(c.n_rows AS HUGEINT) * 1000000) // tot.nt AS BIGINT) END AS share_ppm
         |FROM iv0 i JOIN cts c USING (split_no) CROSS JOIN tot
         |ORDER BY split_no""".stripMargin
    }) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val samp = Sampling.uniform(li.select(col("l_orderkey").as("k")),
        col("k"), 0.02).distinct()
      val ranked = GlobalIds.withGlobalId(samp, "r", col("k"))
      val n = samp.agg(count(lit(1)).cast("long").as("n"))
      val js = s.range(1, 16).select(col("id").as("j"))
      val b = ranked.crossJoin(broadcast(n))
        .join(broadcast(js), col("r") === expr("(j * n) div 16"))
        .select(col("j"), col("k"))
      val wj = Window.orderBy("j")
      val iv = b.withColumn("hi", lead("k", 1).over(wj))
        .select(col("j").as("split_no"), col("k").as("lo"), col("hi"))
      val first = b.agg(min(when(col("j") === 1, col("k"))).as("hi"))
        .select(lit(0L).as("split_no"), lit(null).cast("long").as("lo"), col("hi"))
      val iv0 = first.unionByName(iv)
      // INNER fact⋈broadcast(intervals), empties restored by a 16×16 left
      // join AFTER the aggregate: a LEFT join FROM the 16-row side would
      // force Spark to broadcast the FACT (the build side of a left-outer
      // BNLJ is the right side) — a 4 GiB broadcast at sf10, caught by the
      // scale bench
      val hits = li.select(col("l_orderkey"))
        .join(broadcast(iv0),
          (col("lo").isNull || col("l_orderkey") >= col("lo"))
            && (col("hi").isNull || col("l_orderkey") < col("hi")))
        .groupBy("split_no")
        .agg(count(lit(1)).cast("long").as("n_rows"))
      val cts = iv0.join(hits, Seq("split_no"), "left")
        .select(col("split_no"), col("lo"), col("hi"),
          coalesce(col("n_rows"), lit(0L)).as("n_rows"))
      val tot = li.agg(count(lit(1)).cast("long").as("nt"))
      cts.crossJoin(broadcast(tot))
        .select(col("split_no"), col("lo"), col("hi"), col("n_rows"),
          when(col("nt") === 0L, lit(null).cast("long"))
            .otherwise(expr("cast((cast(n_rows as decimal(38,0)) * 1000000) div nt as bigint)"))
            .as("share_ppm"))
        .orderBy("split_no")
    },

    // ── CI1: grouped-jackknife error bars for the mean document length —
    // the standard error a corpus metric needs before anyone reads a
    // day-over-day delta as real: 32 deterministic md5 buckets (sp1's
    // device, pinned in the oracle), delete-one-bucket means in exact
    // integer micro (per-bucket truncating division — mi1's per-cell
    // class), SE = sqrt((B−1)/B · Σ(mean_b − M)²) with the ONE terminal
    // sqrt as wt1's single-double-expression device (round(·,4)). Fewer
    // than 2 non-empty buckets → NULL symmetrically.
    // 100 TB: one keyed agg to ≤32 rows; everything after is arithmetic
    // on that bounded table.
    Q("ci1_jackknife", {
      val bucket = (c: String) =>
        s"((strpos('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), 1, 1)) - 1) * 4096" +
          s" + (strpos('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), 2, 1)) - 1) * 256" +
          s" + (strpos('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), 3, 1)) - 1) * 16" +
          s" + (strpos('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), 4, 1)) - 1)) // 2048"
      s"""WITH b AS (SELECT ${bucket("doc_id")} AS bkt,
         |             CAST(sum(n_chars) AS BIGINT) AS s_b,
         |             CAST(count(*) AS BIGINT) AS n_b
         |           FROM documents GROUP BY 1),
         |t AS (SELECT CAST(sum(s_b) AS BIGINT) AS s, CAST(sum(n_b) AS BIGINT) AS n,
         |             CAST(count(*) AS BIGINT) AS nb FROM b),
         |loo AS (SELECT b.bkt,
         |          CAST((CAST(t.s - b.s_b AS HUGEINT) * 1000000) // (t.n - b.n_b) AS BIGINT) AS m_b
         |        FROM b CROSS JOIN t WHERE t.n - b.n_b > 0),
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS be,
         |              CAST(sum(m_b) // count(*) AS BIGINT) AS m FROM loo),
         |v AS (SELECT mm.be, mm.m,
         |        sum(CAST(loo.m_b - mm.m AS HUGEINT) * (loo.m_b - mm.m)) AS ss
         |      FROM loo CROSS JOIN mm GROUP BY 1, 2)
         |SELECT t.n AS n_docs, v.be AS n_buckets,
         |       CAST((CAST(t.s AS HUGEINT) * 1000000) // t.n AS BIGINT) AS mean_micro,
         |       CASE WHEN v.be < 2 THEN NULL
         |            ELSE round(sqrt((v.be - 1.0) / v.be * CAST(v.ss AS DOUBLE)), 4) END AS se_micro
         |FROM v CROSS JOIN t""".stripMargin
    }) { (s, d) =>
      val b = Tables.documents(s, d)
        .groupBy((Sampling.bucket(col("doc_id")) / 2048).cast("long").as("bkt"))
        .agg(sum("n_chars").cast("long").as("s_b"),
          count(lit(1)).cast("long").as("n_b"))
      val t = b.agg(sum("s_b").cast("long").as("s"),
        sum("n_b").cast("long").as("n"), count(lit(1)).cast("long").as("nb"))
      val loo = b.crossJoin(broadcast(t))
        .filter(col("n") - col("n_b") > 0L)
        .select(col("bkt"),
          expr("cast((cast(s - s_b as decimal(38,0)) * 1000000) div (n - n_b) as bigint)")
            .as("m_b"))
      val mm = loo.agg(count(lit(1)).cast("long").as("be"),
        expr("cast(sum(m_b) div count(*) as bigint)").as("m"))
      val v = loo.crossJoin(broadcast(mm))
        .groupBy("be", "m")
        .agg(sum(expr("cast(m_b - m as decimal(38,0)) * (m_b - m)")).as("ss"))
      v.crossJoin(broadcast(t))
        .select(col("n").as("n_docs"), col("be").as("n_buckets"),
          expr("cast((cast(s as decimal(38,0)) * 1000000) div n as bigint)")
            .as("mean_micro"),
          when(col("be") < 2L, lit(null).cast("double"))
            .otherwise(round(sqrt((col("be") - lit(1.0)) / col("be")
              * col("ss").cast("double")), 4)).as("se_micro"))
    }
  )
}
