package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** emb8's IVF-PQ + exact refinement: the self-match invariant, the
  * refinement-dominance property (exact re-ranking can only improve the
  * true distances of the final picks vs ADC-ranked emb4), and run-to-run
  * determinism.
  */
class Emb8RefineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** True fixed-point squared distances of (qid, nid) pick rows. */
  private def exactDists(picks: DataFrame): Map[Long, Seq[Long]] = {
    val emb = Tables.embeddings(spark, sf)
    val qv = emb.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val rv = emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
    picks.join(qv, "qid").join(rv, "nid")
      .select(col("qid"),
        round(graft.similarity.KMeans.sqDist("qe", "ne") * 10000)
          .cast("long").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).sorted.toSeq }
  }

  test("every query's top refined hit is itself at distance 0") {
    val rows = SparkEntry.queries("emb8_ivfpq_refine")(spark, sf).collect()
    val top = rows.groupBy(_.getLong(0)).map { case (q, rs) =>
      q -> rs.minBy(r => (r.getLong(2), r.getLong(1)))
    }
    assert(top.nonEmpty)
    top.foreach { case (q, r) =>
      assert(r.getLong(1) == q && r.getLong(2) == 0L,
        s"query $q top hit is (${r.getLong(1)}, ${r.getLong(2)}), not itself at 0")
    }
  }

  test("refinement dominance: emb8's picks are truly no farther than emb4's") {
    // rank-by-rank over TRUE distances: the exact re-rank of a 12-deep
    // shortlist can only improve (or tie) what the ADC-ordered top-3 gave
    val d8 = exactDists(SparkEntry.queries("emb8_ivfpq_refine")(spark, sf)
      .select("qid", "nid"))
    val d4 = exactDists(SparkEntry.queries("emb4_ivfpq_adc")(spark, sf)
      .select("qid", "nid"))
    assert(d8.keySet == d4.keySet)
    d8.foreach { case (q, e8) =>
      val e4 = d4(q)
      assert(e8.size == e4.size)
      e8.zip(e4).foreach { case (a, b) =>
        assert(a <= b, s"query $q: refined pick at $a vs ADC pick at $b")
      }
    }
  }

  test("emb8 is deterministic across runs") {
    val a = SparkEntry.queries("emb8_ivfpq_refine")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("emb8_ivfpq_refine")(spark, sf).collect().toSeq
    assert(a == b)
  }
}
