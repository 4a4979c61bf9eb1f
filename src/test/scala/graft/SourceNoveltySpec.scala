package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** nv1's redundancy audit: a source whose shingles all exist elsewhere
  * scores 0 ppm; unique content counts once per source even when repeated
  * across its own docs.
  */
class SourceNoveltySpec extends SparkSpec {

  test("shared shingles score zero novelty; per-source distinctness holds") {
    import spark.implicits._
    // srcA doc: "w1 w2 w3 w4" -> shingles {w1 w2 w3, w2 w3 w4}
    // srcB doc: "w1 w2 w3"    -> shingle  {w1 w2 w3} (all shared with A)
    // srcB doc2 repeats doc1's text — adds docs but no new shingles.
    val docs = Seq(
      (1L, "w1 w2 w3 w4", "srcA"),
      (2L, "w1 w2 w3", "srcB"),
      (3L, "w1 w2 w3", "srcB")
    ).toDF("doc_id", "text", "source")
    val toks = docs.select(col("doc_id"),
      split(trim(col("text")), "\\s+").as("toks"))
    val out = TextQueries.sourceNovelty(docs, TextQueries.shingleTable(toks))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("srcA") == ((1L, 2L, 1L, 500000L)), s"srcA: ${out("srcA")}")
    assert(out("srcB") == ((2L, 1L, 0L, 0L)), s"srcB: ${out("srcB")}")
  }

  test("nv1 on testdata is deterministic across runs") {
    val sf = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("nv1_source_novelty")(spark, sf)
    val b = SparkEntry.queries("nv1_source_novelty")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
