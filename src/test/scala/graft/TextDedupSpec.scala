package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** The shingle document-frequency cap: the standard guard against a hot
  * shingle producing a quadratic join group in the inverted-index self-join.
  */
class TextDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("a high cap leaves corpus pair results unchanged") {
    val sh = TextQueries.shinglesDf(spark, sf)
    val exact = TextQueries.pairJaccard(sh)
      .filter(col("jaccard") >= 0.8).select("a", "b", "jaccard")
      .orderBy("a", "b").collect().toSeq
    val capped = TextQueries.pairJaccard(sh, maxShingleDf = Some(100000))
      .filter(col("jaccard") >= 0.8).select("a", "b", "jaccard")
      .orderBy("a", "b").collect().toSeq
    assert(capped == exact)
    assert(exact.nonEmpty)
  }

  test("the cap visibly bounds inverted-index join-group size") {
    import spark.implicits._
    // one hot shingle shared by all 6 docs, plus per-pair rare shingles
    val sh = Seq(
      (1L, "hot"), (2L, "hot"), (3L, "hot"), (4L, "hot"), (5L, "hot"), (6L, "hot"),
      (1L, "r12"), (2L, "r12"),
      (3L, "r34"), (4L, "r34")
    ).toDF("doc_id", "sh")
    val capped = TextQueries.capShingleDf(sh, maxDf = 2)
    // the hot shingle is gone; every surviving join group is ≤ the cap
    val maxGroup = capped.groupBy("sh").count().agg(max("count")).first().getLong(0)
    assert(maxGroup <= 2)
    assert(capped.filter(col("sh") === "hot").count() == 0)
    // pairs now come only from rare shingles: (1,2) and (3,4)
    val pairs = TextQueries.pairJaccard(capped)
      .select("a", "b").orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L), (3L, 4L)))
  }

  // The shingle/position oracles (t5/t12/dd-family CorpusQueries) enumerate
  // positions via a `range(1024)` constant cross join in DuckDB while the
  // Spark side enumerates ALL positions; a doc longer than ~1026 tokens
  // would silently diverge on the oracle side only. This pins the data
  // assumption the comment makes: every corpus doc fits the bound with
  // margin. ScaleData's replica transforms are per-letter bijections +
  // token rotations, so token counts are invariant and this bound proved
  // on the base dirs holds at every synthesized SF too.
  test("corpus max tokens/doc stays far below the 1024 oracle range bound") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val maxToks = graft.Tables.documents(spark, sf)
        .select(size(split(trim(col("text")), "[ \\t\\n\\f\\r]+")).as("n"))
        .agg(max("n")).first().getInt(0)
      assert(maxToks <= 900, s"$sf max tokens/doc $maxToks breaches the range(1024) oracle bound margin")
    }
  }
}
