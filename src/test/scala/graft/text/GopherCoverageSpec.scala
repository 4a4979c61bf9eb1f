package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Edge semantics of t13_gopher_coverage (char-weighted Gopher rules):
  * the oracle gates cross-engine equality; this pins the RULE behavior on
  * hand-built docs where the right verdict is computable by hand.
  */
class GopherCoverageSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    val docs = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val q = graft.queries.TextQueries.all.find(_.name == "t13_gopher_coverage").get
    // re-point the query at an in-memory table via a temp dir write
    val dir = graft.CacheRegistry.trackPath(
      java.nio.file.Files.createTempDirectory("t13spec").toString)
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = q.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    out
  }

  test("all-identical tokens: top-2-gram covers everything, doc flagged") {
    //  "x x x x x x" — the 2-gram "x x" occurs 5 times, len 3 → cov 15,
    //  total 11; 15·5 > 11 → flagged. dup-5-gram: "x x x x x" ×2, len 9 →
    //  cov 18 > 11·3/20 → also flagged.
    val out = run(Seq((1L, "x x x x x x")))
    val (total, top2, dup5, keep) = out(1L)
    assert(total == 11 && top2 == 15 && dup5 == 18 && keep == 0)
  }

  test("all-distinct tokens: no duplicate 5-gram, low 2-gram coverage, kept") {
    // 26 distinct letters: every 2-gram and 5-gram is unique.
    val text = ('a' to 'z').mkString(" ")
    val out = run(Seq((2L, text)))
    val (total, top2, dup5, keep) = out(2L)
    assert(total == 51 && top2 == 3 && dup5 == 0 && keep == 1)
  }

  test("docs under 5 tokens emit no row (the t12 short-doc convention)") {
    val out = run(Seq((3L, "a b c d"), (4L, "a b c d e")))
    assert(!out.contains(3L) && out.contains(4L))
  }
}
