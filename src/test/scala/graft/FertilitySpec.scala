package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._

/** tok1's fertility rollup: hand-computed mass-weighted token-count
  * distribution over a fixture vocabulary.
  */
class FertilitySpec extends SparkSpec {

  test("mass-weighted fertility buckets on a hand fixture") {
    import spark.implicits._
    // k=2 merges on this vocab are "ab" then "aa" (BpeEncodeSpec):
    //   aaab -> [aa ab] (2 tokens, mass 3), abab -> [ab ab] (2, mass 2),
    //   z -> [z] (1 token, mass 4). total mass 9.
    val vocab = Seq(("aaab", 3L), ("abab", 2L), ("z", 4L)).toDF("word", "cnt")
    val rows = Bpe.encodeVocab(vocab, k = 2)
      .groupBy("word", "cnt").agg(count(lit(1)).as("n_tokens"))
      .groupBy("n_tokens")
      .agg(count(lit(1)).as("n_words"), sum("cnt").as("word_mass"))
      .select(col("n_tokens"), col("n_words"), col("word_mass"),
        expr("word_mass * 1000000 div sum(word_mass) over ()").as("mass_ppm"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows(1L) == ((1L, 4L, 444444L)), s"1-token bucket: ${rows.get(1L)}")
    assert(rows(2L) == ((2L, 5L, 555555L)), s"2-token bucket: ${rows.get(2L)}")
  }

  test("tok1 on testdata is deterministic across runs") {
    val sf = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("tok1_fertility")(spark, sf)
    val b = SparkEntry.queries("tok1_fertility")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
