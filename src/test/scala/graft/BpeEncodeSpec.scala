package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._

/** bpe2's encode path: the post-training symbol table is the encoded
  * vocabulary. Hand-computed fixtures cover tie-break order (count desc
  * then pair-lexicographic), greedy-leftmost runs, and merge-of-merges.
  */
class BpeEncodeSpec extends SparkSpec {

  private def encode(vocab: Seq[(String, Long)], k: Int): Map[String, String] = {
    import spark.implicits._
    Bpe.encodeVocab(vocab.toDF("word", "cnt"), k)
      .groupBy("word")
      .agg(expr("array_join(transform(array_sort(collect_list(" +
        "struct(pos, sym))), x -> x.sym), ' ')").as("tokens"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("two rounds reproduce hand-computed merges with lexicographic tie-break") {
    // round 1: (a,b) weight 7 beats (a,a) weight 6 -> merge "ab"
    //   aaab -> [a a ab], abab -> [ab ab]
    // round 2: (a,a)=3 ties (a,ab)=3; lexicographic picks (a,a) -> merge "aa"
    //   aaab -> [aa ab]
    val out = encode(Seq("aaab" -> 3L, "abab" -> 2L), k = 2)
    assert(out("aaab") == "aa ab", s"aaab: '${out("aaab")}'")
    assert(out("abab") == "ab ab", s"abab: '${out("abab")}'")
  }

  test("greedy-leftmost runs merge at even offsets, then merge-of-merges") {
    // round 1: (a,a) -> "aaaa" = [aa aa] (starts 1 and 3, NOT 2)
    // round 2: (aa,aa) -> [aaaa]
    val out = encode(Seq("aaaa" -> 5L), k = 2)
    assert(out("aaaa") == "aaaa", s"aaaa: '${out("aaaa")}'")
  }

  test("bpe2 on testdata is deterministic across runs") {
    val sf = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("bpe2_apply_merges")(spark, sf)
    val b = SparkEntry.queries("bpe2_apply_merges")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
