package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The subtle half of BPE merging: greedy-leftmost within same-symbol runs
  * (only even offsets in a run merge). The islands formula must degenerate
  * to merge-all for non-overlapping pairs.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def syms(word: String): Seq[(Int, String)] = {
    val vocab = Seq((word, 1L)).toDF("word", "cnt")
    val best = Bpe.bestPair(Bpe.initialSymbols(vocab))
    Bpe.mergeBest(Bpe.initialSymbols(vocab), best)
      .orderBy("pos").select("pos", "sym").as[(Int, String)].collect().toSeq
  }

  test("even-length run merges fully: aaaa -> [aa, aa]") {
    assert(syms("aaaa") == Seq((1, "aa"), (2, "aa")))
  }

  test("odd-length run leaves the tail: aaa -> [aa, a]") {
    assert(syms("aaa") == Seq((1, "aa"), (2, "a")))
  }

  test("non-overlapping pair merges all occurrences: abab -> [ab, ab]") {
    assert(syms("abab") == Seq((1, "ab"), (2, "ab")))
  }

  test("merge ranking is frequency-weighted and total-ordered") {
    // "ab" x3, "cd" x3: tie on pair count -> lexicographic (a b) first;
    // round 2 must pick (c d)
    val vocab = Seq(("ab", 3L), ("cd", 3L)).toDF("word", "cnt")
    val got = Bpe.trainMerges(vocab, k = 2).orderBy("merge_rank")
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "a b", 3L), (2, "c d", 3L)))
  }
}
