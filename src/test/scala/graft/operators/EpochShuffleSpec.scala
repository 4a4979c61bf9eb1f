package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Epoch shuffle: reproducibility, seed independence, and permutation
  * validity (positions are exactly 0..N-1).
  */
class EpochShuffleSpec extends SparkSpec {

  private lazy val keys = {
    import spark.implicits._
    (0L until 500L).toDF("k")
  }

  private def perm(seed: String, parts: Int = 4): Seq[(Long, Long)] =
    EpochShuffle.withPosition(keys.repartition(parts), col("k"), seed)
      .select(col("k"), col("pos")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq.sortBy(_._1)

  test("positions are a permutation of 0..N-1") {
    val p = perm("ep0").map(_._2).sorted
    assert(p == (0L until 500L))
  }

  test("same seed replays identically at any partitioning") {
    assert(perm("ep0", 4) == perm("ep0", 17))
  }

  test("different seeds give different permutations; both valid") {
    val a = perm("ep0")
    val b = perm("ep1")
    assert(a != b)
    assert(b.map(_._2).sorted == (0L until 500L))
    // and the shuffle actually moves things: most keys change position
    val moved = a.zip(b).count { case ((_, pa), (_, pb)) => pa != pb }
    assert(moved > 450, s"only $moved keys moved between epochs")
  }
}
