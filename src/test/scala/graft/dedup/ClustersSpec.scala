package graft.dedup

import graft.SparkSpec

/** Alternating-star connected components: logarithmic convergence on the
  * worst case for plain propagation, and agreement with the reference
  * min-label implementation on arbitrary graphs.
  */
class ClustersSpec extends SparkSpec {
  import spark.implicits._

  test("100-node chain converges in ~log2 rounds with correct keepers") {
    val chain = (0L until 99L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Clusters.assignKeepersWithRounds(chain, maxRounds = 50)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 100)
    assert(got.values.forall(_ == 0L), s"non-min keeper in $got")
    info(s"chain-100 converged in $rounds star rounds")
    // min-label propagation needs ~99 rounds here; stars are logarithmic
    assert(rounds <= 14, s"$rounds rounds exceeds 2*ceil(log2(100))")
  }

  test("matches min-label propagation on a random graph") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }.toDF("a", "b")
    val star = Clusters.assignKeepers(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val prop = Clusters.minLabelPropagation(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(star == prop)
  }

  test("separate components keep separate keepers") {
    val edges = Seq((5L, 3L), (3L, 9L), (20L, 30L)).toDF("a", "b")
    val got = Clusters.assignKeepers(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 30L -> 20L))
  }
}
