package graft

import org.scalatest.funsuite.AnyFunSuite

/** The replica-distinctness property the scale probe's density claims rest
  * on: every replica's letter bijection is a permutation, replica 0 is the
  * identity, and all 104 maps are pairwise distinct (so no two replicas'
  * documents are near-duplicates of each other — BENCH_SCALE.md).
  */
class ScaleDataSpec extends AnyFunSuite {
  private val alphabet = ScaleData.lower + ScaleData.upper

  test("replica 0 is the identity map") {
    assert(ScaleData.perm(0) == alphabet)
  }

  test("every map is a permutation of the alphabet") {
    (0 until 104).foreach { r =>
      assert(ScaleData.perm(r).sorted == alphabet.sorted, s"r=$r not a bijection")
    }
  }

  test("all 104 maps are pairwise distinct") {
    val maps = (0 until 104).map(ScaleData.perm)
    assert(maps.distinct.size == 104)
  }
}
