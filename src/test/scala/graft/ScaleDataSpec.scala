package graft

import org.scalatest.funsuite.AnyFunSuite

/** The replica-distinctness property the scale probe's density claims rest
  * on: every replica's letter bijection is a permutation, replica 0 is the
  * identity, all maps over the certified range (`ScaleData.maxReps`) are
  * pairwise distinct AND nearly disagree everywhere (so no two replicas'
  * documents are near-duplicates of each other — BENCH_SCALE.md), and the
  * embedding transforms are pairwise distinct over the same range.
  */
class ScaleDataSpec extends AnyFunSuite {
  private val alphabet = ScaleData.lower + ScaleData.upper
  private val n = ScaleData.maxReps

  test("replica 0 is the identity map") {
    assert(ScaleData.perm(0) == alphabet)
  }

  test("the first 104 maps are the frozen rotation family (sf1/sf10 reproducibility)") {
    assert(ScaleData.perm(1) == "bcdefghijklmnopqrstuvwxyzaBCDEFGHIJKLMNOPQRSTUVWXYZA")
    assert(ScaleData.perm(26) == "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz")
    assert(ScaleData.perm(52) == "zyxwvutsrqponmlkjihgfedcbaZYXWVUTSRQPONMLKJIHGFEDCBA")
  }

  test(s"every map up to maxReps=$n is a permutation of the alphabet") {
    (0 until n).foreach { r =>
      assert(ScaleData.perm(r).sorted == alphabet.sorted, s"r=$r not a bijection")
    }
  }

  test(s"all $n maps are pairwise distinct") {
    val maps = (0 until n).map(ScaleData.perm)
    assert(maps.distinct.size == n)
  }

  test("pairwise letter agreement stays low (cross-replica shingle collisions negligible)") {
    // A shingle maps identically under two bijections only if every letter
    // in it is a shared fixed point: (agree/52)^len. Agreement comes in
    // case pairs (upper mirrors lower), so two shuffles sharing 7 lowercase
    // fixed points score 14. Bound at a third of the alphabet: a 15-char
    // shingle's collision odds stay < (17/52)^15 ≈ 5e-8.
    val maps = (0 until n).map(ScaleData.perm)
    for (a <- 0 until n; b <- (a + 1) until n) {
      val agree = maps(a).zip(maps(b)).count { case (x, y) => x == y }
      assert(agree <= 17, s"perm($a) and perm($b) agree on $agree letters")
    }
  }

  test("embedding transform: replica 0 is the identity, pairs distinct up to maxReps") {
    val (k0, m0) = ScaleData.embTransform(0)
    assert(k0 == 0 && m0.forall(_ == 1))
    val ts = (0 until n).map { r =>
      val (k, m) = ScaleData.embTransform(r); (k, m.toSeq)
    }
    assert(ts.distinct.size == n, "embedding transforms reused across replicas")
  }

  test("the first 128 embedding transforms are the frozen shift/flip family") {
    val (k5, m5) = ScaleData.embTransform(5)
    assert(k5 == 5 && m5.forall(_ == 1))
    val (k70, m70) = ScaleData.embTransform(70)
    assert(k70 == 6 && m70.forall(_ == -1))
  }
}
