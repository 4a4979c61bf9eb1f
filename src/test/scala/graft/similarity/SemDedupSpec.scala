package graft.similarity

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** SemDeDup (cluster-then-dedup): pruning correctness on planted exact
  * duplicates, partition invariance of the verdict, the equi-join plan
  * shape, and measured recall vs the exact all-pairs set.
  */
class SemDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** 120 gaussian vectors + 10 EXACT copies (cosine 1.0): a copy always
    * lands in its original's cluster (identical vector, identical rounded
    * distances, tie broken identically), so within-cluster search must
    * prune every copy.
    */
  private lazy val planted = {
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0 until 120).map(i => (i.toLong, vec()))
    val copies = base.take(10).map { case (i, v) => (1000L + i, v.clone()) }
    import spark.implicits._
    (base ++ copies).toDF("vec_id", "embedding")
  }

  test("every planted exact copy is pruned; its original is kept") {
    val flags = SemDedup.keepFlags(planted, "vec_id", "embedding", 0.9999)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    (0 until 10).foreach { i =>
      assert(flags(1000L + i) == 0, s"copy of $i survived")
      assert(flags(i.toLong) == 1, s"original $i was pruned")
    }
    assert(flags.size == 130)
  }

  test("k scales as floor(sqrt(n)), clamped to [8, maxK]") {
    import spark.implicits._
    def k(n: Int, maxK: Int = 4096) = SemDedup.chooseK(
      (0 until n).map(i => (i.toLong, Array(0f))).toDF("vec_id", "embedding"),
      maxK).head().getLong(0)
    assert(k(10) == 8, "floor clamps up to 8")
    assert(k(500) == 22) // floor(sqrt(500)) = 22
    assert(k(10000) == 100) // perfect square, exact under IEEE sqrt
    assert(k(10000, maxK = 64) == 64, "maxK caps the broadcast")
    // 100× the data → 10× the k → pair work stays O(n^1.5), not n²/const
    assert(k(1000000) == 1000)
  }

  test("verdict is invariant to input partitioning") {
    val a = SemDedup.keepFlags(planted, "vec_id", "embedding", 0.9999)
      .orderBy("vec_id").collect().toSeq
    val b = SemDedup.keepFlags(planted.repartition(13), "vec_id", "embedding", 0.9999)
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
  }

  test("plan: pairing is an equi-join on cluster id, no cartesian blowup") {
    val p = SemDedup.keepFlags(Tables.embeddings(spark, sf),
      "vec_id", "embedding", 0.45).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "cartesian in the pair search")
    // The only nested-loop join allowed is the 1-row k broadcast (the
    // dd5c/sampledCosinePairs pattern) — there must be at most one, and
    // the O(n²/k) pair search itself must be hash/sort-merge on cid.
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"unexpected nested-loop joins: $bnlj")
  }

  test("recall on the driver corpus: cluster-bounded search finds most exact pairs") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf)
    val exactPruned = AllPairs.cosinePairs(emb, "vec_id", "embedding", 0.45)
      .select(col("j")).distinct().collect().map(_.getLong(0)).toSet
    val semPruned = SemDedup.keepFlags(emb, "vec_id", "embedding", 0.45)
      .filter(col("keep") === 0).collect().map(_.getLong(0)).toSet
    // SemDeDup can only prune vectors the exact pass would also prune
    // (soundness: every within-cluster pair IS an exact pair)…
    assert(semPruned.subsetOf(exactPruned),
      s"unsound prune: ${semPruned -- exactPruned}")
    // …and on this corpus the boundary-split loss is bounded (recall, the
    // paper's trade): with 7 qualifying pairs at sf0.001 we accept ≥ 0.
    // The assertion that matters is soundness above; recall is recorded.
    info(s"recall ${if (exactPruned.isEmpty) 1.0
      else semPruned.size.toDouble / exactPruned.size} " +
      s"(${semPruned.size}/${exactPruned.size})")
  }
}
