package graft.similarity

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Exactness of the blocked all-pairs plan, and recall of the multi-table
  * LSH near-dup path in its design regime (planted high-cosine duplicates).
  */
class AllPairsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Planted corpus: 120 random unit-ish gaussian vectors plus 15 perturbed
    * near-copies (cosine ≈ 0.99); background pairwise cosine ~N(0, 1/8).
    */
  private lazy val planted = {
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0 until 120).map(i => (i.toLong, vec()))
    val dups = base.take(15).map { case (i, v) =>
      (1000L + i, v.map(x => x + 0.12f * rnd.nextGaussian().toFloat))
    }
    import spark.implicits._
    (base ++ dups).toDF("vec_id", "embedding")
  }

  test("blocked equi-join all-pairs matches the brute-force cartesian") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf)
    val blocked = AllPairs.cosinePairs(emb, "vec_id", "embedding", 0.45)
      .orderBy("i", "j").collect().toSeq
    val a = emb.select(col("vec_id").as("i"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("j"), col("embedding").as("eb"))
    val brute = a.join(b, col("i") < col("j"))
      .withColumn("cos_sim", round(expr("cosine_sim(ea, eb)"), 4))
      .filter(col("cos_sim") >= 0.45)
      .select("i", "j", "cos_sim").orderBy("i", "j").collect().toSeq
    assert(blocked == brute)
    assert(blocked.nonEmpty) // 7 qualifying pairs at sf0.001
  }

  test("every unordered pair lands in exactly one block tile") {
    graft.functions.GraftFunctions.register(spark)
    // threshold -1 keeps ALL pairs: count must be exactly n·(n-1)/2
    val n = planted.count()
    val pairs = AllPairs.cosinePairs(planted, "vec_id", "embedding", -1.0, nBlocks = 7)
    assert(pairs.count() == n * (n - 1) / 2)
    assert(pairs.groupBy("i", "j").count().filter(col("count") > 1).count() == 0)
  }

  test("sampled referee is exactly the full result restricted to the md5 sample") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf)
    // target below the corpus size forces a real sample (sf0.001 has 50
    // vectors; target 20 -> threshold 26214 keeps ~2/5 of buckets)
    val sampled = AllPairs.sampledCosinePairs(emb, "vec_id", "embedding",
      threshold = -1.0, targetSample = 20).orderBy("i", "j").collect().toSeq
    val keep = graft.operators.Sampling
      .bucket(col("vec_id")) < lit(65536L * 20 / emb.count()).cast("int")
    val full = AllPairs.cosinePairs(emb.filter(keep), "vec_id", "embedding", -1.0)
      .orderBy("i", "j").collect().toSeq
    assert(sampled == full)
    assert(sampled.nonEmpty)
    val ids = sampled.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct
    assert(ids.size < 50, "sample did not restrict the vector set")
  }

  test("sampled referee keeps the whole corpus when target >= corpus size") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf)
    val sampled = AllPairs.sampledCosinePairs(emb, "vec_id", "embedding",
      threshold = 0.35, targetSample = 2000).orderBy("i", "j").collect().toSeq
    val full = AllPairs.cosinePairs(emb, "vec_id", "embedding", 0.35)
      .orderBy("i", "j").collect().toSeq
    assert(sampled == full)
  }

  test("LSH near-dup recall is 1.0 on planted ≥0.9-cosine duplicates") {
    val exact = AllPairs.cosinePairs(planted, "vec_id", "embedding", 0.9)
      .orderBy("i", "j").collect().toSeq
    assert(exact.size == 15, s"expected the 15 planted pairs, got ${exact.size}")
    val lsh = AnnLsh.neardupPairs(planted, "vec_id", "embedding",
      threshold = 0.9, dim = 64)
      .orderBy("i", "j").collect().toSeq
    assert(lsh == exact) // recall 1.0 AND no false positives past the verify
  }
}
