package graft.similarity

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class AnnLshSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("ANN recall vs exact brute-force top-10 and determinism") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = graft.queries.SimilarityQueries.all
      .find(_.name == "sim1_cosine_topk").get.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ann = AnnLsh.topk(emb, queries, "vec_id", "embedding", k = 10, dim = 64, nPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    val recall = exact.count(ann.toSet) / exact.length.toDouble
    info(f"ANN recall@10 = $recall%.2f (multi-probe, 4 planes)")
    assert(recall >= 0.4, f"recall $recall%.2f too low")

    val again = AnnLsh.topk(emb, queries, "vec_id", "embedding", k = 10, dim = 64, nPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ann.toSeq == again.toSeq) // seeded planes → deterministic
  }

  test("buckets partition the corpus (each vector hashed to exactly one)") {
    val emb = Tables.embeddings(spark, sf)
    val pls = AnnLsh.planes(4, 64)
    val bucketed = emb.select(AnnLsh.bucketCol("embedding", pls).as("bucket"))
    assert(bucketed.count() == emb.count())
    val nBuckets = bucketed.distinct().count()
    assert(nBuckets > 1 && nBuckets <= 16)
  }
}
