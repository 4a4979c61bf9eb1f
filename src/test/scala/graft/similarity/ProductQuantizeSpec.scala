package graft.similarity

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** PQ encoding sanity on the pack query's plan: self-encoding, code range,
  * and partition invariance.
  */
class ProductQuantizeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def encode(dir: String) =
    graft.queries.SimilarityQueries.all
      .find(_.name == "emb2_product_quantize").get.run(spark, dir)

  test("a codebook vector encodes to its own id in every subspace, dist 0") {
    val own = encode(sf).filter(col("vec_id") < 4).collect()
    assert(own.length == 4 * 8)
    own.foreach { r =>
      assert(r.getAs[Long]("vec_id") == r.getAs[Long]("code"),
        s"seed ${r.getAs[Long]("vec_id")} sub ${r.getAs[Int]("sub")} " +
          s"coded ${r.getAs[Long]("code")}")
      assert(r.getAs[Double]("dist") == 0.0)
    }
  }

  test("every vector gets exactly 8 codes, all in the codebook range") {
    val df = encode(sf)
    val n = Tables.embeddings(spark, sf).count()
    assert(df.count() == n * 8)
    assert(df.filter(col("code") < 0 || col("code") > 3).count() == 0)
    assert(df.groupBy("vec_id").count().filter(col("count") =!= 8).count() == 0)
  }
}
