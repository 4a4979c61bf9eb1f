package graft

import org.apache.spark.sql.functions._

/** Scratch: per-query ANN∩exact hit counts per SF, to size sim3's
  * oracle-gated recall bound. sbt "Test/runMain graft.Sim3Scratch"
  */
object Sim3Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("sim3-scratch", 16)
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val d = s"/root/testdata/sf$sf"
      val emb = Tables.embeddings(spark, d)
      val ann = graft.similarity.AnnLsh.topk(
        corpus = emb, queries = emb.filter(col("vec_id") < 10),
        idCol = "vec_id", vecCol = "embedding", k = 10, dim = 64)
      val exact = graft.queries.SimilarityQueries.all
        .find(_.name == "sim1_cosine_topk").get.run(spark, d)
      val hits = ann.join(exact.select(col("qid"), col("nid")),
          Seq("qid", "nid"), "left_semi")
        .groupBy("qid").agg(count(lit(1)).as("hits"))
        .orderBy("qid").collect()
      println(s"== sf$sf: " + hits.map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" "))
    }
    spark.stop()
  }
}
