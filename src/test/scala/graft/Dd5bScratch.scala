package graft

import org.apache.spark.sql.functions._

/** Scratch: dd5b LSH-candidate recall vs exact all-pairs per SF, to size an
  * oracle-gated recall bound. sbt "Test/runMain graft.Dd5bScratch"
  */
object Dd5bScratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("dd5b-scratch", 16)
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val d = s"/root/testdata/sf$sf"
      val emb = Tables.embeddings(spark, d)
      val lsh = graft.similarity.AnnLsh.neardupPairs(
        emb, "vec_id", "embedding", threshold = 0.45, dim = 64, nTables = 8)
        .select("i", "j")
      val exact = graft.similarity.AllPairs.cosinePairs(
        emb, "vec_id", "embedding", threshold = 0.45)
        .select("i", "j")
      val nExact = exact.count()
      val nLsh = lsh.count()
      val inter = lsh.join(exact, Seq("i", "j"), "left_semi").count()
      println(f"== sf$sf: lsh=$nLsh exact=$nExact inter=$inter recall=${inter.toDouble / nExact}%.3f")
    }
    spark.stop()
  }
}
