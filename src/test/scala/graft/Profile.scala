package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler: sbt "Test/runMain graft.Profile" */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $label"); r
    }

    val docs = Tables.documents(spark, sfDir)
    time("docs count")(docs.count())
    val toks = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
    val sh = toks.filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks)-3), " +
          "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")).as("sh"))
      .distinct()
    time("shingles distinct")(sh.count())
    val sh2 = sh.cache()
    time("shingles cache")(sh2.count())
    val sig = sh2.groupBy("doc_id").agg(
      min(md5(concat(lit("1|"), col("sh")))).as("h1"),
      min(md5(concat(lit("2|"), col("sh")))).as("h2"),
      min(md5(concat(lit("3|"), col("sh")))).as("h3"),
      min(md5(concat(lit("4|"), col("sh")))).as("h4"),
      min(md5(concat(lit("5|"), col("sh")))).as("h5"),
      min(md5(concat(lit("6|"), col("sh")))).as("h6"),
      min(md5(concat(lit("7|"), col("sh")))).as("h7"),
      min(md5(concat(lit("8|"), col("sh")))).as("h8"))
    time("signatures")(sig.count())
    val bands = sig.select(col("doc_id"), explode(array(
      struct(lit(1).as("bi"), md5(concat(col("h1"), col("h2"))).as("bv")),
      struct(lit(2).as("bi"), md5(concat(col("h3"), col("h4"))).as("bv")),
      struct(lit(3).as("bi"), md5(concat(col("h5"), col("h6"))).as("bv")),
      struct(lit(4).as("bi"), md5(concat(col("h7"), col("h8"))).as("bv")))).as("b"))
      .select(col("doc_id"), col("b.bi").as("bi"), col("b.bv").as("bv"))
    val cand = bands.as("p").join(bands.as("q"),
        col("p.bi") === col("q.bi") && col("p.bv") === col("q.bv") &&
          col("p.doc_id") < col("q.doc_id"))
      .select(col("p.doc_id").as("a"), col("q.doc_id").as("b")).distinct().cache()
    time("candidates")(println("cand=" + cand.count()))
    val full = graft.queries.TextQueries.all.find(_.name == "dd3_minhash_lsh").get
    time("dd3 full run")(full.run(spark, sfDir).count())
    time("dd3 full run again")(full.run(spark, sfDir).count())
    spark.stop()
  }
}
