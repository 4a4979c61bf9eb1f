package graft

/** an1's F-statistic: a planted between-group separation yields a large F,
  * identical groups yield F = 0, and the statistic is partition-invariant
  * (the one float reduction folds over a group-sorted list).
  */
class AnovaSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  // inline twin of an1's body over a (p, o_totalprice) fixture frame
  private def f(df: DataFrame): Option[Double] = {
    val g = df
      .select(col("p"), expr("cast(round(o_totalprice * 100) as bigint)").as("c"))
      .groupBy("p")
      .agg(count(lit(1)).as("n_g"), sum("c").as("s_g"),
        sum(expr("cast(c as decimal(38,0)) * c")).as("q_g"))
    val one = g.agg(
      count(lit(1)).as("k"), sum("n_g").cast("long").as("n"),
      sum("s_g").cast("long").as("s"), sum("q_g").cast("double").as("qq"),
      expr("""aggregate(array_sort(collect_list(named_struct('p', p,
               't', cast(s_g as double) * cast(s_g as double) / cast(n_g as double)))),
               cast(0.0 as double), (a, x) -> a + x.t)""").as("t"))
    val r = one.select(
      when(col("qq") - col("t") > 0,
        round(((col("t") - col("s").cast("double") * col("s").cast("double")
            / col("n").cast("double")) / (col("k").cast("double") - 1))
          / ((col("qq") - col("t")) / (col("n").cast("double") - col("k").cast("double"))), 6))
        .otherwise(lit(null)).as("f")).head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("planted separation yields the hand-computed F; overlap yields a small one") {
    import spark.implicits._
    // groups {1,2,3} and {11,12,13}: SSB = 150, SSW = 4,
    //   F = (150/1) / (4/4) = 150
    val sep = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 11.0), ("b", 12.0), ("b", 13.0)).toDF("p", "o_totalprice")
    assert(f(sep).contains(150.0), s"separated: ${f(sep)}")
    // identical group contents: SSB = 0 -> F = 0
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("p", "o_totalprice")
    assert(f(same).contains(0.0), s"identical: ${f(same)}")
    // zero within-group variance -> guarded NULL, not Inf
    val zeroW = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0))
      .toDF("p", "o_totalprice")
    assert(f(zeroW).isEmpty, s"zero SSW: ${f(zeroW)}")
  }

  test("an1 on testdata is deterministic across runs") {
    val sf = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("an1_anova")(spark, sf)
    val b = SparkEntry.queries("an1_anova")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
