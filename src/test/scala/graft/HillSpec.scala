package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** hill1's estimator on a planted Pareto tail: x_i = x_min * r^i gives
  * ln-spacings i*ln(r), whose Hill estimate is analytically
  * (k-1) / (ln(r) * Σi / 1) ... computed here directly from the micro-unit
  * arithmetic the query uses, so the test pins the exact contract.
  */
class HillSpec extends SparkSpec {

  private def hill(df: DataFrame, k: Int): (Long, Long, Double) = {
    val top = df.orderBy(col("cents").desc, col("usr")).limit(k)
      .withColumn("lnm",
        expr("cast(round(ln(cast(cents as double)) * 1000000) as bigint)"))
    val m = top.agg(min("lnm").as("lnmin"), min("cents").as("xmin_cents"),
      count(lit(1)).as("k"))
    val r = top.crossJoin(broadcast(m))
      .groupBy("k", "xmin_cents", "lnmin")
      .agg(sum(col("lnm") - col("lnmin")).as("sd"))
      .select(col("k"), col("xmin_cents"),
        round((col("k").cast("double") - 1) * 1000000
          / col("sd").cast("double"), 6).as("alpha")).head()
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  test("a geometric (pure Pareto) tail recovers its index") {
    import spark.implicits._
    // x_i = 1000 * 2^i, i = 0..9: exact Pareto with alpha = 1/ln(2) per
    // unit spacing; Hill over all 10 points: sum of (i*ln2 micro) for
    // i=0..9 = 45*693147 = 31191615; alpha = 9e6/31191615 = 0.288539...
    val df = (0 until 10).map(i => (i.toLong, 1000L << i)).toDF("usr", "cents")
    val (k, xmin, alpha) = hill(df, 10)
    assert(k == 10L && xmin == 1000L, s"k=$k xmin=$xmin")
    assert(math.abs(alpha - 9e6 / 31191615.0) < 1e-4, s"alpha=$alpha")
  }

  test("a heavier tail (larger ratio) yields a smaller alpha") {
    import spark.implicits._
    val light = (0 until 20).map(i => (i.toLong, (1000 * math.pow(1.1, i)).toLong))
    val heavy = (0 until 20).map(i => (i.toLong, (1000 * math.pow(3.0, i)).toLong))
    val aLight = hill(light.toDF("usr", "cents"), 20)._3
    val aHeavy = hill(heavy.toDF("usr", "cents"), 20)._3
    assert(aHeavy < aLight, s"heavy=$aHeavy should be < light=$aLight")
  }

  test("hill1 on testdata is deterministic across runs") {
    val sf = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("hill1_tail_index")(spark, sf)
    val b = SparkEntry.queries("hill1_tail_index")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
