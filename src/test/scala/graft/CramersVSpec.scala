package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** cr1's association strength: a perfectly-dependent table scores V = 1, a
  * perfectly-independent one scores V = 0 — the two analytic anchors of
  * Cramér's V, hand-built as fixtures.
  */
class CramersVSpec extends SparkSpec {

  private def v(df: DataFrame): (Double, Double) = {
    val c = df.groupBy("lang", "source").agg(count(lit(1)).as("o"))
    val rt = c.groupBy("lang").agg(sum("o").cast("long").as("r"))
    val ct = c.groupBy("source").agg(sum("o").cast("long").as("cl"))
    val tot = c.agg(sum("o").cast("long").as("n"))
      .crossJoin(broadcast(rt.agg(count(lit(1)).as("nr"))))
      .crossJoin(broadcast(ct.agg(count(lit(1)).as("nc"))))
    val cell = rt.crossJoin(ct)
      .join(c, Seq("lang", "source"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("lang"), col("source"), col("n"), col("nr"), col("nc"),
        expr("""(cast(o as double) - cast(r as double) * cast(cl as double) / cast(n as double))
                * (cast(o as double) - cast(r as double) * cast(cl as double) / cast(n as double))
                / (cast(r as double) * cast(cl as double) / cast(n as double))""").as("t"))
    val row = cell.groupBy("n", "nr", "nc")
      .agg(expr("""aggregate(
             array_sort(collect_list(named_struct('l', lang, 's', source, 't', t))),
             cast(0.0 as double), (a, x) -> a + x.t)""").as("chi2"))
      .select(round(col("chi2"), 6).as("chi2"),
        round(sqrt(col("chi2") / (col("n").cast("double")
          * least(col("nr") - 1, col("nc") - 1).cast("double"))), 6).as("v"))
      .head()
    (row.getDouble(0), row.getDouble(1))
  }

  test("perfect dependence scores V = 1; perfect independence scores V = 0") {
    import spark.implicits._
    // dependent: each lang maps to exactly one source (2x2, diagonal)
    val dep = (Seq.fill(10)(("en", "s1")) ++ Seq.fill(10)(("de", "s2")))
      .toDF("lang", "source")
    assert(v(dep)._2 == 1.0, s"dependent: ${v(dep)}")
    // independent: uniform 2x2 -> chi2 = 0, V = 0
    val ind = (Seq.fill(5)(("en", "s1")) ++ Seq.fill(5)(("en", "s2")) ++
      Seq.fill(5)(("de", "s1")) ++ Seq.fill(5)(("de", "s2")))
      .toDF("lang", "source")
    assert(v(ind) == ((0.0, 0.0)), s"independent: ${v(ind)}")
  }

  test("cr1 on testdata is deterministic across runs") {
    val sf = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("cr1_cramers_v")(spark, sf)
    val b = SparkEntry.queries("cr1_cramers_v")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
