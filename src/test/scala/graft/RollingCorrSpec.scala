package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** mc1's windowed Pearson: the analytic anchors (a window where y = x
  * scores 1, y = -x scores -1, constant y scores NULL) on a hand series.
  */
class RollingCorrSpec extends SparkSpec {

  private def corr7(rows: Seq[(String, Long, Long)]): Map[String, Option[Double]] = {
    import spark.implicits._
    val dr = rows.toDF("day", "x", "y")
    val win = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    val w = dr.select(col("day"),
      count(lit(1)).over(win).cast("long").as("n"),
      sum("x").over(win).cast("long").as("sx"),
      sum("y").over(win).cast("long").as("sy"),
      sum(expr("cast(x as decimal(38,0)) * x")).over(win).as("sxx"),
      sum(expr("cast(y as decimal(38,0)) * y")).over(win).as("syy"),
      sum(expr("cast(x as decimal(38,0)) * y")).over(win).as("sxy"))
    val nD = col("n").cast("double")
    val da = nD * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
    val db = nD * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double")
    val num = nD * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")
    w.select(col("day"), when(da > 0 && db > 0, round(num / sqrt(da * db), 6))
        .otherwise(lit(null)).as("corr"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
  }

  test("coupled, anti-coupled, and flat windows score 1, -1, NULL") {
    val days = (1 to 7).map(i => f"2024-01-$i%02d")
    val coupled = days.zipWithIndex.map { case (d, i) => (d, 100L + i, 5L + i) }
    assert(corr7(coupled)(days.last).contains(1.0))
    val anti = days.zipWithIndex.map { case (d, i) => (d, 100L + i, 50L - i) }
    assert(corr7(anti)(days.last).contains(-1.0))
    val flat = days.zipWithIndex.map { case (d, i) => (d, 100L + i, 7L) }
    assert(corr7(flat)(days.last).isEmpty, "constant y must yield NULL")
  }

  test("mc1 on testdata is deterministic across runs") {
    val sf = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("mc1_rolling_corr")(spark, sf)
    val b = SparkEntry.queries("mc1_rolling_corr")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
