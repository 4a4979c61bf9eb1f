package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** GlobalIds' key must be TOTAL: rows equal under the key order get an
  * arbitrary per-run order inside their partition. This spec pins the
  * documented remedy — extend the key with tie-break columns — and shows it
  * yields the same ids as the naive global row_number over the compound key.
  */
class GlobalIdsTieBreakSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("compound keys give exact ranks; residual full-duplicate rows get " +
    "their run's consecutive id block") {
    // l_orderkey repeats (one row per line); the 4-column compound key is
    // total except for one full-duplicate pair at sf0.001 — exactly the
    // case the operator doc warns about. The contract that survives
    // duplicates: every equal-key run receives precisely its rank range as
    // a consecutive id block (arbitrary order WITHIN the run), so sorting
    // by (keys, gid) must produce gid == position for every row.
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val keys = Seq(col("l_orderkey"), col("l_linenumber"),
      col("l_partkey"), col("l_suppkey"))
    val out = GlobalIds.withGlobalId(li, "gid", keys: _*)
      .orderBy(keys :+ col("gid"): _*).collect()
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(4) == i, s"row $i: expected gid $i, got $r")
    }
  }
}
