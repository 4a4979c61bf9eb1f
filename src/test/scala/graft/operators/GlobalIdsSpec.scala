package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class GlobalIdsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("ids are the exact global rank in key order, contiguous from 0") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    val n = docs.count()
    val out = GlobalIds.withGlobalId(docs, "gid", col("doc_id"))
      .orderBy("doc_id").collect()
    assert(out.length == n)
    // contiguous 0..N-1, and ascending with the key order
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) == i, s"row $i: expected gid $i, got $r")
    }
  }

  test("plan: one range shuffle, no global sort, SinglePartition only over " +
    "the O(P) offset summary") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    val plan = GlobalIds.withGlobalId(docs, "gid", col("doc_id"))
      .queryExecution.executedPlan.toString()

    // the data path is range-partitioned (the one O(N) shuffle)
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"expected a range-partition exchange:\n$plan")
    // no global sort anywhere: sortWithinPartitions and the window's local
    // sort both print `false`; a single-task global sort would print `true`
    assert("Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isEmpty,
      s"global sort found — the scale-killer this operator exists to avoid:\n$plan")
    // exactly one SinglePartition exchange, feeding the O(P)-row
    // prefix-sum window, never the data
    val singleParts = "SinglePartition".r.findAllIn(plan).size
    assert(singleParts == 1,
      s"expected exactly 1 SinglePartition exchange (offset summary), got $singleParts:\n$plan")
  }
}
