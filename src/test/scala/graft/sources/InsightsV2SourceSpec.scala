package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ads.{AdOps, Fixtures, InsightsSource}

class InsightsV2SourceSpec extends SparkSpec {

  private lazy val fixtureDir = Fixtures.write()

  test("V2 source returns the same rows as the driver-side JSON read") {
    val v1 = InsightsSource.read(spark, fixtureDir, Seq("a1", "a2")).data
    val v2 = InsightsSource.readV2(spark, fixtureDir, Seq("a1", "a2"))
    assert(v2.count() == v1.count())
    val key = Seq("campaign_name", "ad_name", "date_start", "publisher_platform",
      "impressions", "account_id", "account_idx", "ingest_idx")
    assert(v2.select(key.map(col): _*).collect().toSet ==
      v1.select(key.map(col): _*).collect().toSet)
  }

  test("column pruning and date filters are pushed into the reader") {
    val pruned = InsightsSource.readV2(spark, fixtureDir, Seq("a1", "a2"),
      dateStart = Some("2024-03-01"), dateStop = Some("2024-03-02"))
      .select("campaign_name", "date_start")
    val plan = pruned.queryExecution.executedPlan.toString
    // the between bounds must be ABSENT as plan-side filters (they were
    // absorbed by the source; only the isnotnull guard remains)
    assert(!plan.contains(">= 2024-03-01") && !plan.contains("<= 2024-03-02"),
      s"date bounds still filtered plan-side:\n$plan")
    // and the scan itself must be pruned to the 2 requested columns
    assert(plan.contains("[campaign_name") && plan.contains("date_start#"),
      s"scan not pruned:\n$plan")
    // the out-of-range 2024-03-09 record never leaves the reader
    assert(pruned.count() == 6)
    // full pipeline over the V2 source: dedup + pivot still work
    val deduped = AdOps.dedupFirstWins(InsightsSource.readV2(
      spark, fixtureDir, Seq("a1", "a2")))
    assert(deduped.count() == 5)
  }

  test("each account is its own input partition") {
    val v2 = InsightsSource.readV2(spark, fixtureDir, Seq("a1", "a2"))
    assert(v2.rdd.getNumPartitions == 2)
  }
}
