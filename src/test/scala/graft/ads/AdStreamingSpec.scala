package graft.ads

import org.apache.commons.io.FileUtils
import graft.SparkSpec

class AdStreamingSpec extends SparkSpec {

  private lazy val fixtureDir = Fixtures.write()

  test("streaming daily sync drains the landing zone once, idempotently") {
    val table = "/root/repo/target/test-work/ad_data_stream"
    val ckpt = "/root/repo/target/test-work/ad_data_stream_ckpt"
    Seq(table, ckpt).foreach(p => FileUtils.deleteQuietly(new java.io.File(p)))

    val r1 = Pipelines.dailySyncStreaming(spark, fixtureDir, Seq("a1", "a2"),
      table, ckpt)
    assert(r1.status == "success")
    assert(r1.rowsProcessed == 5) // same dedup result as the batch sync

    // re-run with the same checkpoint: no new files → no duplicate appends
    val r2 = Pipelines.dailySyncStreaming(spark, fixtureDir, Seq("a1", "a2"),
      table, ckpt)
    assert(r2.rowsProcessed == 5)
  }

  test("streaming sync ignores landing-zone files of unlisted accounts (batch parity)") {
    val table = "/root/repo/target/test-work/ad_data_stream_a1"
    val ckpt = "/root/repo/target/test-work/ad_data_stream_a1_ckpt"
    Seq(table, ckpt).foreach(p => FileUtils.deleteQuietly(new java.io.File(p)))
    // a2's file sits in the same landing zone but only a1 is requested
    val r = Pipelines.dailySyncStreaming(spark, fixtureDir, Seq("a1"), table, ckpt)
    assert(r.rowsProcessed == 3) // acct1's 4 records minus its exact-key dup
    val batch = Pipelines.dailySync(spark, fixtureDir, Seq("a1"),
      "/root/repo/target/test-work/ad_data_batch_a1",
      "/root/repo/target/test-work/audit_a1.csv", dryRun = true)
    assert(r.rowsProcessed == batch.rowsProcessed)
  }
}
