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
}
