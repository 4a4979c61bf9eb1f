package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{SparkSpec, Tables}

class EventStreamSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val stageDir = "/root/repo/target/stream-stage/spec_events"

  /** Stage events as several files so maxFilesPerTrigger yields multiple
    * micro-batches — the watermark only advances between batches, and append
    * mode only emits windows the watermark has passed.
    */
  private lazy val staged: String = {
    Tables.events(spark, sf).repartition(8)
      .write.mode("overwrite").parquet(stageDir)
    stageDir
  }

  test("watermarked windowed agg in append mode emits finalized windows") {
    val schema = spark.read.parquet(staged).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val out = EventStream.runToCompletion(spark,
      EventStream.windowedAgg(stream, watermark = "1 hour"),
      OutputMode.Append, s"wm_out_${System.nanoTime()}")
    val got = out.collect()
    assert(got.nonEmpty, "append mode emitted no finalized windows")
    // Files arrive out of event-time order, so the watermark legitimately
    // DROPS rows that land after their window finalized: every emitted
    // window must be a subset (n ≤ batch) of the batch truth, keyed
    // correctly, and emitted exactly once.
    val batch = Tables.events(spark, sf)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
        .as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val keys = got.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length == keys.length, "a window emitted twice")
    got.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(batch.contains(key), s"emitted unknown window $key")
      assert(r.getLong(2) <= batch(key), s"window $key emitted MORE than batch")
    }
  }

  test("sessionization with flatMapGroupsWithState tracks per-user state") {
    val schema = spark.read.parquet(staged).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 2).parquet(staged)
    val out = EventStream.runToCompletion(spark,
      EventStream.sessionize(spark, stream, gapSec = 1800),
      OutputMode.Append, s"sess_out_${System.nanoTime()}")
    val got = out.collect()
    assert(got.nonEmpty)
    // updates are cumulative per user: every emitted count is bounded by the
    // batch truth, and closed sessions (event-time timeout fired) appear
    // once the watermark passes their gap
    val batch = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      assert(r.getLong(1) <= batch(r.getLong(0)),
        s"user ${r.getLong(0)} emitted more events than exist")
    }
    assert(got.exists(_.getBoolean(3)), "no session ever closed via timeout")
  }
}
