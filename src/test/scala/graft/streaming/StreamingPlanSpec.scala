package graft.streaming

import java.io.{ByteArrayOutputStream, PrintStream}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.queries.StreamingQueries

/** Plan-shape assertions for the streaming surface (the batch families all
  * have PlanSpec coverage; these pin the stateful streaming operators).
  *
  * The physical plan of a streaming query only exists per-micro-batch, so
  * each test runs its plan to completion (AvailableNow on sf0.001) and
  * captures `StreamingQuery.explain`, which prints the LAST executed
  * batch's plan.
  */
class StreamingPlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Run the streaming DF through a memory sink and return explain output. */
  private def executedPlan(df: DataFrame, name: String,
      mode: String = "append"): String = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    try {
      q.processAllAvailable()
      val buf = new ByteArrayOutputStream()
      Console.withOut(new PrintStream(buf, true, "UTF-8")) {
        q.explain(extended = true)
      }
      buf.toString("UTF-8")
    } finally q.stop()
  }

  test("st4 plans a stream-stream symmetric hash join with both watermarks " +
    "and the event-time range condition") {
    val dir = StreamingQueries.stageEvents(spark, sf)
    val plan = executedPlan(StreamingQueries.st4Joined(spark, dir),
      s"plan_st4_${System.nanoTime()}")

    assert(plan.contains("StreamingSymmetricHashJoin"),
      s"expected stream-stream join, got:\n$plan")
    // both sides watermarked — this is what bounds join state at 100 TB
    val watermarks = "EventTimeWatermark".r.findAllIn(plan).size
    assert(watermarks >= 2, s"expected 2 watermarks, found $watermarks:\n$plan")
    assert(plan.contains("1 hours"), s"watermark delay missing:\n$plan")
    // the time-range constraint must live IN the join condition (state
    // cleanup derives from it) — not be a post-join filter
    assert("(?s)StreamingSymmetricHashJoin.*cts.*vts".r.findFirstIn(plan).isDefined,
      s"event-time range condition not in the join node:\n$plan")
  }

  test("st3 plans streaming dedup state, not a batch distinct") {
    val dir = StreamingQueries.stageEvents(spark, sf)
    val plan = executedPlan(StreamingQueries.st3Deduped(spark, dir),
      s"plan_st3_${System.nanoTime()}")

    assert(plan.contains("StreamingDeduplicate"),
      s"expected StreamingDeduplicate state operator, got:\n$plan")
    // a batch-style rewrite would show HashAggregate over the full row set
    assert(!plan.contains("SortAggregate"),
      s"unexpected batch aggregate in dedup plan:\n$plan")
  }

  test("st5 plans WATERMARK-BOUNDED dedup state (WithinWatermark variant)") {
    val dir = StreamingQueries.stageEvents(spark, sf)
    val plan = executedPlan(StreamingQueries.st5Deduped(spark, dir),
      s"plan_st5_${System.nanoTime()}")

    assert(plan.contains("StreamingDeduplicateWithinWatermark"),
      s"expected the watermark-bounded dedup operator, got:\n$plan")
    assert(plan.contains("EventTimeWatermark"),
      s"no watermark feeding the dedup state bound:\n$plan")
  }

  test("st7 plans windowed-key dedup state bounded by the watermark") {
    val dir = StreamingQueries.stageEvents(spark, sf)
    val plan = executedPlan(StreamingQueries.st7Pairs(spark, dir),
      s"plan_st7_${System.nanoTime()}")
    assert(plan.contains("StreamingDeduplicate"),
      s"expected streaming dedup state for the DAU key, got:\n$plan")
    assert(plan.contains("EventTimeWatermark"),
      s"no watermark bounding the per-day user state:\n$plan")
  }

  test("st8 plans FlatMapGroupsWithState custom state (not a batch aggregate)") {
    val dir = StreamingQueries.stageEvents(spark, sf)
    val plan = executedPlan(StreamingQueries.st8Profiles(spark, dir).toDF(),
      s"plan_st8_${System.nanoTime()}", mode = "update")
    assert(plan.contains("FlatMapGroupsWithState"),
      s"expected the custom-state operator, got:\n$plan")
  }

  test("no pack streaming query drains through the memory sink") {
    // source lint: the pack must never construct a memory sink — every
    // query drains executor-side via the parquet file sink (append) or
    // foreachBatch distributed overwrite (complete). The memory sink in
    // THIS spec's harness is plan-capture only, never a pack result path.
    val src = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "src/main/scala/graft/queries/StreamingQueries.scala")), "UTF-8")
    assert(!src.contains("format(\"memory\")"),
      "StreamingQueries constructs a memory sink — a driver-side collect")
    // runtime: the former memory-sink queries leave no temp view behind
    // (the memory sink registers its queryName as one)
    val before = spark.catalog.listTables().collect().map(_.name).toSet
    for (name <- Seq("st1_stream_window", "st2_session_window")) {
      assert(graft.SparkEntry.queries(name)(spark, sf).count() > 0)
    }
    val after = spark.catalog.listTables().collect().map(_.name).toSet
    assert(after == before,
      s"streaming query registered memory-sink temp views: ${after -- before}")
  }

  test("state partitions auto-size from staged input volume at fresh-checkpoint time") {
    // calibrated anchors: the sf0.1 profile (100k events) must keep the
    // measured optimum 8; the sf10 probe (10M events) must pick the
    // measured optimum 32 (st2 15.5→11.4 s, BENCH_SCALE.md) WITHOUT the
    // env override; the cap bounds the local harness
    assert(StreamingQueries.autoStatePartitions(1000) == 8)        // sf0.001
    assert(StreamingQueries.autoStatePartitions(100000) == 8)      // sf0.1
    assert(StreamingQueries.autoStatePartitions(1000000) == 8)     // sf1
    assert(StreamingQueries.autoStatePartitions(10000000) == 32)   // sf10
    assert(StreamingQueries.autoStatePartitions(100000000) == 64)  // capped
    // the cap follows the session's scheduling capacity, not a constant:
    // on a 512-way cluster the same 10^8-event checkpoint opens up to the
    // power-of-two sizing (313 raw -> 512), and a cluster smaller than the
    // harness keeps the 64 floor so local optima never regress
    assert(StreamingQueries.autoStatePartitions(100000000, 512) == 512)
    assert(StreamingQueries.autoStatePartitions(1000000000, 512) == 512)
    assert(StreamingQueries.autoStatePartitions(100000000, 8) == 64)
    assert(StreamingQueries.autoStatePartitions(10000000, 512) == 32)
  }

  test("st6 stream-static join broadcasts the dimension and keeps no state") {
    val dir = StreamingQueries.stageEvents(spark, sf)
    val plan = executedPlan(StreamingQueries.st6Enriched(spark, dir, sf),
      s"plan_st6_${System.nanoTime()}")

    assert(plan.contains("BroadcastHashJoin"),
      s"dimension not broadcast into the micro-batch:\n$plan")
    assert(!plan.contains("StreamingSymmetricHashJoin") &&
      !plan.contains("StateStore"),
      s"stream-static join must be stateless:\n$plan")
  }
}
