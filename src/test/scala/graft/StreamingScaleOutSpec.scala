package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** State scale-out for stateful streaming queries — the BENCH_SCALE claim
  * ("re-checkpoint at a larger state-partition count when state outgrows
  * the layout") executed rather than asserted in prose.
  *
  * Spark freezes a stateful query's state partitioning at its FIRST
  * checkpoint: later runs ignore `spark.sql.shuffle.partitions`. So scaling
  * out state = start a FRESH checkpoint at the larger count and let the
  * (replayable) source rebuild state. This spec proves the three legs of
  * that contract on a streaming dedup (st3/st5's operator):
  *
  *  1. restart with MORE data under a RAISED conf keeps the frozen count —
  *     and restores state across the restart (duplicates of already-seen
  *     keys arriving after the restart are still dropped);
  *  2. a fresh checkpoint at the raised count actually runs the state store
  *     at that count (observed from StateOperatorProgress, not inferred);
  *  3. both layouts produce the identical final result set.
  */
class StreamingScaleOutSpec extends SparkSpec {

  private def freshDir(tag: String): java.io.File = {
    val f = new java.io.File(s"target/scaleout/$tag-${System.nanoTime()}")
    f.mkdirs(); f
  }

  private def maxStatePartitions(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.flatMap(_.stateOperators.map(_.numShufflePartitions)).max

  test("dedup state survives restart at the frozen partition count, then migrates via a fresh checkpoint") {
    val src = freshDir("src")
    val out = freshDir("out")
    val ckpt1 = freshDir("ckpt1")

    def write(ids: Range, file: String): Unit =
      spark.range(ids.start, ids.end).select(col("id").as("event_id"))
        .coalesce(1).write.mode("append").parquet(s"$src/$file")
    def runDedup(ckpt: java.io.File, outDir: java.io.File)
        : org.apache.spark.sql.streaming.StreamingQuery = {
      val schema = spark.read.parquet(src.toString + "/part1").schema
      val q = spark.readStream.schema(schema)
        .parquet(s"$src/*")
        .dropDuplicates("event_id")
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(); q
    }

    // leg 0: first checkpoint at 4 state partitions over ids [0, 100)
    write(0 until 100, "part1")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val q1 = runDedup(ckpt1, out)
      assert(maxStatePartitions(q1) == 4L)
      assert(spark.read.parquet(out.toString).count() == 100)

      // leg 1: append [50, 150) — half duplicates of state built BEFORE the
      // restart — and resume under a RAISED conf. The frozen count must win,
      // and restored state must drop the 50 re-arrivals.
      write(50 until 150, "part2")
      spark.conf.set("spark.sql.shuffle.partitions", "16")
      val q2 = runDedup(ckpt1, out)
      assert(maxStatePartitions(q2) == 4L,
        "state partitioning must stay frozen at the first checkpoint's count")
      val afterResume = spark.read.parquet(out.toString)
      assert(afterResume.count() == 150,
        "restored dedup state failed to drop re-arrived keys across the restart")

      // leg 2: scale out = FRESH checkpoint at 16; the replayable source
      // rebuilds state at the new layout
      val ckpt2 = freshDir("ckpt2")
      val out2 = freshDir("out2")
      val q3 = runDedup(ckpt2, out2)
      assert(maxStatePartitions(q3) == 16L,
        "fresh checkpoint did not pick up the raised state-partition count")

      // leg 3: identical results under both layouts
      val a = spark.read.parquet(out.toString).select("event_id")
      val b = spark.read.parquet(out2.toString).select("event_id")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "scale-out migration changed the result set")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
