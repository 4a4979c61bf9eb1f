package graft

import org.apache.spark.sql.streaming.Trigger

/** st* wall-time diagnosis: counts micro-batches and breaks each one down
  * (durationMs phases + state-store metrics) so the streaming queries'
  * bench numbers can be attributed to machinery vs. data work.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.StreamProfile"
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.build("graft-stream-profile", cpus)
    val dir = graft.queries.StreamingQueries.stageEvents(spark, sfDir)

    def profile(label: String, mkDf: => org.apache.spark.sql.DataFrame,
        mode: String): Unit = {
      (1 to 3).foreach { round =>
        val name = s"prof_${label}_$round"
        val t0 = System.nanoTime()
        val q = mkDf.writeStream.format("memory").queryName(name)
          .outputMode(mode).trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"== $label round $round: wall $wall%.2f s, " +
          s"${q.recentProgress.length} progress entries")
        q.recentProgress.foreach { p =>
          val st = p.stateOperators.map(s0 =>
            s"op=${s0.operatorName} rows=${s0.numRowsTotal} upd=${s0.numRowsUpdated} " +
              s"commitMs=${s0.commitTimeMs} memMB=${s0.memoryUsedBytes / 1024 / 1024}")
            .mkString("; ")
          println(s"  batch=${p.batchId} in=${p.numInputRows} " +
            s"durationMs=${p.durationMs} [$st]")
        }
      }
    }

    profile("st4", graft.queries.StreamingQueries.st4Joined(spark, dir), "append")
    profile("st3", graft.queries.StreamingQueries.st3Deduped(spark, dir), "append")
    // state-partition sizing experiment: the store-commit cost scales with
    // partition count (4 join stores per partition), state rows don't need 32
    for (n <- Seq(8, 4)) {
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      profile(s"st4_p$n", graft.queries.StreamingQueries.st4Joined(spark, dir), "append")
    }
    spark.conf.set("spark.sql.shuffle.partitions", cpus.toString)
    spark.stop()
  }
}
