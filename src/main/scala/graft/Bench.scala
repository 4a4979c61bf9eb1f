package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every declared query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line (driver contract).
  *
  * A warmup pass (tiny actions over each base table) runs first so the
  * measured times are query cost, not JVM/codegen/scan-setup cost — the
  * local stand-in for a warmed executor fleet.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.build("graft-bench", cpus.toInt)

    // Optional filter for isolated profiling: SPARK_GRAFT_ONLY=dd3,dd4
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }

    // Steady-state measurement: one untimed pass warms JIT/codegen and
    // shuffle machinery (cold-start dominates otherwise — e.g. the LSH
    // query costs ~3x its steady-state time on a cold JVM), then data
    // caches are dropped so the timed pass recomputes from the source —
    // only code paths stay warm, not results.
    selected.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()

    val results = selected.map { case (name, fn) =>
      // accumulated broadcast/shuffle state from ~60 prior queries inflates
      // later measurements 2-3x in a single local JVM; a GC between queries
      // keeps each measurement about the query, not the backlog
      System.gc()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Per-query times rounded to ms: with ~100 queries the full-precision
    // line is ~4 KB and overflows the driver's stdout tail window, so the
    // line's own head gets truncated away and never parses. 3 decimals
    // keeps the whole line comfortably inside the window.
    def ms(v: Double): String = (math.round(v * 1000) / 1000.0).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // sbt buries stdout under [info] prefixes; a file copy keeps the line
    // machine-parseable regardless of the launcher
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n")
    }
    spark.stop()
  }
}
