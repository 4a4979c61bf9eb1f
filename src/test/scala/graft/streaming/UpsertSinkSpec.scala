package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private val work =
    java.nio.file.Files.createTempDirectory("graft-upsert-sink").toString

  private def writeBatchFile(name: String, rows: Seq[(Long, Long, String)]): Unit = {
    val dir = s"$work/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/$name"),
      rows.map { case (k, v, s) => s"""{"k": $k, "ver": $v, "state": "$s"}""" }
        .mkString("\n").getBytes("UTF-8"))
  }

  private val schema = "k LONG, ver LONG, state STRING"

  private def drain(): Unit = {
    val src = spark.readStream.schema(schema).json(s"$work/in")
    val q = UpsertSink.applyAvailable(spark, src, s"$work/table",
      keys = Seq("k"), versionCol = "ver", checkpointDir = s"$work/ck")
    q.awaitTermination()
  }

  private def table = spark.read.parquet(s"$work/table")
    .orderBy("k").as[(Long, Long, String)].collect().toSeq

  test("stream of keyed changes applies as last-version-wins state") {
    writeBatchFile("b1.jsonl",
      Seq((1L, 1L, "created"), (2L, 1L, "created"), (1L, 2L, "updated")))
    drain()
    assert(table == Seq((1L, 2L, "updated"), (2L, 1L, "created")))
  }

  test("a later file upserts existing keys and appends new ones; old files are not replayed") {
    writeBatchFile("b2.jsonl", Seq((2L, 2L, "deleted"), (3L, 1L, "created")))
    drain()
    assert(table == Seq(
      (1L, 2L, "updated"), (2L, 2L, "deleted"), (3L, 1L, "created")))
  }

  test("re-draining with nothing new is a no-op (checkpointed offsets)") {
    drain()
    assert(table == Seq(
      (1L, 2L, "updated"), (2L, 2L, "deleted"), (3L, 1L, "created")))
  }
}
