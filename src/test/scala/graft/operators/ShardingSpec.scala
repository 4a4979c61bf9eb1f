package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sized-shard export: exact shard sizes, determinism across partitioning,
  * and the one-file-per-shard layout of writeSharded.
  */
class ShardingSpec extends SparkSpec {

  private lazy val rows = {
    import spark.implicits._
    // deliberately non-contiguous, shuffled keys
    scala.util.Random.shuffle((0 until 1000).map(i => i * 3L).toList)
      .toDF("k").repartition(7)
  }

  test("every shard except the last has exactly rowsPerShard rows, in key order") {
    val sizes = Sharding.withShardId(rows, 128, col("k"))
      .groupBy("shard_id").agg(count(lit(1)).as("n"),
        min(col("k")).as("lo"), max(col("k")).as("hi"))
      .orderBy("shard_id").collect()
    assert(sizes.length == 8) // 1000 = 7*128 + 104
    sizes.dropRight(1).foreach(r => assert(r.getLong(1) == 128))
    assert(sizes.last.getLong(1) == 104)
    // shard key ranges are disjoint and ascending: shard i's max < shard i+1's min
    sizes.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) < b.getLong(2), s"overlap between $a and $b")
    }
  }

  test("shard assignment is a pure function of the data (partitioning-invariant)") {
    val a = Sharding.withShardId(rows, 128, col("k"))
      .orderBy("k").collect().toSeq
    val b = Sharding.withShardId(rows.repartition(23), 128, col("k"))
      .orderBy("k").collect().toSeq
    assert(a == b)
  }

  test("writeSharded lands one file per shard, rows in key order inside") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Sharding.writeSharded(rows, dir, 128, col("k"))
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard_id=")).sortBy(_.getName)
    assert(shardDirs.length == 8)
    shardDirs.foreach { sd =>
      val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${sd.getName}: ${files.length} files")
    }
    // read back one shard: contiguous run of the global key order
    val s0 = spark.read.parquet(s"$dir/shard_id=0").select("k")
      .collect().map(_.getLong(0)).sorted
    assert(s0.length == 128 && s0.head == 0L && s0.last == 127 * 3L)
    graft.CacheRegistry.trackPath(dir): Unit
  }
}
