package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sized-shard layout for dataset export — "write this corpus
  * as shards of exactly N rows each, in key order" (the layout training
  * jobs stream: fixed-size shards give the loader uniform work units and
  * reproducible global example order across re-exports).
  *
  * shard_id = global_rank(key) div rowsPerShard — a pure function of the
  * data, so the SAME rows land in the SAME shard at any parallelism, on
  * any engine (the oracle replays it as `(row_number() - 1) // N`). The
  * global rank comes from [[GlobalIds]] (range-repartition + per-partition
  * positions + O(P) offset prefix-sum) — NO single-partition global sort
  * anywhere, which is what makes "number every example" survive 100 TB.
  * Every shard except the last has exactly rowsPerShard rows.
  */
object Sharding {

  /** Attach `shard_id` (and the underlying contiguous `_gid`, dropped). */
  def withShardId(df: DataFrame, rowsPerShard: Int, keys: Column*): DataFrame = {
    require(rowsPerShard > 0, "rowsPerShard must be positive")
    GlobalIds.withGlobalId(df, "_gid", keys: _*)
      .withColumn("shard_id", expr(s"_gid div $rowsPerShard"))
      .drop("_gid")
  }

  /** Write one file per shard: repartition BY shard id (hash exchange on
    * the shard key — each task owns whole shards) and partition the layout
    * by `shard_id=...` directories. Rows inside a shard file keep key
    * order via sortWithinPartitions.
    */
  def writeSharded(df: DataFrame, path: String, rowsPerShard: Int,
      keys: Column*): Unit =
    withShardId(df, rowsPerShard, keys: _*)
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id") +: keys: _*)
      .write.mode("overwrite")
      .partitionBy("shard_id")
      .parquet(path)
}
