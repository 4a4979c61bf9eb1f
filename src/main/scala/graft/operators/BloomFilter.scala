package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Broadcastable Bloom filter as a 1-row DataFrame — the explicit form of
  * Spark's runtime-filter semi-join (`bf1_bloom_semijoin`): build from the
  * (filtered) dim side, probe the fact side with NO shuffle of the fact
  * table.
  *
  * Representation: the ≤ `bits` distinct SET positions as one sorted int
  * array in a single row (2048 bits → ≤ 8 KB broadcast; raise `bits` with
  * the build side — 1M bits is still a 4 MB broadcast). Hashes are
  * md5-nibble arithmetic (the sp1/sp4 family): pure column functions,
  * identical in Spark and any SQL engine, so filter behavior — including
  * the exact false-positive set — is deterministic and oracle-checkable.
  *
  * The probe (`mightContain`) is `array_contains` × k inside whole-stage
  * codegen. Guarantees: NO false negatives ever (spec-gated property);
  * false positives at the standard (1 − e^(−kn/m))^k rate.
  */
object BloomFilter {

  /** Position of hash `i` for `key`: first 4 md5 nibbles mod `bits`. */
  def position(i: Int, key: Column, bits: Int): Column =
    conv(substring(md5(concat(lit(s"$i:"), key.cast("string"))), 1, 4),
      16, 10).cast("int") % bits

  /** Build: distinct set positions collapsed to ONE row (sorted array).
    * Shuffle-free below the final 1-row agg; broadcast the result.
    */
  def build(df: DataFrame, keyCol: String,
      bits: Int = 2048, hashes: Int = 3): DataFrame =
    df.select(explode(array(
        (0 until hashes).map(i => position(i, col(keyCol), bits)): _*)).as("pos"))
      .agg(sort_array(collect_set(col("pos"))).as("bloom_bits"))

  /** Probe predicate: all `hashes` positions of `key` are present in the
    * broadcast `bloom_bits` array column.
    */
  def mightContain(bitsCol: Column, key: Column,
      bits: Int = 2048, hashes: Int = 3): Column =
    (0 until hashes)
      .map(i => array_contains(bitsCol, position(i, key, bits)))
      .reduce(_ && _)
}
