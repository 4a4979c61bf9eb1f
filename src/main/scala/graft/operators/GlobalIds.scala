package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous global ids 0..N-1 in total key order — WITHOUT a global
  * single-partition sort or an O(N) window.
  *
  * The naive `row_number() OVER (ORDER BY key)` plans as Exchange
  * SinglePartition + global sort: one task sees all N rows — the canonical
  * scale-killer for "assign every training example a contiguous id".
  * This operator instead:
  *
  *  1. range-repartitions on the key (the ONLY O(N) shuffle; partition p's
  *     keys all precede partition p+1's) and sorts within partitions;
  *  2. reads each row's position inside its sorted partition from the low
  *     33 bits of `monotonically_increasing_id()` (a narrow map — Spark
  *     defines the layout as partition id in the high bits, per-partition
  *     record index in the low 33);
  *  3. counts rows per partition (map-side combined to O(P) rows), turns
  *     the counts into start offsets with a prefix-sum window over those
  *     O(P) rows (the plan's only SinglePartition exchange — over ~32
  *     summary rows, never the data);
  *  4. broadcast-joins the offsets back and emits `offset + local`.
  *
  * Ids equal the exact global rank in key order for any partition
  * boundaries, so the (sampled, boundary-nondeterministic) range
  * partitioner does not leak into the result — PROVIDED the key is total
  * (unique, or extended with tie-break columns): rows equal under the key
  * order would get an arbitrary stable-only-per-run order within their
  * partition.
  */
object GlobalIds {

  def withGlobalId(df: DataFrame, idCol: String, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "at least one (totally ordering) key column")
    val ranged = df
      .repartitionByRange(keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_local", monotonically_increasing_id()
        .bitwiseAND(lit((1L << 33) - 1)))
    val counts = ranged.groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
    // prefix sum over O(P) partition-count rows — tiny by construction
    val w = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_cnt")).over(w), lit(0L)))
      .select(col("_pid"), col("_off"))
    ranged.join(broadcast(offsets), "_pid")
      .withColumn(idCol, col("_off") + col("_local"))
      .drop("_pid", "_local", "_off")
  }
}
