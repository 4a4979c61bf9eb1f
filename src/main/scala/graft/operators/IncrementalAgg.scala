package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of algebraic aggregates (the materialized-view
  * refresh math): a sum/count rollup over (old ∪ delta) equals the rollup
  * of the two PARTIAL rollups — so a daily refresh re-aggregates one day
  * of partials against the stored MV instead of rescanning history.
  *
  * This is exactly the reference's daily cadence (append one day, re-read
  * rollups, `main.py:359-366` / monitoring queries) done without the
  * rescan. At 100 TB the stored MV is keyed/bucketed on the group key, the
  * delta partial is a day's partition, and the combine is one co-partitioned
  * keyed aggregation — cost O(|MV| + |day|), independent of history length.
  * Works for any algebraic aggregate (sum, count, min, max; avg via
  * sum+count pairs); holistic aggregates (exact percentiles) need sketches
  * instead.
  */
object IncrementalAgg {

  /** Re-aggregate partial rollups: union by name, sum `sumCols` (counts
    * combine by summation too), min/max via their own monoids.
    */
  def combine(old: DataFrame, delta: DataFrame, keys: Seq[String],
      sumCols: Seq[String], minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil): DataFrame = {
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      minCols.map(c => min(col(c)).as(c)) ++ maxCols.map(c => max(col(c)).as(c))
    old.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
