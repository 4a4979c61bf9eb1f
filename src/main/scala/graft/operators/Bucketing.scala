package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for shuffle-free co-located joins.
  *
  * At 100 TB the dominant recurring cost of fact⋈fact joins is the exchange
  * of both sides on the join key. Writing both tables bucketed by that key
  * (same bucket count) makes the join a per-bucket zip: Catalyst sees
  * hash-compatible output partitioning on both scans and plans SortMergeJoin
  * with NO Exchange. The write pays the shuffle once; every subsequent join
  * on that key is free of it. (BucketingSpec asserts the exchange-free plan.)
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets). */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. */
  def bucketedJoin(
      spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
