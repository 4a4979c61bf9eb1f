package graft.ads

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, to_date}

/** K1-K4: the reference's sinks (SURVEY.md §2.2), parquet/CSV stand-ins for
  * the warehouse.
  */
object Sinks {

  /** K1: CSV audit artifact (reference `main.py:529-535`): header row, static
    * columns first then action columns — SORTED, fixing the reference's
    * set-iteration column order. coalesce(1) mirrors the single audit file;
    * at scale you would drop the coalesce and audit a directory.
    */
  def csvAudit(flat: DataFrame, path: String): Unit =
    flat.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** K2/K4: append to the day-partitioned table (reference
    * `insert_rows_json` + DAY partitioning, `docs/GCP_SETUP.md:144-152`).
    * A typed `p_date` partition column is derived from the string
    * `date_start` the rows carry (the reference's declared-DATE /
    * in-flight-STRING mismatch, resolved at the boundary).
    *
    * Schema evolution: the batch is aligned to merge(existing, incoming)
    * so new action columns append as typed NULL-backed columns and old
    * files simply lack them (readers merge footers).
    */
  def appendToTable(spark: SparkSession, flat: DataFrame, path: String): Long = {
    val withDate = flat.withColumn("p_date", to_date(col("date_start"), "yyyy-MM-dd"))
    val target = SchemaEvolution.tableSchema(spark, path)
      .map(SchemaEvolution.merge(_, withDate.schema))
      .getOrElse(withDate.schema)
    val aligned = SchemaEvolution.alignTo(withDate, target)
    val n = aligned.count()
    aligned.write.mode("append").partitionBy("p_date").parquet(path)
    n
  }

  /** Idempotent variant: overwrite only the partitions present in the batch
    * (dynamic partition overwrite) — our improvement over the reference's
    * max-instances=1 + manual `SELECT DISTINCT` remediation
    * (`README.md:377-385`). Re-running a day is then safe by construction.
    */
  def overwritePartitions(spark: SparkSession, flat: DataFrame, path: String): Long = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val withDate = flat.withColumn("p_date", to_date(col("date_start"), "yyyy-MM-dd"))
    val target = SchemaEvolution.tableSchema(spark, path)
      .map(SchemaEvolution.merge(_, withDate.schema))
      .getOrElse(withDate.schema)
    val aligned = SchemaEvolution.alignTo(withDate, target)
    val n = aligned.count()
    aligned.write.mode("overwrite").partitionBy("p_date").parquet(path)
    n
  }

  /** Table read with footer-merged schema (evolution-aware). */
  def readTable(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
