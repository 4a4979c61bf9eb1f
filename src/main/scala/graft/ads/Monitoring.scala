package graft.ads

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The documented monitoring/ops query surface over the ad table (reference
  * `docs/GCP_SETUP.md:362-365`, `docs/DEPLOYMENT.md:443-475`,
  * `README.md:382-385`). With the day-partitioned layout, the 7-day window
  * is partition pruning, not a full scan.
  */
object Monitoring {

  /** A1: total row count. */
  def rowCount(table: DataFrame): Long = table.count()

  /** A2: freshness — latest loaded day. */
  def freshness(table: DataFrame): DataFrame =
    table.agg(max(col("date_start")).as("latest_data"))

  /** A3: last-7-days daily rollup, newest first. */
  def dailyRollup(table: DataFrame, today: String): DataFrame =
    table.filter(col("date_start") >= date_format(
      date_sub(to_date(lit(today)), 7), "yyyy-MM-dd"))
      .groupBy("date_start")
      .agg(count(lit(1)).as("row_count"),
        sum(col("impressions")).as("total_impressions"),
        sum(col("spend")).as("total_spend"))
      .orderBy(col("date_start").desc)

  /** A4: scheduled freshness health check. */
  def healthCheck(table: DataFrame, today: String): DataFrame = {
    val yesterday = date_format(date_sub(to_date(lit(today)), 1), "yyyy-MM-dd")
    table.agg(max(col("date_start")).as("latest_data"))
      .select(lit(today).as("check_date"), col("latest_data"),
        when(col("latest_data") === yesterday, "OK")
          .otherwise("MISSING_DATA").as("status"))
  }

  /** D2: documented duplicate remediation — full-row distinct. */
  def distinctRows(table: DataFrame): DataFrame = table.distinct()
}
