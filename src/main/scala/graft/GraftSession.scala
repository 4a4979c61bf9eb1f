package graft

import org.apache.spark.sql.SparkSession

/** The engine's recommended session configuration, used by the Verify and
  * Bench mains and available to library users.
  *
  * Settings and the 100 TB reasoning:
  *  - AQE on (+ skew-join split): runtime re-planning replaces hand-tuned
  *    partition counts when stage statistics disagree with estimates;
  *  - shuffle partitions sized to the core count locally (the cluster-size
  *    knob at scale), not the 200 default;
  *  - 128 MB scan partitions: large enough to amortize task overhead,
  *    small enough that a partition's working set fits executor memory;
  *  - UTC session time zone: oracle/engine date parity;
  *  - graft extensions (cosine_sim, rolling_hash) registered up front.
  */
object GraftSession {

  def build(appName: String, cpus: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (128 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // standard (RFC 4648) base64, no 76-char MIME line breaks — portable
      // across engines (the oracle's base64 is unchunked)
      .config("spark.sql.chunkBase64String.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark) // idempotent; covers reuse
    spark
  }
}
