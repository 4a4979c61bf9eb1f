package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling for training-data pipelines.
  *
  * `rand()`-based sampling is irreproducible across runs/engines and
  * repartitions; keying the decision on a content hash makes the sample a
  * pure function of the data — the same rows are selected on every run, on
  * any cluster, and the decision is pushable anywhere in the plan. Bucket =
  * first 4 hex digits of md5(key) as an integer in [0, 65536); keep if
  * bucket < rate * 65536.
  */
object Sampling {

  val Buckets = 65536

  /** Hash bucket in [0, 65536) from a key column (string-cast first). */
  def bucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int")

  /** Uniform deterministic sample at `rate`. */
  def uniform(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.filter(bucket(key) < (rate * Buckets).toInt)

  /** Stratified deterministic sample: per-stratum rates, default for the
    * rest. The threshold is a CASE over the stratum column — no join.
    */
  def stratified(
      df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit((defaultRate * Buckets).toInt)) {
      case (acc, (value, rate)) =>
        when(stratum === value, lit((rate * Buckets).toInt)).otherwise(acc)
    }
    df.filter(bucket(key) < threshold)
  }

  /** Deterministic dataset split (train/val/test …): label each row by its
    * hash bucket against cumulative fraction boundaries. A pure function
    * of the key — the split is stable across runs, engines, and
    * repartitions, and rows can never leak between splits.
    *
    * @param fractions (label, fraction) in order; fractions must sum to ≤ 1
    *                  — any remainder falls into the LAST label.
    */
  def split(df: DataFrame, key: Column, fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty)
    val cuts = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
      .map(c => (c * Buckets).toInt)
    val labeled = fractions.map(_._1).zip(cuts).dropRight(1)
      .foldRight(lit(fractions.last._1): Column) { case ((label, cut), rest) =>
        when(bucket(key) < cut, label).otherwise(rest)
      }
    df.withColumn("split", labeled)
  }
}
