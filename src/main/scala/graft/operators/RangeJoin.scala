package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join as a BINNED EQUI-join.
  *
  * `left.time ∈ [right.start, right.end)` is a theta join — Spark plans it
  * as a nested-loop unless an equi key exists. The standard scale rewrite:
  * quantize time into bins of `binSeconds`; the right interval explodes to
  * every bin it overlaps, the left point maps to its one bin, the join is
  * an EQUI-join on (keys…, bin) and the exact predicate is a residual
  * filter. Each (left, right) pair meets in exactly one bin (the point's),
  * so no dedup is needed.
  *
  * Cost model: right-side duplication = interval length / binSeconds (pick
  * binSeconds ≈ typical interval length → ~2× duplication); join output per
  * bin is |left∩bin| × |right overlapping bin| — bounded, shuffled on key,
  * never a driver-side or nested-loop pass. This is what survives 100 TB of
  * events against 10 TB of windows.
  */
object RangeJoin {

  /** @param left       point side; must contain `leftTime` (timestamp)
    * @param right      interval side; `[rightStart, rightEnd)` half-open
    * @param keys       equi-key column names present on BOTH sides (may be
    *                   empty — then the bin is the only join key)
    * @param binSeconds bin width; choose ≈ the typical interval length
    */
  def binned(
      left: DataFrame, right: DataFrame,
      leftTime: String, rightStart: String, rightEnd: String,
      keys: Seq[String] = Nil, binSeconds: Long = 86400L): DataFrame = {
    def binOf(c: Column): Column =
      floor(c.cast("timestamp").cast("long") / binSeconds)
    val l = left.withColumn("__bin", binOf(col(leftTime)))
    val r = right
      .withColumn("__bin", explode(sequence(
        binOf(col(rightStart)),
        // end is exclusive: the bin of the last contained instant
        binOf(col(rightEnd).cast("timestamp") - expr("INTERVAL 1 MICROSECOND")))))
    l.join(r, keys :+ "__bin")
      .filter(col(leftTime).cast("timestamp") >= col(rightStart).cast("timestamp") &&
        col(leftTime).cast("timestamp") < col(rightEnd).cast("timestamp"))
      .drop("__bin")
  }
}
