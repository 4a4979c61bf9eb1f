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

  /** Two-sided generalization: INTERVAL-OVERLAP join.
    *
    * `[aStart, aEnd) ∩ [bStart, bEnd) ≠ ∅` (i.e. aStart < bEnd AND
    * bStart < aEnd) — both sides explode to the bins they cover and
    * equi-join on (keys…, bin). Unlike the point case, an overlapping pair
    * can meet in SEVERAL shared bins, so the pair is attributed to ONE
    * canonical bin — the bin of the overlap's start, max(aStart, bStart) —
    * with a residual filter instead of a join-wide distinct: dedup stays a
    * per-row predicate, never a shuffle over the join output.
    *
    * Duplication per side = interval length / binSeconds; output is
    * shuffled on (keys, bin) — the same cost shape that lets the point
    * variant survive 100 TB.
    */
  def intervalOverlap(
      a: DataFrame, b: DataFrame,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      keys: Seq[String] = Nil, binSeconds: Long = 86400L): DataFrame = {
    def binOf(c: Column): Column =
      floor(c.cast("timestamp").cast("long") / binSeconds)
    def bins(s: String, e: String): Column = sequence(
      binOf(col(s)),
      binOf(col(e).cast("timestamp") - expr("INTERVAL 1 MICROSECOND")))
    val l = a.withColumn("__bin", explode(bins(aStart, aEnd)))
    val r = b.withColumn("__bin", explode(bins(bStart, bEnd)))
    l.join(r, keys :+ "__bin")
      // true interval overlap…
      .filter(col(aStart).cast("timestamp") < col(bEnd).cast("timestamp") &&
        col(bStart).cast("timestamp") < col(aEnd).cast("timestamp"))
      // …counted once: only in the bin containing max(aStart, bStart)
      .filter(col("__bin") === binOf(greatest(
        col(aStart).cast("timestamp"), col(bStart).cast("timestamp"))))
      .drop("__bin")
  }
}
