package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** `collect_set` with a HARD buffer bound: the aggregation state never holds
  * more than `cap + 1` distinct elements, no matter how hot the key.
  *
  * Why this exists: a plain `collect_set` + `filter(size(ss) <= cap)` caps
  * the fan-out only AFTER the full set has been built in one aggregation
  * buffer — a pathological key with 10⁶+ distinct values materializes all of
  * them in executor memory before the filter drops the row. Here the buffer
  * stops admitting elements the moment it can prove the cap is exceeded
  * (cap + 1 distinct values seen), so per-key state is O(cap) by
  * construction at any data scale.
  *
  * Exactness of the verdict: if a key's true distinct count is ≤ cap, no
  * partial buffer can ever exceed cap (every buffer holds a subset of the
  * true set), so no truncation occurs and [[finish]] returns the complete
  * sorted set. Truncation requires observing ≥ cap + 2 distinct values,
  * which already proves the key is over the cap — the surviving elements
  * are then irrelevant because `size(ss) > cap` drops the row downstream.
  * The `size(ss) <= cap` filter contract is therefore IDENTICAL to the
  * unbounded `collect_set` version, row for row.
  *
  * Buffer is a Map (values unused) because Spark's ExpressionEncoder has a
  * proven map path (same device as [[HeavyHitters.MisraGries]]); inputs are
  * non-null Longs (ids/keys), matching `collect_set`'s null-skipping on the
  * id columns this is used for.
  */
object CappedCollectSet {

  final class CappedDistinct(cap: Int)
      extends Aggregator[Long, Map[Long, Long], Array[Long]] {
    private val limit = cap + 1

    override def zero: Map[Long, Long] = Map.empty

    override def reduce(m: Map[Long, Long], v: Long): Map[Long, Long] =
      if (m.size >= limit || m.contains(v)) m else m.updated(v, 1L)

    override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
      if (a.size >= limit) a
      else if (b.size >= limit) b
      else {
        val u = a ++ b
        // over the proof threshold: any limit-sized subset carries the
        // over-cap verdict; the elements themselves no longer matter
        if (u.size > limit) u.take(limit) else u
      }

    override def finish(m: Map[Long, Long]): Array[Long] = m.keys.toArray.sorted

    override def bufferEncoder: Encoder[Map[Long, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Column form: sorted array of the key's distinct values, truncated to
    * `cap + 1` elements once the cap is provably exceeded. Pair with
    * `filter(size(ss) <= cap)` — exactly `sort_array(collect_set(c))`
    * semantics under that filter, with O(cap) aggregation state.
    *
    * Backed by the native [[CappedDistinctAgg]] (primitive-array buffer,
    * packed-long serialization): the original `Aggregator` form above keeps
    * the contract readable and spec-tested, but its per-row immutable-Map
    * allocation + ExpressionEncoder round-trip measured 8× slower than
    * built-in `collect_set` on sf10's 60M-row basket build; the native form
    * matches built-in speed while keeping the hard bound.
    */
  def sortedSetCapped(cap: Int)(c: Column): Column = {
    GraftFunctions.register(org.apache.spark.sql.SparkSession.active)
    org.apache.spark.sql.functions.call_function(
      "capped_distinct", c, org.apache.spark.sql.functions.lit(cap))
  }

  /** The original typed-Aggregator form, kept as the documented reference
    * implementation of the cap contract (AnalyticsSpec exercises it
    * directly against the native form).
    */
  def sortedSetCappedUdaf(cap: Int)(c: Column): Column =
    udaf(new CappedDistinct(cap), Encoders.scalaLong)(c)
}
