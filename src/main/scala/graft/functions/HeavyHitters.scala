package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Heavy hitters with bounded memory: a Misra-Gries summary as a typed
  * Aggregator, plus the standard two-pass exact top-k built on it.
  *
  * Why not `groupBy(word).count().orderBy(...).limit(k)` alone: that
  * shuffles one row PER DISTINCT KEY. Fine for a 31-word toy vocabulary;
  * at 100 TB with billions of distinct tokens/URLs/ids, pass 1 runs the
  * MG summary (≤ `capacity` entries per partition, merged map-side — the
  * shuffle carries O(partitions × capacity)), and pass 2 computes exact
  * counts ONLY for the surviving candidates via a broadcast semi-join.
  * MG guarantees every item with frequency > n/capacity survives pass 1,
  * so for any k with count(k-th item) > n/capacity the two-pass result
  * equals the exact top-k (the regime the `hh1` oracle checks; the
  * sub-threshold approximate regime is spec-gated).
  */
object HeavyHitters {

  /** Misra-Gries: on overflow, decrement all counters and drop zeros —
    * equivalently here, subtract the smallest counter. Counts are lower
    * bounds with undercount ≤ n/capacity.
    */
  final class MisraGries(capacity: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {

    override def zero: Map[String, Long] = Map.empty

    override def reduce(m: Map[String, Long], w: String): Map[String, Long] =
      m.get(w) match {
        case Some(c) => m.updated(w, c + 1)
        case None if m.size < capacity => m.updated(w, 1L)
        case None =>
          // decrement-all: drop the zeros, the new item cancels out too
          m.collect { case (k, c) if c > 1 => k -> (c - 1) }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (k, c)) =>
        m.updated(k, m.getOrElse(k, 0L) + c)
      }
      if (sum.size <= capacity) sum
      else {
        // subtract the (capacity+1)-th largest count from everything —
        // the batched form of decrement-all, preserving the MG bound
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
        sum.collect { case (k, c) if c > cut => k -> (c - cut) }
      }
    }

    override def finish(buf: Map[String, Long]): Map[String, Long] = buf

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Column form: `misra_gries(w)` → map<string,long> of ≤ capacity
    * surviving candidates with lower-bound counts.
    */
  def misraGries(capacity: Int)(w: Column): Column =
    udaf(new MisraGries(capacity), Encoders.STRING)(w)

  /** Two-pass exact top-k: MG candidates → exact counts restricted to the
    * candidate set (broadcast) → top-k under a total order. No driver-side
    * state: the candidate set flows as a (tiny) DataFrame.
    */
  def topkExact(words: DataFrame, wCol: String, k: Int, capacity: Int): DataFrame = {
    val cands = words.agg(misraGries(capacity)(col(wCol)).as("m"))
      .select(explode(map_keys(col("m"))).as(wCol))
    words.join(broadcast(cands), wCol)
      .groupBy(wCol).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(wCol)).limit(k)
  }
}
