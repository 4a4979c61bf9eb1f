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
    *
    * NOT self-verifying: the result equals the exact top-k only when
    * count(k-th item) > n/capacity. Use [[topkExactCertified]] when the
    * caller needs that guarantee CHECKED rather than assumed.
    */
  def topkExact(words: DataFrame, wCol: String, k: Int, capacity: Int): DataFrame = {
    val cands = words.agg(misraGries(capacity)(col(wCol)).as("m"))
      .select(explode(map_keys(col("m"))).as(wCol))
    words.join(broadcast(cands), wCol)
      .groupBy(wCol).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(wCol)).limit(k)
  }

  /** Self-certifying exact top-k with adaptive capacity. After the exact
    * second pass, the MG guarantee is CHECKED: every non-candidate's true
    * count is ≤ n/capacity, so if the k-th candidate count exceeds that
    * bound, no non-candidate can belong to the top-k — the result is
    * provably exact (ties included: any non-candidate is strictly below
    * the k-th count, so the (n desc, word) total order is unaffected).
    * If the certificate fails, retry with 8× capacity.
    *
    * This is the scale lesson the sf1 probe taught: a FIXED capacity
    * silently loses the guarantee when the corpus grows (the top-k counts
    * stay put while n/capacity climbs past them — hh1 returned wrong rows
    * at 10× data before this). Adaptive capacity pays O(log) extra rounds
    * only when the data's skew demands it; the certificate is exact
    * arithmetic on measured values, never an assumption. Worst case
    * (uniform data, capacity reaches ~n/count_k) degenerates toward the
    * plain exact groupBy — the honest cost of demanding exactness.
    *
    * If `maxRounds` capacity escalations all fail to certify (adversarially
    * flat data: no k-th count ever clears n/capacity), the function does
    * NOT return the uncertified sketch-derived rows — that would rebuild
    * the silent-wrong-rows failure this function exists to prevent. It
    * falls back to the plain exact `groupBy(w).count()` top-k, paying the
    * one-row-per-distinct-key shuffle the docstring names as the honest
    * worst case. Every return path is therefore exact.
    */
  def topkExactCertified(words: DataFrame, wCol: String, k: Int,
                         capacity0: Int = 64, maxRounds: Int = 6): DataFrame =
    topkExactCertifiedWithStats(words, wCol, k, capacity0, maxRounds).result

  /** The certification outcome alongside the rows: `certifiedRounds` is the
    * number of MG rounds run (0 when the input is empty and certification
    * is vacuous), `fellBack` is true iff `maxRounds` escalations all failed
    * and the plain exact groupBy path produced the result. The rows are
    * exact either way — this exists so a caller at 100 TB can SEE that it
    * just paid a one-row-per-distinct-key shuffle instead of discovering it
    * in a stage graph.
    */
  final case class CertifiedTopk(result: DataFrame, certifiedRounds: Int,
                                 finalCapacity: Int, fellBack: Boolean)

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** [[topkExactCertified]] with the certification signal surfaced. */
  def topkExactCertifiedWithStats(words: DataFrame, wCol: String, k: Int,
                                  capacity0: Int = 64, maxRounds: Int = 6): CertifiedTopk = {
    val n = words.count()
    var cap = capacity0
    var rounds = 0
    while (rounds < maxRounds) {
      val topk = topkExact(words, wCol, k, cap)
      rounds += 1
      val kth = topk.agg(min(col("n"))).head()
      val kthCount = if (kth.isNullAt(0)) 0L else kth.getLong(0)
      if (kthCount > n / cap) return CertifiedTopk(topk, rounds, cap, fellBack = false)
      cap *= 8
    }
    // Certification never held: exact fallback, never an unverified result —
    // and never a SILENT one: the caller asked for the bounded-shuffle path
    // and is about to pay the full-cardinality shuffle instead.
    log.warn(s"HeavyHitters.topkExactCertified: certification failed after " +
      s"$maxRounds rounds (final capacity ${cap / 8}, n=$n) -- falling back " +
      s"to the exact one-row-per-distinct-key groupBy")
    val exact = words.groupBy(wCol).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(wCol)).limit(k)
    CertifiedTopk(exact, rounds, cap / 8, fellBack = true)
  }
}
