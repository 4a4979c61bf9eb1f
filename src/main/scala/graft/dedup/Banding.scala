package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact Hamming-neighbour search over 64-bit signatures via banded LSH —
  * the shared device behind dd4 (text SimHash) and mm4 (media pHash).
  *
  * The signature splits into 4 disjoint 16-bit bands. For Hamming distance
  * ≤ 3, pigeonhole guarantees at least one band is untouched (3 flips
  * cannot land in all 4 bands), so the band-equality self-join loses NO
  * qualifying pair — candidates are verified with one exact `bit_count`
  * over the XOR and the result is EXACT, never approximate.
  *
  * Scale shape (the 100 TB form; the 4×8-bit draft this replaces had a
  * 1,024-value join-key ceiling that made every join group ~n/256 rows at
  * 10⁹ documents):
  *   - band-key domain is 4 × 65,536 = 262,144 values, and the 64-bit
  *     signature space itself stays birthday-safe into the 10⁹-document
  *     decade (a 32-bit space saturates there, making hd ≤ 3 meaningless);
  *   - the join shuffles 28-byte (doc_id, sig, band) rows — payloads and
  *     text never travel (dd10's digests-not-text contract);
  *   - a pair sharing k bands is emitted ONCE, at its FIRST shared band —
  *     the band index is recomputable from the two signatures inside the
  *     join residual (j12_interval_overlap's per-row device), so there is
  *     no distinct-shuffle over the join output.
  */
object Banding {

  val Bands = 4
  val BandBits = 16
  private val BandMask = (1L << BandBits) - 1 // 65535

  /** Explode (doc_id, sig) into one row per 16-bit band: (doc_id, sig, bi,
    * bv). Shift-and-mask agrees bit-for-bit with the DuckDB oracle form
    * `(sig >> (16*bi)) & 65535` (arithmetic vs logical shift is moot under
    * the mask — bits below position 64-shift are identical either way).
    */
  def bands64(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"), col("sig"), explode(array(
        (0 until Bands).map(b => struct(lit(b).as("bi"),
          shiftright(col("sig"), BandBits * b).bitwiseAND(lit(BandMask)).as("bv"))): _*)).as("blk"))
      .select(col("doc_id"), col("sig"), col("blk.bi").as("bi"), col("blk.bv").as("bv"))

  /** First band index (0-based) at which two signatures agree — total on
    * join output because the band-equality key guarantees SOME shared band.
    */
  def firstSharedBand(xorSig: Column): Column = {
    def band(b: Int) = shiftright(xorSig, BandBits * b).bitwiseAND(lit(BandMask))
    when(band(0) === 0, 0).when(band(1) === 0, 1).when(band(2) === 0, 2).otherwise(3)
  }

  /** All unordered pairs (a < b) within Hamming ≤ `maxHamming` of each
    * other, found by the banded self-join and verified exactly. Exact for
    * maxHamming ≤ 3 by the pigeonhole argument above (spec-proved against
    * the literal quadratic filter in BandingSpec). The band table is
    * cached (registry-tracked) because the self-join reads it twice.
    */
  def hammingPairs64(sig: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < Bands, s"pigeonhole needs maxHamming < $Bands bands")
    val blocks = bands64(sig).cache()
    graft.CacheRegistry.track(blocks)
    val xorSig = col("p.sig").bitwiseXOR(col("q.sig"))
    blocks.as("p").join(blocks.as("q"),
        col("p.bi") === col("q.bi") && col("p.bv") === col("q.bv") &&
          col("p.doc_id") < col("q.doc_id") &&
          col("p.bi") === firstSharedBand(xorSig))
      .select(col("p.doc_id").as("a"), col("q.doc_id").as("b"),
        bit_count(xorSig).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
