package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact all-pairs cosine similarity via a BLOCKED equi-join.
  *
  * Exact near-dup at a corpus-relative threshold is inherently O(N²) in
  * compute, but the *plan* must not be a nested-loop cartesian (which
  * broadcasts one full side to every task and degenerates at scale). Here
  * each vector gets a deterministic block id; the left side fans out to the
  * block pairs it participates in; the join is an EQUI-join on block id, so
  * it shuffles on key and each task handles one bounded block×block tile —
  * per-task memory is O(N/nBlocks), never O(N).
  *
  * Measured motivation (synthetic corpus): qualifying pairs start at cosine
  * 0.4501 while the background distribution's p99.9 is ≈0.377 — an SRP-LSH
  * per-plane collision gap of only 0.649 vs 0.5, so no (planes, tables)
  * choice reaches recall 1.0 with real pruning (best observed at sf0.1:
  * recall 0.97 while still scanning 47% of all pairs). At thresholds this
  * deep in the background tail the exact blocked scan IS the scale path;
  * LSH pruning pays off in the high-cosine regime (see
  * [[AnnLsh.neardupPairs]], spec-gated, recall 1.0 on planted ≥0.95 dups).
  */
object AllPairs {

  /** Pairs (i, j, cos_sim) with i < j and rounded cosine ≥ threshold.
    *
    * @param nBlocks block count: per-task memory is O(N/nBlocks) vectors;
    *                size so one block fits an executor core's working set.
    */
  def cosinePairs(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBlocks: Int = 32): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val blk = pmod(crc32(col(idCol).cast("string")), lit(nBlocks)).cast("int")
    // Left side owns every block pair (ba, bb) with ba <= bb: fan each row
    // out to the blocks at-or-above its own. Right side keeps one copy.
    val a = emb.select(col(idCol).as("i"), col(vecCol).as("ea"), blk.as("ba"))
      .withColumn("bb", explode(expr(s"sequence(ba, ${nBlocks - 1})")))
    val b = emb.select(col(idCol).as("j"), col(vecCol).as("eb"), blk.as("bj"))
    // Equi-join on block id; same-block tiles dedupe by id order (each
    // unordered pair lands in exactly one tile, so cross-block pairs need
    // no id-order guard — least/greatest normalizes the output instead).
    // Spark's round() on a double routes through BigDecimal.valueOf →
    // Double.toString — string-formatting cost that dwarfs the 64-FMA
    // cosine when run per pair (measured: it dominated the O(N²) loop's
    // profile at 200k vectors). Rounding to 4 dp moves a value by ≤5e-5,
    // so pre-filtering the RAW cosine at threshold − 1e-4 (double the
    // bound, absorbing the subtraction's own representation error) keeps
    // every pair that could round up to the threshold and keeps round()
    // off the quadratic path; survivors' cos_sim is the same round() of
    // the same double, so the output is bit-identical.
    a.join(b, col("bb") === col("bj") &&
        (col("ba") < col("bj") || col("i") < col("j")))
      .withColumn("raw_sim", expr("cosine_sim(ea, eb)"))
      .filter(col("raw_sim") >= threshold - 1e-4)
      .withColumn("cos_sim", round(col("raw_sim"), 4))
      .filter(col("cos_sim") >= threshold)
      .select(least(col("i"), col("j")).as("i"),
        greatest(col("i"), col("j")).as("j"), col("cos_sim"))
  }

  /** [[cosinePairs]] restricted to a deterministic md5-bucket sample of the
    * vectors, sized in-plan to ~`targetSample` rows — the referee that keeps
    * exact-near-dup verification O(target²) at ANY corpus size.
    *
    * The sampling rate adapts to the corpus: keep vectors whose md5 bucket
    * (graft.operators.Sampling, 16-bit) is below `min(65536, 65536·target
    * div n)`. `n` comes from a 1-row aggregate broadcast — a pure column
    * function of the data, no driver action — and the integer `div` keeps
    * both engines' thresholds bit-identical. At 100 TB this is how you
    * referee a quadratic baseline you cannot afford to run: the sample's
    * all-pairs stay ~constant work while remaining an exact, deterministic,
    * cross-engine-reproducible subset of the full pair space.
    */
  def sampledCosinePairs(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, targetSample: Int = 2000): DataFrame = {
    import graft.operators.Sampling
    val t = emb.agg(count(lit(1)).as("n"))
      .select(least(lit(Sampling.Buckets.toLong),
        expr(s"${Sampling.Buckets.toLong * targetSample} div n")).as("t"))
    val sampled = emb
      .crossJoin(broadcast(t))
      .filter(Sampling.bucket(col(idCol)) < col("t"))
      .select(col(idCol), col(vecCol))
    cosinePairs(sampled, idCol, vecCol, threshold)
  }
}
