package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cluster-then-dedup semantic near-duplicate pruning over an embedding
  * column — the SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540):
  * partition the corpus into k-means clusters, then search for near-dup
  * pairs ONLY within each cluster and keep one representative per
  * duplicated neighborhood.
  *
  * Why this is the scale path where [[AllPairs.cosinePairs]] is the exact
  * baseline: all-pairs work is Σ per-cluster (n/k)² ≈ n²/k — choosing
  * k ∝ √n bounds total pair work at O(n^1.5) while the E-step stays a
  * broadcast (centroids are k rows). The within-cluster pairing is an
  * EQUI-join on cluster id — it shuffles on key, each task handles one
  * cluster tile, and AQE's skew-join split handles an oversized cluster.
  * The price is recall: a near-dup pair split across a cluster boundary is
  * not examined (the paper's accepted trade; SemDedupSpec measures recall
  * against the exact pairs on the driver corpus).
  *
  * Determinism (the oracle contract): centroids are the `id < k` vectors
  * with k from a 1-row broadcast (`least(maxK, greatest(8,
  * floor(sqrt(n))))` — IEEE-754 sqrt is CORRECTLY ROUNDED, unlike ln/exp,
  * so floor(sqrt) of an exact integer count is identical in both engines);
  * assignment reuses [[KMeans.assign]]'s round-then-argmin/tie-on-cid
  * rule; pair cosines round to 4 dp before the threshold, with the raw
  * prefilter at threshold − 1e-4 keeping `round()` off the pair loop
  * (the dd5 contract, AllPairs.scala).
  */
object SemDedup {

  /** k chosen in-plan from the corpus size — a 1-row aggregate, broadcast,
    * never a driver action. k = √n is the self-balancing choice: the
    * E-step costs n·k·d and the within-cluster pairing costs (n²/k)·d, so
    * k ∝ √n makes BOTH O(n^1.5·d) — a fixed k turns the pairing back into
    * n²/k by configuration at 100× the data (the round-9 saturation).
    * maxK only caps the centroid broadcast (maxK·d floats per executor —
    * 4096·64·4B ≈ 1 MB) and the static `id < maxK` scan prefilter; it
    * binds at n > 16.7M vectors per dedup scope, where you'd shard the
    * scope (by source/language) before raising the cap.
    */
  def chooseK(emb: DataFrame, maxK: Int): DataFrame =
    emb.agg(least(lit(maxK.toLong),
      greatest(lit(8L), floor(sqrt(count(lit(1)))))).as("k"))

  /** Per-vector verdict (id, cid, keep): keep = 0 iff some SAME-CLUSTER
    * vector with a smaller id is cosine-≥-threshold near it (first-wins,
    * the d1/dd1 orientation). Output is one row per input vector.
    */
  def keepFlags(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, maxK: Int = 4096): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val kdf = chooseK(emb, maxK)
    // id < maxK is a static scan-pruned prefilter; the runtime k (≤ maxK)
    // narrows it via the broadcast — same rows in both engines.
    val cents = emb.filter(col(idCol) < maxK)
      .crossJoin(broadcast(kdf))
      .filter(col(idCol) < col("k"))
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
    // The E-step scans the corpus once; the (id, cid) assignment then
    // feeds THREE consumers (both sides of the self-join + the verdict
    // join). localCheckpoint materializes it executor-side — 2 longs/row,
    // distributed — so the broadcast E-step isn't recomputed per branch
    // and the pair-search plan starts from the materialized assignment
    // (the gr1/bpe1 iterative-lineage pattern).
    val assigned = KMeans.assign(emb, idCol, vecCol, cents)
      .select(col(idCol), col("cid")).localCheckpoint()
    val x = assigned.join(emb.select(col(idCol), col(vecCol)), idCol)
    val hi = x.select(col("cid"), col(idCol).as("i"), col(vecCol).as("va"))
    val lo = x.select(col("cid"), col(idCol).as("j"), col(vecCol).as("vb"))
    val pruned = hi.join(lo, "cid").filter(col("j") < col("i"))
      .withColumn("raw_sim", expr("cosine_sim(va, vb)"))
      .filter(col("raw_sim") >= threshold - 1e-4)
      .filter(round(col("raw_sim"), 4) >= threshold)
      .select(col("i").as(idCol)).distinct()
    assigned.join(pruned.withColumn("pruned", lit(1)), Seq(idCol), "left")
      .select(col(idCol), col("cid"),
        when(col("pruned").isNull, lit(1)).otherwise(lit(0)).as("keep"))
  }
}
