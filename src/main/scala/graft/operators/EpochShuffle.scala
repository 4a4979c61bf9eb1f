package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic epoch shuffling — "give every example a pseudo-random but
  * REPRODUCIBLE position for epoch e" (the training loader's shuffle that
  * must replay identically across restarts, engines, and partitionings;
  * `rand()` can never hash-match a re-run).
  *
  * position = global_rank of md5(seed:key) — the seeded hash is the sort
  * key, so each seed induces an independent pseudo-permutation of the
  * corpus, and the rank comes from [[GlobalIds]] (range repartition +
  * O(P) offset prefix-sum — no single-partition sort at any N). The raw
  * key tie-breaks so the order stays total even under md5 collisions.
  * Composes with [[Sharding]]: shard the SHUFFLED positions and a loader
  * streams fixed-size shards in shuffled order.
  */
object EpochShuffle {

  def withPosition(df: DataFrame, key: Column, seed: String,
      posCol: String = "pos"): DataFrame =
    GlobalIds.withGlobalId(
        df.withColumn("_h", md5(concat_ws(":", lit(seed), key.cast("string")))),
        posCol, col("_h"), key)
      .drop("_h")
}
