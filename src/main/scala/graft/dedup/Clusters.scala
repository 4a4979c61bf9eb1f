package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate cluster assignment: given undirected similar-pairs edges,
  * assign every member document its component's minimum id (the "keeper") —
  * the step that turns pairwise near-dup detection into an actual dedup
  * decision (keep the keeper, drop the rest).
  *
  * Algorithm: iterative min-label propagation to fixpoint. Each round every
  * node takes the min of its own label and its neighbors' labels — the
  * min id floods a component in diameter rounds.
  *
  * Scale notes: each round is one shuffle-on-key join + aggregate; lineage
  * is cut with localCheckpoint so 100 rounds don't build a 100-deep plan.
  * Near-dup graphs are overwhelmingly tiny components (pairs/triples), so
  * rounds-to-fixpoint is small in practice; at extreme scale swap the loop
  * for the large-star/small-star formulation (same join primitive, provably
  * O(log n) rounds).
  */
object Clusters {

  /** @param pairs DataFrame with columns (a, b) — undirected edges.
    * @return (doc_id, keeper_id) for every node appearing in any edge.
    */
  def assignKeepers(pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    val sym = pairs.select(col("a").as("id"), col("b").as("nb"))
      .union(pairs.select(col("b").as("id"), col("a").as("nb")))
      .cache()
    var labels = sym.select(col("id")).distinct()
      .withColumn("label", col("id"))
      .cache()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val nbrMin = sym
        .join(labels.select(col("id").as("nb"), col("label").as("nbLabel")), "nb")
        .groupBy("id").agg(min(col("nbLabel")).as("minNbr"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("minNbr"), col("label"))).as("label"))
        .localCheckpoint()
      converged = next.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old")).isEmpty
      labels.unpersist()
      labels = next.cache()
      round += 1
    }
    labels.select(col("id").as("doc_id"), col("label").as("keeper_id"))
  }

  /** Oracle-side mirror: the same propagation unrolled as a chain of CTEs
    * (`rounds` must cover the maximum component diameter — callers pick a
    * bound ≥ the edge count of the largest plausible component).
    */
  def unrolledSql(pairsCte: String, rounds: Int): String = {
    // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    // round references the previous one twice — unmaterialized, the plan
    // expands exponentially (observed as "too many open files")
    val init =
      """e AS MATERIALIZED (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
        |l0 AS MATERIALIZED (SELECT DISTINCT a AS id, a AS label FROM e)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT l.id, least(l.label, coalesce(min(nl.label), l.label)) AS label
         |  FROM l${i - 1} l
         |  LEFT JOIN e ON e.a = l.id
         |  LEFT JOIN l${i - 1} nl ON nl.id = e.b
         |  GROUP BY l.id, l.label)""".stripMargin
    }
    s"""$pairsCte,
       |$init,
       |${steps.mkString(",\n")}
       |SELECT id AS doc_id, label AS keeper_id FROM l$rounds ORDER BY doc_id""".stripMargin
  }
}
