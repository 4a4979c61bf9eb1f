package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{ENSURE_REQUIREMENTS, ShuffleExchangeExec}

/** The scale property PageRank claims: edges are hash-partitioned on `src`
  * once at prepare() time, and a power-iteration round consumes that cached
  * partitioning directly — the planner never lands an ENSURE_REQUIREMENTS
  * exchange on the cached edge scan, so per-round shuffle cost is O(|ranks|),
  * not O(|edges|). AQE and auto-broadcast are disabled here so the iteration
  * join is a genuine shuffle join (at spec scale AQE would broadcast the rank
  * side and the assertion would pass vacuously).
  */
class PageRankPlanSpec extends SparkSpec {

  private def everyNode(p: SparkPlan): Seq[SparkPlan] =
    p +: (p.children ++ p.subqueries).flatMap(everyNode)

  /** Walk down through unary operators (Sort, Project, partial aggregates…)
    * to the shuffle's data source; a join/aggregate boundary is a legitimate
    * reason to re-shuffle, a bare cached scan is not.
    */
  @annotation.tailrec
  private def unaryDescend(p: SparkPlan): SparkPlan =
    if (p.children.size == 1) unaryDescend(p.children.head) else p

  test("pagerank iteration re-uses the pre-partitioned edge cache (no edge re-shuffle)") {
    val conf = spark.conf
    val prevAqe = conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = spark.range(2000).select(
        (col("id") % 97).as("src"), (col("id") % 89 + 1000).as("dst"))
      val g = PageRank.prepare(edges)
      val pr0 = g.nodes.crossJoin(g.nn)
        .select(col("node"), (lit(1.0) / col("n")).as("pr"))
      val stepDf = PageRank.step(g, pr0, 0.15, 0.85, 9)
      stepDf.collect()
      val nodes = everyNode(stepDf.queryExecution.executedPlan)
      assert(nodes.exists(_.isInstanceOf[InMemoryTableScanExec]),
        "edges are not read from the cache")
      assert(nodes.exists(_.isInstanceOf[ShuffleExchangeExec]),
        "no shuffle join in the iteration plan — assertion would be vacuous")
      val offending = nodes.collect {
        case e: ShuffleExchangeExec if e.shuffleOrigin == ENSURE_REQUIREMENTS &&
          unaryDescend(e.child).isInstanceOf[InMemoryTableScanExec] => e
      }
      assert(offending.isEmpty,
        s"cached edge scan re-shuffled per iteration:\n${offending.mkString("\n")}")
      g.edges.unpersist()
    } finally {
      conf.set("spark.sql.adaptive.enabled", prevAqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }
}
