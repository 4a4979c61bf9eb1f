package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration for graft's native Catalyst expressions.
  *
  * Two paths, same registry:
  *  - `GraftFunctions.register(spark)` for an existing session (what the
  *    query pack uses — the driver constructs the session);
  *  - `GraftExtensions` via `spark.sql.extensions=graft.functions.GraftExtensions`
  *    for injection at session build time.
  */
object GraftFunctions {

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (exprs => CosineSimilarity(exprs(0), exprs(1))),
    "sq_dist" -> (exprs => SqDist(exprs(0), exprs(1))),
    "rolling_hash" -> (exprs => RollingHash(exprs.head)),
    // aggregate: the analyzer wraps an AggregateFunction builder result in
    // an AggregateExpression at resolution, same as the built-in registry
    "capped_distinct" -> (exprs => CappedDistinctAgg(exprs(0), exprs(1))))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // theta range joins → binned equi-joins (no nested loops at scale)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("sq_dist"),
      new ExpressionInfo(classOf[SqDist].getName, "sq_dist"),
      (exprs: Seq[Expression]) => SqDist(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("capped_distinct"),
      new ExpressionInfo(classOf[CappedDistinctAgg].getName, "capped_distinct"),
      (exprs: Seq[Expression]) => CappedDistinctAgg(exprs(0), exprs(1))))
  }
}
