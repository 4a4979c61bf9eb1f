package graft
import org.apache.spark.sql.execution.debug._

/** Plan-audit tool: print the formatted physical plan for named queries.
  *
  *   runMain graft.Explain <sfDir> [name1,name2,...]
  *
  * No names → every query in SparkEntry.queries. Used each round to audit
  * new queries for scan pruning (`ReadSchema`/`PushedFilters`), broadcast
  * vs shuffle joins, and whole-stage-codegen coverage before trusting the
  * bench number.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.build("graft-explain", 4)
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[explain] no such query: $name")
        case Some(fn) =>
          println(s"\n===== $name =====")
          try fn(spark, sfDir).explain("formatted")
          catch { case e: Throwable =>
            System.err.println(s"[explain] $name failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
