package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Manifest-style data skipping: select the parquet files of a directory
  * whose footer min/max statistics can overlap a value range, and read
  * only those.
  *
  * This is what an Iceberg/Delta manifest does with its per-file column
  * stats, expressed directly over plain parquet footers. Spark's scan
  * already skips ROW GROUPS via pushed filters, but it still lists,
  * schedules, and opens every file; at 100 TB (millions of files) the
  * file-level prune is the difference between a planning pass over
  * manifest metadata and touching every object in the store. Combined
  * with `Layout.writeZOrdered`, a range predicate on EITHER clustered
  * column prunes to ~√(files) (asserted in LayoutSpec/FilePruningSpec).
  *
  * The footer walk is driver-side and proportional to the number of FILES
  * (bytes read: one footer each) — exactly the cost profile of reading a
  * manifest; at real scale the stats live in a table-format manifest and
  * this walk becomes a metadata query.
  */
object FilePruning {

  /** Per-file (path, min, max) for a long-compatible column, from parquet
    * footer statistics (min over all row groups, max over all row groups).
    * Files with no stats for the column are kept conservatively (None).
    */
  def fileStats(spark: SparkSession, dir: String, column: String)
      : Seq[(String, Option[(Long, Long)])] = {
    val conf = new Configuration()
    val fs = new Path(dir).getFileSystem(conf)
    val files = fs.listStatus(new Path(dir)).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    files.map { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
      try {
        val ranges = reader.getFooter.getBlocks.asScala.flatMap { block =>
          block.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .flatMap { cc =>
              val st = cc.getStatistics
              if (st == null || !st.hasNonNullValue) None
              else (st.genericGetMin, st.genericGetMax) match {
                case (mn: Number, mx: Number) =>
                  Some((mn.longValue(), mx.longValue()))
                case _ => None
              }
            }
        }
        if (ranges.isEmpty) (f.getPath.toString, None)
        else (f.getPath.toString,
          Some((ranges.map(_._1).min, ranges.map(_._2).max)))
      } finally reader.close()
    }
  }

  /** Read only the files whose [min, max] for `column` intersects
    * [lo, hi]; stat-less files are read conservatively. Returns the
    * pruned DataFrame and how many files were (kept, total).
    */
  def prunedRead(spark: SparkSession, dir: String, column: String,
      lo: Long, hi: Long): (DataFrame, Int, Int) = {
    val stats = fileStats(spark, dir, column)
    val keep = stats.collect {
      case (p, None) => p
      case (p, Some((mn, mx))) if mx >= lo && mn <= hi => p
    }
    val df =
      if (keep.isEmpty)
        spark.read.parquet(dir).filter(s"`$column` >= $lo AND `$column` <= $hi").limit(0)
      else spark.read.parquet(keep: _*)
        .filter(s"`$column` >= $lo AND `$column` <= $hi")
    (df, keep.length, stats.length)
  }
}
