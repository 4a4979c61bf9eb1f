package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FilePruningSpec extends SparkSpec {
  import spark.implicits._

  private val out = "/root/repo/target/fileprune-spec/z"

  private def write(): Unit = {
    val pts = (for { x <- 0 until 32; y <- 0 until 32 } yield (x, y))
      .toDF("x", "y").repartition(8)
    Layout.writeZOrdered(pts, "x", "y", out, nFiles = 16, bits = 5)
  }

  test("footer stats cover every file with sane ranges") {
    write()
    val stats = FilePruning.fileStats(spark, out, "x")
    assert(stats.nonEmpty)
    stats.foreach { case (p, s) =>
      assert(s.isDefined, s"no stats for $p")
      val (mn, mx) = s.get
      assert(mn >= 0 && mx <= 31 && mn <= mx)
    }
  }

  test("range predicate on a z-ordered column prunes files AND keeps results exact") {
    write()
    val (df, kept, total) = FilePruning.prunedRead(spark, out, "x", 4, 7)
    assert(total == 16, s"expected 16 files, saw $total")
    // x in [4,8) is 1/8 of the x-range; Morton tiling keeps it in a minority
    // of files (a single-column-y sort would touch ALL of them)
    assert(kept < total / 2, s"pruned to $kept of $total — no skipping happened")
    val got = df.select("x", "y").as[(Int, Int)].collect().toSet
    val want = (for { x <- 4 to 7; y <- 0 until 32 } yield (x, y)).toSet
    assert(got == want)
  }

  test("pruning on the OTHER clustered dimension also skips files") {
    write()
    val (df, kept, total) = FilePruning.prunedRead(spark, out, "y", 28, 31)
    assert(kept < total, s"no pruning on y: $kept of $total")
    assert(df.count() == 4 * 32)
  }

  test("empty intersection returns an empty frame without reading data") {
    write()
    val (df, kept, _) = FilePruning.prunedRead(spark, out, "x", 100, 200)
    assert(kept == 0 && df.count() == 0)
  }
}
