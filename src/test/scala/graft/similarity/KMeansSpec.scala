package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated 2-d blobs with deterministic jitter
  private def blobs = {
    val centers = Seq((0.0, 0.0), (10.0, 10.0), (20.0, 0.0))
    (0 until 60).map { i =>
      val (cx, cy) = centers(i % 3)
      val j1 = (i * 37 % 100) / 100.0 - 0.5
      val j2 = (i * 61 % 100) / 100.0 - 0.5
      (i.toLong, Array((cx + j1).toFloat, (cy + j2).toFloat))
    }.toDF("id", "vec")
  }

  test("fit recovers the three blobs; every blob member lands together") {
    val cents = KMeans.fit(blobs, "id", "vec", k = 3, iters = 4)
    assert(cents.count() == 3)
    val assigned = KMeans.assign(blobs, "id", "vec", cents)
      .select("id", "cid").as[(Long, Long)].collect()
    // all members of a blob (id % 3) share one cluster, and the three
    // blobs map to three distinct clusters
    val byBlob = assigned.groupBy(_._1 % 3).map { case (b, xs) =>
      b -> xs.map(_._2).distinct
    }
    assert(byBlob.values.forall(_.length == 1), byBlob)
    assert(byBlob.values.flatten.toSet.size == 3)
  }

  test("inertia is non-increasing across Lloyd iterations") {
    def inertiaAfter(iters: Int): Double = {
      val cents = KMeans.fit(blobs, "id", "vec", k = 3, iters = iters)
      KMeans.inertia(KMeans.assign(blobs, "id", "vec", cents))
    }
    val seq = (0 to 3).map(inertiaAfter)
    seq.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-9, seq) }
  }

  test("recompute drops empty clusters, keeps populated means") {
    val pts = Seq((1L, Array(0f, 0f)), (2L, Array(2f, 2f))).toDF("id", "vec")
    val far = Seq((0L, Array(0.0, 0.0)), (1L, Array(100.0, 100.0)))
      .toDF("cid", "cvec")
    val a = KMeans.assign(pts, "id", "vec", far)
    val re = KMeans.recompute(pts, "id", "vec", a)
    val rows = re.collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 0L)
    assert(rows.head.getSeq[Double](1) == Seq(1.0, 1.0))
  }
}
