package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The CMS decode contract agg8 relies on: Spark's count_min_sketch SQL
  * aggregate hashes UTF8 BYTES, so driver-side probes must use
  * estimateCount(bytes) — probing with the Java String hashes differently
  * and silently returns garbage. Pin both facts on planted skew.
  */
class CountMinSpec extends SparkSpec {

  test("byte-probe estimates honor the one-sided CMS bound on planted skew") {
    import spark.implicits._
    // "hot" occurs 5000 times, 1000 singletons: estimates must be >= exact
    // and within eps*N of it for the hot key at eps = 0.001.
    val words = (Seq.fill(5000)("hot") ++ (0 until 1000).map("w" + _))
      .toDF("w").repartition(8)
    val row = words.agg(
      expr("count_min_sketch(w, 0.001d, 0.9999d, 42)").as("cms"),
      count(lit(1)).as("n")).head()
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](0)))
    val n = row.getLong(1)
    val est = cms.estimateCount("hot".getBytes("UTF-8"))
    assert(est >= 5000L, s"CMS underestimated: $est")
    assert(est <= 5000L + math.ceil(0.001 * n).toLong, s"CMS outside eps*N: $est")
    // a singleton stays near 1 (collisions can only add)
    val e1 = cms.estimateCount("w42".getBytes("UTF-8"))
    assert(e1 >= 1L && e1 <= 1L + math.ceil(0.001 * n).toLong)
  }

  test("sketches merge cell-wise: union of shard sketches equals whole-corpus estimates") {
    import spark.implicits._
    val a = Seq.fill(300)("k").toDF("w")
    val b = Seq.fill(200)("k").toDF("w")
    def sketch(df: org.apache.spark.sql.DataFrame) =
      org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(
          df.agg(expr("count_min_sketch(w, 0.001d, 0.9999d, 42)")).head().getAs[Array[Byte]](0)))
    val merged = sketch(a).mergeInPlace(sketch(b))
    assert(merged.estimateCount("k".getBytes("UTF-8")) >= 500L)
  }
}
