package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = (1 to 2000).map(_.toString).toDF("k")

  test("split labels every row exactly once and respects fractions roughly") {
    val got = Sampling.split(ids, col("k"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(got.values.sum == 2000)
    assert(got("train") > 1500 && got("train") < 1700, got)
    assert(got("val") > 120 && got("val") < 280, got)
    assert(got("test") > 120 && got("test") < 280, got)
  }

  test("split is a pure function of the key: stable across repartition") {
    def labels(parts: Int) =
      Sampling.split(ids.repartition(parts), col("k"),
          Seq("a" -> 0.5, "b" -> 0.5))
        .as[(String, String)].collect().toMap
    assert(labels(2) == labels(13))
  }

  test("remainder falls into the last label when fractions sum below 1") {
    val got = Sampling.split(ids, col("k"), Seq("x" -> 0.5, "y" -> 0.25))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(got.keySet == Set("x", "y"))
    assert(got("y") > 800, got) // 0.25 slice + the 0.25 remainder
  }
}
