package graft.similarity

import org.apache.spark.sql.functions._
import graft.{SparkSpec, SparkEntry}

/** emb7's blockwise absmax 4-bit quantization: codes stay in [-7, 7], every
  * coordinate reconstructs within the absmax error bound scale/14, and the
  * operator's reason to exist holds — an outlier coordinate destroys a
  * per-vector scale's resolution but only poisons its OWN block here.
  */
class BlockQuantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("codes bounded and reconstruction within scale/14 per coordinate") {
    val out = SparkEntry.queries("emb7_block_quant")(spark, sf)
      .filter(col("vec_id") < 50)
      .collect()
    assert(out.length == 50 * 8)
    val emb = graft.Tables.embeddings(spark, sf).filter(col("vec_id") < 50)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    out.foreach { r =>
      val (vid, blk) = (r.getLong(0), r.getLong(1))
      val scale = r.getLong(2) / 1e6
      val codes = r.getString(3).split(',').map(_.toInt)
      assert(codes.forall(c => c >= -7 && c <= 7), s"code out of 4-bit range: $vid/$blk")
      val bv = emb(vid).slice(blk.toInt * 8, blk.toInt * 8 + 8).map(_.toDouble)
      assert(math.abs(bv.map(math.abs).max - scale) < 1e-5,
        s"scale is not the block absmax: $vid/$blk")
      bv.zip(codes).foreach { case (v, c) =>
        val err = math.abs(v - c * scale / 7.0)
        assert(err <= scale / 14.0 + 1e-5, s"reconstruction err $err > ${scale / 14} at $vid/$blk")
      }
    }
  }

  test("an outlier coordinate poisons only its own block (the advantage over per-vector int8)") {
    // v[0] = 100, the other 63 coordinates ±0.01: a per-vector scale (emb1's
    // int8 over max|v| = 100) rounds every small coordinate to code 0 —
    // total information loss outside the outlier. Blockwise, blocks 1-7
    // scale at 0.01 and keep full 4-bit resolution.
    import spark.implicits._
    val v = (Seq(100.0f) ++ (1 to 63).map(i => if (i % 2 == 0) 0.01f else -0.01f)).toArray
    val df = Seq((0L, v)).toDF("vec_id", "embedding")
    val q = df
      .select(col("vec_id"), col("embedding"), explode(expr("sequence(0L, 7L)")).as("blk"))
      .select(col("vec_id"), col("blk"),
        expr("slice(transform(embedding, x -> CAST(x AS DOUBLE)), CAST(blk*8+1 AS INT), 8)").as("bv"))
      .select(col("vec_id"), col("blk"), col("bv"),
        expr("aggregate(bv, 0D, (a, x) -> greatest(a, abs(x)))").as("am"))
      .select(col("blk"),
        expr("transform(bv, x -> CAST(round(x * 7 / am) AS INT))").as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // per-vector int8 codes for the small coordinates: round(0.01/100*127)=0
    assert(math.round(0.01 / 100.0 * 127) == 0L, "premise: per-vector scale zeroes them")
    // blockwise: every non-outlier block keeps ±7 resolution on ±0.01
    (1 to 7).foreach { b =>
      assert(q(b.toLong).forall(c => math.abs(c) == 7),
        s"block $b lost the small coordinates: ${q(b.toLong)}")
    }
  }
}
