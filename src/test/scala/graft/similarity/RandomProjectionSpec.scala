package graft.similarity

import org.apache.spark.sql.functions._
import graft.{SparkSpec, SparkEntry}

/** emb6's JL random projection: the seeded Rademacher matrix is balanced
  * (not degenerate), projected distances actually preserve geometry on the
  * test corpus (the property the operator exists for), and the plan keeps
  * the 16-row sign table broadcast with the corpus un-shuffled.
  */
class RandomProjectionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("sign matrix is balanced per output dim and deterministic across runs") {
    val out1 = SparkEntry.queries("emb6_random_projection")(spark, sf)
    val out2 = SparkEntry.queries("emb6_random_projection")(spark, sf)
    assert(out1.exceptAll(out2).isEmpty, "projection is not deterministic")
    // re-derive the sign table the query builds and check each output dim
    // mixes both signs substantially (a stuck-at-±1 row would make the
    // projection a plain coordinate sum, not a JL embedding)
    val signs = spark.range(16).select(col("id").as("r"),
      expr("""transform(sequence(0, 63), i ->
               CASE WHEN ascii(substr(md5(concat(cast(i AS STRING), ':',
                                  cast(id AS STRING))), 1, 1)) % 2 = 0
                    THEN 1L ELSE -1L END)""").as("sg"))
      .select(col("r"), expr("aggregate(sg, 0L, (a, x) -> a + CASE WHEN x > 0 THEN 1L ELSE 0L END)").as("plus"))
      .collect()
    signs.foreach { row =>
      val plus = row.getLong(1)
      assert(plus >= 16 && plus <= 48, s"dim ${row.getLong(0)} has $plus/64 +1s — degenerate")
    }
  }

  test("projected distances preserve geometry within JL distortion on sampled pairs") {
    // 16 dims preserve squared distances in expectation (E||Px||² = d·||x||²
    // for ±1 entries); per-pair distortion at k=16 is loose, so assert the
    // MEDIAN ratio over 50 pairs sits well inside an order of magnitude.
    val emb = graft.Tables.embeddings(spark, sf).filter(col("vec_id") < 20)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val proj = SparkEntry.queries("emb6_random_projection")(spark, sf)
      .filter(col("vec_id") < 20)
      .groupBy("vec_id").agg(sort_array(collect_list(struct(col("r"), col("proj_micro")))).as("p"))
      .select(col("vec_id"), expr("transform(p, t -> CAST(t.proj_micro AS DOUBLE) / 1e6)").as("p"))
    val pairs = emb.join(proj, "vec_id").as("a")
      .crossJoin(emb.join(proj, "vec_id").withColumnRenamed("vec_id", "vid2")
        .withColumnRenamed("v", "v2").withColumnRenamed("p", "p2").as("b"))
      .filter(col("vec_id") < col("vid2"))
      .select(
        expr("aggregate(zip_with(v, v2, (x, y) -> (x - y) * (x - y)), 0D, (a, t) -> a + t)").as("d64"),
        expr("aggregate(zip_with(p, p2, (x, y) -> (x - y) * (x - y)), 0D, (a, t) -> a + t)").as("d16"))
      .collect()
    assert(pairs.length >= 50)
    val ratios = pairs.map(r => r.getDouble(1) / 64.0 / r.getDouble(0)).sorted
    val median = ratios(ratios.length / 2)
    assert(median > 0.1 && median < 10.0,
      s"median distortion $median — projection does not preserve geometry")
  }

  test("plan: sign table broadcasts; corpus reaches the projection without an exchange") {
    val df = SparkEntry.queries("emb6_random_projection")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"sign table not broadcast:\n$p")
    // the only Exchange should belong to the final global ORDER BY — the
    // crossJoin+fold itself must not shuffle the corpus
    val beforeSort = p.split("Sort \\[vec_id").head
    assert(!beforeSort.contains("Exchange hashpartitioning"),
      s"corpus shuffles before projection:\n$p")
  }
}
