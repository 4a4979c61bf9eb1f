package graft.plans

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("custom physical as-of join matches the window-based formulation") {
    val events = Tables.events(spark, sf)
    val orders = Tables.orders(spark, sf)
    val custom = AsOfJoin(events, orders,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate",
      rightTieBreak = Seq("o_orderkey"))
      .select($"event_id", $"o_orderkey".as("asof_okey"))
    val reference = graft.queries.RelationalQueries.all
      .find(_.name == "j6b_asof_window").get.run(spark, sf)
    assert(custom.count() == reference.count())
    assert(custom.collect().toSet == reference.collect().toSet)
  }

  test("plan contains the custom exec with co-partitioned sorted children") {
    val events = Tables.events(spark, sf)
    val orders = Tables.orders(spark, sf)
    val df = AsOfJoin(events, orders, "user_id", "o_custkey", "ts", "o_orderdate",
      Seq("o_orderkey"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), s"custom exec missing:\n$plan")
    assert(plan.contains("Sort ["), s"children not sorted:\n$plan")
    assert(plan.contains("hashpartitioning"), s"children not clustered:\n$plan")
  }

  test("left rows with no prior right row get nulls") {
    val l = Seq((1L, 10L, "a"), (2L, 5L, "b")).toDF("k", "t", "tag")
    val r = Seq((1L, 8L, 100L), (1L, 9L, 101L), (1L, 12L, 102L))
      .toDF("k", "t", "v")
      .withColumnRenamed("k", "rk").withColumnRenamed("t", "rt")
    val got = AsOfJoin(l, r, "k", "rk", "t", "rt", Seq("v"))
      .select($"k", $"tag", $"v").collect()
      .map(row => (row.getLong(0), row.getString(1),
        if (row.isNullAt(2)) -1L else row.getLong(2))).toSet
    // k=1 at t=10 → latest right at t<=10 is v=101; k=2 has no right rows
    assert(got == Set((1L, "a", 101L), (2L, "b", -1L)))
  }
}
