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

  test("string keys and timestamp times join through interpreted orderings") {
    val l = Seq(("usr-a", "2024-03-05", 1), ("usr-b", "2024-03-05", 2),
      ("usr-a", "2024-03-01", 3)).toDF("k", "d", "eid")
      .withColumn("t", $"d".cast("timestamp"))
    val r = Seq(("usr-a", "2024-03-02", 10L), ("usr-a", "2024-03-04", 11L),
      ("usr-b", "2024-03-06", 12L)).toDF("rk", "rd", "v")
      .withColumn("rt", $"rd".cast("timestamp"))
    val got = AsOfJoin(l, r, "k", "rk", "t", "rt", Seq("v"))
      .select($"eid", $"v").collect()
      .map(row => (row.getInt(0), if (row.isNullAt(1)) -1L else row.getLong(1))).toSet
    // usr-a@03-05 → 03-04 row; usr-b@03-05 → nothing yet; usr-a@03-01 → none
    assert(got == Set((1, 11L), (2, -1L), (3, -1L)))
  }

  test("exclusive bound takes the last strictly-earlier right row") {
    val l = Seq((1L, 8L, "x"), (1L, 9L, "y")).toDF("k", "t", "tag")
    val r = Seq((1L, 8L, 100L), (1L, 5L, 99L)).toDF("rk", "rt", "v")
    def run(inc: Boolean) = AsOfJoin(l, r, "k", "rk", "t", "rt", Seq("v"),
      inclusive = inc)
      .select($"tag", $"v").collect()
      .map(row => (row.getString(0), if (row.isNullAt(1)) -1L else row.getLong(1))).toSet
    assert(run(true) == Set(("x", 100L), ("y", 100L)))   // t<=8 includes the 8 row
    assert(run(false) == Set(("x", 99L), ("y", 100L)))   // t<8 falls back to 5
  }

  test("null keys and times never match (SQL comparison semantics)") {
    val l = Seq((Option(1L), Option(10L), "a"), (None, Option(10L), "b"),
      (Option(1L), None, "c")).toDF("k", "t", "tag")
    val r = Seq((Option(1L), Option(5L), 50L), (Option(1L), None, 60L),
      (None, Option(1L), 70L)).toDF("rk", "rt", "v")
    val got = AsOfJoin(l, r, "k", "rk", "t", "rt")
      .select($"tag", $"v").collect()
      .map(row => (row.getString(0), if (row.isNullAt(1)) -1L else row.getLong(1))).toSet
    assert(got == Set(("a", 50L), ("b", -1L), ("c", -1L)))
  }
}
