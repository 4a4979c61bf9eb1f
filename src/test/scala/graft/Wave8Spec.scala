package graft

import org.apache.spark.sql.functions._

/** Wave-8 fixtures: a hand-computed acquisition curve (cd1), seasonal-naive
  * backtest arithmetic incl. the calendar-gap alignment (fc1), a planted
  * hot-key histogram (dq5), the join-delta merge across eras plus the
  * one-shuffle/one-broadcast plan shape (mv2), and ordered journey paths
  * with tie-breaks (pt1).
  */
class Wave8Spec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    CacheRegistry.trackPath(
      java.nio.file.Files.createTempDirectory(prefix).toString)

  private def writeOrders(dir: String, rows: Seq[(Long, Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("o_orderkey", "o_custkey", "o_orderdate")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
  }

  private def writeLineitem(dir: String,
      rows: Seq[(Long, Long, Double, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  private def writeEvents(dir: String,
      rows: Seq[(Long, String, String, Double)]): Unit = {
    import spark.implicits._
    rows.map { case (id, ts, et, v) => (id, ts, id, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  // ── cd1 ──────────────────────────────────────────────────────────────────

  test("cd1: acquisition days only, news and cumulative exact") {
    val dir = tmpDir("cd1a")
    // c1 first on d1 (returns on d3 — must NOT count again), c2+c3 on d2
    writeOrders(dir, Seq(
      (1L, 1L, "2020-01-01"), (2L, 1L, "2020-01-03"),
      (3L, 2L, "2020-01-02"), (4L, 3L, "2020-01-02")))
    val out = SparkEntry.queries("cd1_cumulative_distinct")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("2020-01-01", 1L, 1L), ("2020-01-02", 2L, 3L)), s"got $out")
  }

  test("cd1: the running window sits above the day-grain aggregate (bounded)") {
    val df = SparkEntry.queries("cd1_cumulative_distinct")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.contains("Window") && p.contains("Aggregate")
      && p.indexOf("Window") < p.indexOf("Aggregate"),
      s"window not fed by the day aggregate:\n$p")
  }

  // ── fc1 ──────────────────────────────────────────────────────────────────

  test("fc1: hand-computed MAPE and signed bias") {
    val dir = tmpDir("fc1a")
    // y(d) = 1000 + 100*d cents, d = 0..9: scored days 7,8,9 with
    // fc = y(d-7); APEs 700e6//1700, //1800, //1900 -> mape their mean;
    // bias = (3300-5400)e6 // 5400 signed negative
    writeEvents(dir, (0 to 9).map { t =>
      val date = java.time.LocalDate.of(2020, 1, 1).plusDays(t)
      (t.toLong + 1, s"$date 10:00:00", "purchase", (1000L + 100L * t) / 100.0)
    })
    val r = SparkEntry.queries("fc1_backtest_mape")(spark, dir).collect()(0)
    val apes = Seq((700000000L, 1700L), (700000000L, 1800L), (700000000L, 1900L))
      .map { case (n, d) => n / d }
    assert(r.getLong(0) == 3L, s"got $r")
    assert(r.getLong(1) == apes.sum / 3, s"got $r vs ${apes.sum / 3}")
    assert(r.getLong(2) == -(2100000000L / 5400L), s"got $r")
  }

  test("fc1: calendar alignment — a day gap does not shift the season") {
    val dir = tmpDir("fc1b")
    // days 0, 7, 8 only: day 7 scores against day 0; day 8's 7-day twin
    // (day 1) is ABSENT, so it must not score against day 0 (a ROWS-7
    // window would)
    writeEvents(dir, Seq(
      (1L, "2020-01-01 10:00:00", "purchase", 10.0),
      (2L, "2020-01-08 10:00:00", "purchase", 20.0),
      (3L, "2020-01-09 10:00:00", "purchase", 30.0)))
    val r = SparkEntry.queries("fc1_backtest_mape")(spark, dir).collect()(0)
    assert(r.getLong(0) == 1L, s"exactly one scored day: $r")
    assert(r.getLong(1) == 1000000000L / 2000L, s"ape of (2000,1000): $r")
  }

  test("fc1: no purchases guards every metric to NULL") {
    val dir = tmpDir("fc1c")
    writeEvents(dir, Seq((1L, "2020-01-01 10:00:00", "click", 1.0)))
    val r = SparkEntry.queries("fc1_backtest_mape")(spark, dir).collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2), s"got $r")
  }

  // ── dq5 ──────────────────────────────────────────────────────────────────

  test("dq5: a planted hot key is read off the freq-of-frequencies table") {
    val dir = tmpDir("dq5a")
    // key 1 x10 (hot), keys 2..10 x1, key 11 x2: n_keys 11, n_rows 21
    // ff: {1:9, 2:1, 10:1}; p50 = 1 (2*9 >= 11), p99 = 10 (first c with
    // 100*cum >= 1089); top1 = 10e6//21; ratio = 10e6//1
    val rows = (1 to 10).map(i => (i.toLong, 1L, 1.0, 0.0)) ++
      (2L to 10L).map(k => (100L + k, k, 1.0, 0.0)) ++
      Seq((200L, 11L, 1.0, 0.0), (201L, 11L, 1.0, 0.0))
    writeLineitem(dir, rows)
    val r = SparkEntry.queries("dq5_key_skew")(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == (21L, 11L, 10L, 1L, 10L), s"got $r")
    assert(r.getLong(5) == 10000000L / 21L && r.getLong(6) == 10000000L, s"got $r")
  }

  test("dq5: a uniform key distribution reads flat (ratio 1e6)") {
    val dir = tmpDir("dq5b")
    writeLineitem(dir, (1 to 8).flatMap(k =>
      Seq((k.toLong * 2, k.toLong, 1.0, 0.0), (k.toLong * 2 + 1, k.toLong, 1.0, 0.0))))
    val r = SparkEntry.queries("dq5_key_skew")(spark, dir).collect()(0)
    assert((r.getLong(3), r.getLong(4), r.getLong(6)) == (2L, 2L, 1000000L), s"got $r")
  }

  test("dq5: every window input is the freq-of-frequencies table, not the key histogram") {
    val df = SparkEntry.queries("dq5_key_skew")(spark, "/root/testdata/sf0.001")
    val docs = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val ffRows = docs.groupBy("l_partkey").count()
      .groupBy("count").count().count()
    val keys = docs.select("l_partkey").distinct().count()
    assert(ffRows < keys, s"fixture degenerate: ff ($ffRows) not smaller than keys ($keys)")
    val p = df.queryExecution.optimizedPlan.toString
    // the sandwich: terminal Aggregate ABOVE the window, ff/histogram
    // aggregates BELOW it — the window never sees the scan
    assert(p.indexOf("Window") > p.indexOf("Aggregate"),
      s"no terminal aggregate above the window:\n$p")
    assert(p.lastIndexOf("Aggregate") > p.indexOf("Window"),
      s"window not fed by the ff aggregate:\n$p")
  }

  // ── mv2 ──────────────────────────────────────────────────────────────────

  test("mv2: a customer spanning both eras merges into one exact row") {
    val dir = tmpDir("mv2a")
    // c1: order 1 (history, 2 lines) + order 2 (delta day, 1 line);
    // c2: order 3 (history, 1 line). rev_c4 = sum over cents*(100-disc)
    writeOrders(dir, Seq(
      (1L, 1L, "2020-01-01"), (2L, 1L, "2020-01-02"), (3L, 2L, "2020-01-01")))
    writeLineitem(dir, Seq(
      (1L, 1L, 10.0, 0.05), (1L, 2L, 20.0, 0.0),
      (2L, 3L, 30.0, 0.10),
      (3L, 4L, 40.0, 0.0)))
    val out = SparkEntry.queries("mv2_join_delta")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val c1 = 1000L * 95 + 2000L * 100 + 3000L * 90
    val c2 = 4000L * 100
    assert(out == Seq((1L, 3L, c1), (2L, 1L, c2)), s"got $out")
  }

  test("mv2: the delta side joins broadcast; only the base pays a shuffle join") {
    val df = SparkEntry.queries("mv2_join_delta")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    val shuffles = "(SortMergeJoin|ShuffledHashJoin)".r.findAllIn(p).size
    assert(broadcasts >= 1, s"delta join not broadcast:\n$p")
    assert(shuffles <= 1, s"more than one shuffled join:\n$p")
  }

  test("mv2: incremental result equals the full recompute") {
    val sf = "/root/testdata/sf0.001"
    val inc = SparkEntry.queries("mv2_join_delta")(spark, sf)
      .collect().map(_.toString).toSeq
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"),
      (expr("cast(round(l_extendedprice * 100) as bigint)")
        * (lit(100L) - expr("cast(round(l_discount * 100) as bigint)"))).as("r4"))
    val full = li.join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).cast("long").as("n_lines"),
        sum(col("r4").cast("decimal(38,0)")).cast("long").as("rev_c4"))
      .select(col("o_custkey").as("custkey"), col("n_lines"), col("rev_c4"))
      .orderBy("custkey").collect().map(_.toString).toSeq
    assert(inc == full, "delta rule diverged from full recompute")
  }

  // ── pt1 ──────────────────────────────────────────────────────────────────

  test("pt1: journeys truncate at 3 steps, short journeys keep their length") {
    val dir = tmpDir("pt1a")
    // explicit user ids (the shared writeEvents helper keys user = event)
    import spark.implicits._
    Seq((1L, "2020-01-01 10:00:00", 7L, "view", 0.0, "{}"),
        (2L, "2020-01-01 10:01:00", 7L, "click", 0.0, "{}"),
        (3L, "2020-01-01 10:02:00", 7L, "purchase", 0.0, "{}"),
        (4L, "2020-01-01 10:03:00", 7L, "view", 0.0, "{}"),
        (5L, "2020-01-01 10:00:00", 8L, "view", 0.0, "{}"),
        (6L, "2020-01-01 10:01:00", 8L, "click", 0.0, "{}"),
        (7L, "2020-01-01 10:00:00", 9L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("pt1_top_paths")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("view", 1L), ("view>click", 1L), ("view>click>purchase", 1L))
      .sortBy(-_._2) || out.toSet == Set(("view", 1L), ("view>click", 1L),
        ("view>click>purchase", 1L)), s"got $out")
  }

  test("pt1: simultaneous events break ties by event_id") {
    val dir = tmpDir("pt1b")
    import spark.implicits._
    Seq((2L, "2020-01-01 10:00:00", 7L, "b_second", 0.0, "{}"),
        (1L, "2020-01-01 10:00:00", 7L, "a_first", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("pt1_top_paths")(spark, dir).collect()
      .map(_.getString(0)).toSeq
    assert(out == Seq("a_first>b_second"), s"got $out")
  }
}
