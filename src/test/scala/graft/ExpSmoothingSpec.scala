package graft

/** ses1's closed form must equal the literal recursion
  * S_t = (x_t + S_{t-1}) / 2 computed exactly (floor at the end only) —
  * proved here by folding the recursion in BigInt against the query's
  * output on testdata, plus the constant-series fixpoint property.
  */
class ExpSmoothingSpec extends SparkSpec {

  test("prefix-sum closed form equals the literal recursion on testdata") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("ses1_exp_smoothing")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // literal recursion carried as an exact rational with power-of-two
    // denominator: S_t = U_t / 2^(t-1), U_t = 2^(t-2)*x_t + U_{t-1}
    var u = BigInt(0)
    rows.sortBy(_._1).zipWithIndex.foreach { case ((day, cents, smoothed), i) =>
      val t = i + 1
      u += (if (t == 1) BigInt(cents) else BigInt(cents) << (t - 2))
      val expect = (u >> (t - 1)).toLong
      assert(smoothed == expect, s"$day: got $smoothed, recursion says $expect")
    }
    // smoothing lags: the smoothed series must not equal the raw series
    assert(rows.exists(r => r._2 != r._3), "EWMA should differ from raw days")
  }

  test("a constant series is a fixpoint (S_t = x for all t)") {
    // U_t for constant x: x + x*sum(2^(i-2)) = x*(1 + 2^(t-1) - 1) = x*2^(t-1)
    // so S_t = x exactly; verified via the same BigInt fold
    var u = BigInt(0)
    (1 to 40).foreach { t =>
      u += (if (t == 1) BigInt(12345) else BigInt(12345) << (t - 2))
      assert((u >> (t - 1)) == BigInt(12345), s"t=$t drifted")
    }
  }

  test("a 130-day series: exact through the t = 90 horizon, NULL past it") {
    // exercises the two paths the 30-day driver corpus never reaches:
    // the two-factor pow2 split (t - 2 > 62, i.e. t >= 65, where a single
    // long shiftleft would wrap mod 64) and the t > 90 exactness horizon
    // (decimal(38,0) headroom), which must emit NULL rather than drift
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = CacheRegistry.trackPath(
      java.nio.file.Files.createTempDirectory("ses1h").toString)
    val base = java.time.LocalDate.parse("2024-01-01")
    val rows = (0 until 130).map { i =>
      val cents = (i * 13) % 97 + 1
      (i.toLong, base.plusDays(i).toString + " 12:00:00", 1L, "purchase",
        cents / 100.0)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("ses1_exp_smoothing")(spark, dir)
      .collect().sortBy(_.getString(0))
    assert(out.length == 130)
    var u = BigInt(0)
    out.zipWithIndex.foreach { case (r, i) =>
      val t = i + 1
      val cents = r.getLong(1)
      assert(cents == (i * 13) % 97 + 1)
      u += (if (t == 1) BigInt(cents) else BigInt(cents) << (t - 2))
      if (t <= 90) {
        assert(!r.isNullAt(2), s"t=$t inside the horizon must be non-NULL")
        assert(r.getLong(2) == (u >> (t - 1)).toLong,
          s"t=$t: got ${r.getLong(2)}, recursion says ${(u >> (t - 1)).toLong}")
      } else {
        assert(r.isNullAt(2), s"t=$t past the horizon must be NULL")
      }
    }
  }

  test("a series crossing the $3.2B/day magnitude contract NULLs from the " +
      "breach onward; a day exactly AT the bound stays exact") {
    // the symmetric guard (this repo's close of ADVICE r11 item 2): days
    // with |cents| > 3.2e11 contribute 0 and poison every later row to
    // NULL on BOTH engines — the silent-divergence mode (Spark decimal
    // overflow -> NULL term silently skipped by the window sum vs DuckDB
    // HUGEINT exact-then-error) is unreachable. tools/test_ses1_horizon.py
    // replays this same fixture through the DuckDB oracle.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = CacheRegistry.trackPath(
      java.nio.file.Files.createTempDirectory("ses1b").toString)
    val bound = 320000000000L
    val centsByDay = Seq(100L, bound, 500L, bound + 100L, 700L)
    val base = java.time.LocalDate.parse("2024-01-01")
    centsByDay.zipWithIndex.map { case (c, i) =>
      (i.toLong, base.plusDays(i).toString + " 12:00:00", 1L, "purchase",
        c / 100.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("ses1_exp_smoothing")(spark, dir)
      .collect().sortBy(_.getString(0))
    assert(out.length == 5)
    var u = BigInt(0)
    out.zipWithIndex.foreach { case (r, i) =>
      val t = i + 1
      val cents = centsByDay(i)
      assert(r.getLong(1) == cents, s"t=$t cents round-trip broke")
      u += (if (t == 1) BigInt(cents) else BigInt(cents) << (t - 2))
      if (t <= 3) { // at-bound day 2 is INSIDE the contract — exact
        assert(!r.isNullAt(2) && r.getLong(2) == (u >> (t - 1)).toLong,
          s"t=$t: got $r, recursion says ${(u >> (t - 1)).toLong}")
      } else { // day 4 breaches; it and every later day must be NULL
        assert(r.isNullAt(2), s"t=$t past the magnitude breach must be NULL")
      }
    }
  }

  test("ses1 on testdata is deterministic across runs") {
    val sf = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("ses1_exp_smoothing")(spark, sf)
    val b = SparkEntry.queries("ses1_exp_smoothing")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
