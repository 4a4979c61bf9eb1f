package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {

  // own session: needs a warehouse dir for managed bucketed tables
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("BucketingSpec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("same-key bucketed tables join without any Exchange") {
    // getOrCreate may reuse another suite's session (different warehouse
    // dir), and stale table LOCATIONS survive JVM restarts while the
    // in-memory catalog forgets them — drop both
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      Seq("/root/repo/spark-warehouse", "/root/repo/target/spark-warehouse")
        .foreach(w => org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"$w/$t")))
    }
    // runtime conf: the builder config is ignored when a session is reused
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_bucketed", "l_orderkey", 8)

    val joined = Bucketing.bucketedJoin(spark, "li_bucketed", "o_bucketed", "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"unexpected join strategy:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

    // and it returns the same result as the plain join
    val expected = li.join(o, "l_orderkey").count()
    assert(joined.count() == expected)
  }
}
