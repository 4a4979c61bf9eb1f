package graft

/** Cache lifecycle: a pack run (the cache-using query families) must leave
  * the session cache-clean after `TextQueries.clearCaches()` — the contract
  * a long-lived service relies on (Bench and Verify both call it in
  * teardown; this spec proves it actually drains the block manager).
  */
class CacheLifecycleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("cache-using pack leaves no persistent RDDs after clearCaches") {
    // reset first: the shared-session CacheManager would otherwise reuse a
    // cached plan (and its RDD) left by an earlier suite, making the
    // before-snapshot filter below exclude exactly the caches under test
    graft.queries.TextQueries.clearCaches()
    // suites share one JVM/SparkContext — snapshot and only judge RDDs this
    // run created
    val before = spark.sparkContext.getPersistentRDDs.keySet

    // the cache-creating families: text shingle memo (dd2/ct1), LSH band +
    // candidate scratch caches (dd3/dd4), connected-components node set
    // (dd6), iterative persist + localCheckpoints (gr1)
    Seq("dd2_ngram_jaccard", "dd3_minhash_lsh", "dd4_simhash",
      "ct1_contamination", "gr1_pagerank", "dd6_dedup_clusters").foreach { n =>
      SparkEntry.queries(n)(spark, sf).count()
    }
    // the run must actually have created caches, or the assertions below
    // pass vacuously
    assert(spark.sparkContext.getPersistentRDDs.keySet.exists(!before(_)),
      "pack run created no persistent RDDs — spec is not exercising caches")
    graft.queries.TextQueries.clearCaches()

    // explicit caches must be gone immediately
    val leaked = spark.sparkContext.getPersistentRDDs
      .filter { case (id, rdd) => !before(id) && !rdd.isCheckpointed }
    assert(leaked.isEmpty,
      s"explicit caches leaked past clearCaches: ${leaked.keys.toSeq.sorted}")

    // localCheckpoint RDDs are lineage anchors the ContextCleaner frees once
    // unreachable — force GC and wait (bounded) for it to drain them
    def checkpoints = spark.sparkContext.getPersistentRDDs
      .filter { case (id, rdd) => !before(id) && rdd.isCheckpointed }
    var tries = 0
    while (checkpoints.nonEmpty && tries < 40) {
      System.gc(); Thread.sleep(250); tries += 1
    }
    assert(checkpoints.isEmpty,
      s"localCheckpoint RDDs not drained by ContextCleaner: ${checkpoints.keys.toSeq.sorted}")
  }

  test("streaming file-sink scratch dirs are deleted by clearCaches") {
    val before = Option(new java.io.File("target/stream-sink").listFiles())
      .map(_.map(_.getName).toSet).getOrElse(Set.empty)
    // st3 drains through the parquet file sink; its output + checkpoint are
    // scratch that must not outlive the unit of work
    SparkEntry.queries("st3_stream_dedup")(spark, sf).count()
    val created = Option(new java.io.File("target/stream-sink").listFiles())
      .map(_.map(_.getName).toSet).getOrElse(Set.empty) -- before
    assert(created.nonEmpty, "file-sink drain created no scratch dir — spec is vacuous")
    graft.queries.TextQueries.clearCaches()
    val after = Option(new java.io.File("target/stream-sink").listFiles())
      .map(_.map(_.getName).toSet).getOrElse(Set.empty)
    assert(created.forall(!after(_)),
      s"sink scratch leaked past clearCaches: ${created.intersect(after)}")
  }

  test("evicting one dataset releases its memoized stages; others stay warm") {
    graft.queries.TextQueries.clearCaches()
    val dirA = sf
    val dirB = "/root/testdata/sf0.01"
    val shA = graft.queries.TextQueries.shinglesDf(spark, dirA)
    val shB = graft.queries.TextQueries.shinglesDf(spark, dirB)
    shA.count(); shB.count() // materialize both caches
    assert(shA.storageLevel.useMemory && shB.storageLevel.useMemory)

    // retire dataset A: ITS storage releases, B's cache is untouched
    CacheRegistry.evict(spark, dirA)
    assert(shA.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "evicted dataset's shingle stage still persisted")
    assert(shB.storageLevel.useMemory,
      "evict(dirA) must not touch dirB's entries")

    // the memo forgot A: the next access rebuilds a fresh cached entry
    // (correctness never depended on the memo)
    val shA2 = graft.queries.TextQueries.shinglesDf(spark, dirA)
    assert(shA2 ne shA, "evicted entry was not removed from the memo")
    assert(shA2.storageLevel.useMemory)
    graft.queries.TextQueries.clearCaches()
  }
}
