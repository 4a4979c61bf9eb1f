package graft

import graft.queries.TextQueries

/** dd10's line-level boilerplate removal: a hand fixture where one 8-word
  * line recurs across >= 3 docs (removed everywhere) and another recurs in
  * only 2 (kept), with the reconstruction digest checked against md5 of the
  * expected kept text — including the all-removed (empty) and trailing
  * partial-line cases.
  */
class LineDedupSpec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("strips lines shared by >=3 docs, keeps rarer lines, digests reconstruction") {
    import spark.implicits._
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"     // in docs 1,2,3,7 -> removed
    val shared2 = "s1 s2 s3 s4 s5 s6 s7 s8"    // in docs 4,5 only -> kept
    val u = (i: Int) => s"u${i}1 u${i}2 u${i}3 u${i}4 u${i}5 u${i}6 u${i}7 u${i}8"
    val docs = Seq(
      (1L, s"$boiler ${u(1)}"),
      (2L, s"$boiler ${u(2)}"),
      (3L, s"${u(3)} $boiler"),
      (4L, s"${u(4)} $shared2"),
      (5L, s"$shared2 ${u(5)}"),
      (6L, s"${u(6)} w1 w2"),                  // trailing partial line "w1 w2"
      (7L, boiler)                             // fully removed -> md5("")
    ).toDF("doc_id", "text")

    val out = TextQueries.lineDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

    assert(out(1L) == ((2L, 1L, md5Hex(u(1)))), s"doc1: ${out(1L)}")
    assert(out(3L) == ((2L, 1L, md5Hex(u(3)))), "position of the boiler line must not matter")
    assert(out(4L) == ((2L, 0L, md5Hex(s"${u(4)}\n$shared2"))),
      "a line in only 2 docs stays; kept text reconstructs in line order")
    assert(out(6L) == ((2L, 0L, md5Hex(s"${u(6)}\nw1 w2"))),
      "trailing <8-word window is its own line")
    assert(out(7L) == ((1L, 1L, md5Hex(""))), "fully-boilerplate doc digests empty")
  }

  test("dd10 on testdata is deterministic across runs") {
    val sf = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("dd10_line_dedup")(spark, sf)
    val b = SparkEntry.queries("dd10_line_dedup")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
