package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** JSONL ingest: exact round-trip of valid rows, quarantine of both corrupt
  * classes, and forward compatibility with unknown producer fields.
  */
class JsonlSourceSpec extends SparkSpec {

  import graft.queries.CorpusQueries.{docSchema, stageJsonl}

  private val sf = "/root/testdata/sf0.001"

  test("valid rows round-trip the parquet table exactly") {
    val dir = stageJsonl(spark, sf)
    val tagged = JsonlSource.readTagged(spark, dir, docSchema)
    val back = JsonlSource.valid(tagged, col("doc_id"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").collect().toSeq
    val truth = graft.Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").collect().toSeq
    assert(back == truth)
  }

  test("both corrupt classes quarantine; syntax-broken line kept verbatim") {
    val dir = stageJsonl(spark, sf)
    val tagged = JsonlSource.readTagged(spark, dir, docSchema)
    val bad = JsonlSource.corrupt(tagged, col("doc_id")).collect()
    assert(bad.length == 2)
    val raws = bad.map(r => Option(r.getAs[String](JsonlSource.CorruptCol)))
    // the unparseable line travels verbatim in _corrupt_record
    assert(raws.flatten.exists(_.contains("truncated line")))
    // the type-mismatch line is a partial row: doc_id null, rest recovered
    val partial = bad.find(_.isNullAt(0))
    assert(partial.isDefined, "type-mismatch row not quarantined")
  }

  test("unknown extra fields are ignored under the enforced schema") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl-extra").toString
    import spark.implicits._
    Seq("""{"doc_id": 7, "text": "t", "lang": "en", "source": "s", "n_chars": 1, "NEW_FIELD": [1,2]}""")
      .toDS().write.mode("overwrite").text(dir)
    val tagged = JsonlSource.readTagged(spark, dir, docSchema)
    val rows = JsonlSource.valid(tagged, col("doc_id")).collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 7L)
    graft.CacheRegistry.trackPath(dir): Unit
  }
}
