package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Line-delimited JSON (JSONL) source — the ingest format real training-data
  * pipelines consume (CommonCrawl derivatives, API dumps), complementing the
  * parquet and CSV (ads.Pipelines) sources.
  *
  * Scale design (100 TB of JSONL):
  *  - **Schema is ENFORCED, never inferred**: `spark.read.json` without a
  *    schema runs a full inference pass over every byte before the real
  *    read — at 100 TB that is a second full scan. Callers pass the
  *    expected StructType; unknown extra fields in the data are ignored
  *    (forward-compatible producers), missing fields read as null.
  *  - JSONL is line-splittable, so the scan parallelizes per HDFS block
  *    like any text format (one JSON *document* per file would not).
  *  - **Corrupt records quarantine per-row, never fail the job**: the
  *    PERMISSIVE reader routes any unparseable line (broken syntax, type
  *    mismatch) into `_corrupt_record` with every typed column null —
  *    the source-side twin of the CSV sink's per-row `_row_errors`
  *    validation (ads.Sinks, reference main.py's REQUIRED-field append
  *    semantics): bad rows are data to audit, not exceptions.
  */
object JsonlSource {

  val CorruptCol = "_corrupt_record"

  /** Schema-enforced read; adds [[CorruptCol]] (null ⇔ the line parsed
    * cleanly against `schema`).
    */
  def readTagged(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Quarantine predicate. Two classes route here:
    *  - unparseable lines (broken syntax): [[CorruptCol]] holds the line;
    *  - type mismatches on REQUIRED fields: Spark's partial-results JSON
    *    parsing (4.x default) recovers the rest of the row and nulls just
    *    the bad field WITHOUT tagging [[CorruptCol]] — so required-field
    *    nullness is part of the validity contract (the source-side twin of
    *    the CSV sink's REQUIRED `_row_errors` validation, ads.Sinks).
    */
  def quarantined(required: Column*): Column =
    required.foldLeft(col(CorruptCol).isNotNull)(_ || _.isNull)

  /** Rows that parsed cleanly with all required fields present. */
  def valid(tagged: DataFrame, required: Column*): DataFrame =
    tagged.filter(!quarantined(required: _*)).drop(CorruptCol)

  /** Quarantined rows: the original line verbatim (when the parser kept
    * it) plus the typed columns — kept whole so an audit sink can land
    * them as-is.
    */
  def corrupt(tagged: DataFrame, required: Column*): DataFrame =
    tagged.filter(quarantined(required: _*))
}
