package graft.ads

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-backed insights source (reference `main.py:262-342`,
  * `backfill.py:49-119`). The environment is zero-egress, so the remote API
  * is modeled as JSON-lines files — one `account_<id>.jsonl` per ad account —
  * read with the declared nested schema (no inference: the API contract is
  * the schema).
  *
  * Semantics carried over from the reference:
  *  - per-account failure isolation (`main.py:471-498`): a missing/broken
  *    account is recorded and skipped; only if ALL accounts fail does the
  *    read raise;
  *  - explicit ingest order: (account list position, ingest_idx within the
  *    account's page stream) — the deterministic replacement for the
  *    reference's Python arrival order;
  *  - optional date-range options (`backfill.py:82-83`) applied as a
  *    pushed-down filter (Catalyst collapses it into the scan).
  *
  * Scale: one file per account here; at 100 TB this is the same code over a
  * partitioned landing zone (`.../account=<id>/date=<d>/` jsonl files), where the
  * account/date predicates become partition pruning.
  */
object InsightsSource {

  final case class ReadResult(data: DataFrame, failedAccounts: Seq[(String, String)])

  def read(
      spark: SparkSession,
      fixtureDir: String,
      accounts: Seq[String],
      dateStart: Option[String] = None,
      dateStop: Option[String] = None): ReadResult = {
    require(accounts.nonEmpty, "at least one account required")
    val attempts = accounts.zipWithIndex.map { case (acct, idx) =>
      acct -> Try {
        val df = spark.read.schema(AdSchema.rawSchema)
          .json(s"$fixtureDir/account_$acct.jsonl")
        // Invalid path surfaces lazily in some layouts; force file check now.
        require(new java.io.File(s"$fixtureDir/account_$acct.jsonl").exists(),
          s"fixture for account $acct not found")
        df.withColumn("account_id", lit(acct))
          .withColumn("account_idx", lit(idx))
      }
    }
    val failures = attempts.collect { case (a, Failure(e)) => a -> e.getMessage }
    val oks = attempts.collect { case (_, Success(df)) => df }
    if (oks.isEmpty)
      throw new IllegalStateException(
        s"all ${accounts.size} accounts failed: ${failures.map(_._1).mkString(", ")}")
    val unioned = oks.reduce(_ unionByName _)
    val ranged = (dateStart, dateStop) match {
      case (Some(s0), Some(s1)) => unioned.filter(col("date_start").between(s0, s1))
      case (Some(s0), None)     => unioned.filter(col("date_start") >= s0)
      case (None, Some(s1))     => unioned.filter(col("date_start") <= s1)
      case _                    => unioned
    }
    ReadResult(ranged, failures)
  }

  /** DataSource V2 path (graft.sources.InsightsV2Source): one partition per
    * account on executors, with column pruning and date-filter pushdown into
    * the reader. Same rows as [[read]]; this is the form that scales past
    * driver memory. Date predicates are plain filters here — Catalyst pushes
    * them into the source (see InsightsV2SourceSpec's plan assertion).
    */
  def readV2(
      spark: SparkSession,
      fixtureDir: String,
      accounts: Seq[String],
      dateStart: Option[String] = None,
      dateStop: Option[String] = None): DataFrame = {
    val df = spark.read.format("graft.sources.InsightsV2Source")
      .option("path", fixtureDir)
      .option("accounts", accounts.mkString(","))
      .load()
    val ranged = (dateStart, dateStop) match {
      case (Some(s0), Some(s1)) => df.filter(col("date_start").between(s0, s1))
      case (Some(s0), None)     => df.filter(col("date_start") >= s0)
      case (None, Some(s1))     => df.filter(col("date_start") <= s1)
      case _                    => df
    }
    ranged
  }
}
