package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Character-trigram language identification.
  *
  * Classic n-gram profile method (Cavnar-Trenkle shape, miniaturized):
  * each language carries a profile of characteristic character trigrams;
  * a document scores one point per (distinct) trigram hit per profile, and
  * the best-scoring language wins (ties broken alphabetically, zero hits →
  * 'und').
  *
  * Profiles are deliberately tiny literals so the whole computation is
  * portable: Spark explodes distinct doc trigrams and joins the broadcast
  * profile table; the oracle does the same join against a VALUES list.
  * Scale: trigram explode is a narrow map; the profile join is a broadcast
  * hash join; one shuffle for the per-(doc, lang) count.
  */
object NgramLangId {

  /** (lang, trigram) profile rows — characteristic function-word trigrams. */
  val profiles: Seq[(String, String)] = Seq(
    "en" -> " th", "en" -> "the", "en" -> "he ", "en" -> " an", "en" -> "and",
    "en" -> "ing", "en" -> " of", "en" -> "of ",
    "de" -> "der", "de" -> " de", "de" -> "ie ", "de" -> "ein", "de" -> "sch",
    "de" -> "und", "de" -> " un", "de" -> "cht",
    "es" -> " de", "es" -> "de ", "es" -> " la", "es" -> "la ", "es" -> "os ",
    "es" -> "ión", "es" -> " el", "es" -> "que",
    "fr" -> " le", "fr" -> "le ", "fr" -> "es ", "fr" -> " la", "fr" -> "ent",
    "fr" -> "eur", "fr" -> " et", "fr" -> "et ")

  /** (doc_id, lang_pred, score) per document. */
  def predict(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val profileDf = profiles.toDF("lang", "tri")
    val tris = docs
      .select(col("doc_id"), lower(col("text")).as("t"))
      // sequence(1, 0) yields a DESCENDING [1, 0] in Spark — guard short texts
      .select(col("doc_id"), explode(expr(
        "CASE WHEN length(t) >= 3 THEN " +
          "transform(sequence(1, length(t) - 2), i -> substring(t, i, 3)) " +
          "ELSE array() END")).as("tri"))
      // literal pre-filter to the profile vocabulary BEFORE the distinct:
      // the join would drop non-profile trigrams anyway, so this is
      // semantics-free and shrinks the distinct's shuffle ~50x
      .filter(col("tri").isin(profiles.map(_._2).distinct: _*))
      .distinct()
    val scores = tris.join(broadcast(profileDf), "tri")
      .groupBy("doc_id", "lang").agg(count(lit(1)).as("score"))
    // argmax with (score desc, lang asc) tie-break; unmatched docs → 'und'
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("lang"))
    val best = scores.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    docs.select(col("doc_id")).join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lang"), lit("und")).as("lang_pred"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  /** Matching DuckDB oracle. */
  def oracleSql: String = {
    val values = profiles.map { case (l, t) =>
      s"('$l', '${t.replace("'", "''")}')"
    }.mkString(", ")
    s"""WITH profile(lang, tri) AS (VALUES $values),
       |t AS (SELECT doc_id, lower(text) AS t FROM documents),
       |tris AS (SELECT DISTINCT doc_id, substr(t, r.range + 1, 3) AS tri
       |         FROM t, range(2048) r WHERE r.range < length(t) - 2),
       |scores AS (SELECT doc_id, lang, count(*) AS score
       |           FROM tris JOIN profile USING (tri) GROUP BY 1, 2),
       |best AS (SELECT doc_id, lang, score,
       |                row_number() OVER (PARTITION BY doc_id
       |                                   ORDER BY score DESC, lang) AS rn
       |         FROM scores)
       |SELECT d.doc_id, coalesce(b.lang, 'und') AS lang_pred,
       |       coalesce(b.score, 0) AS score
       |FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
       |  ON b.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }
}
