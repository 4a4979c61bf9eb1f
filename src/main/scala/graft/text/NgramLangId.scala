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

  /** (doc_id, lang_pred, score) per document.
    *
    * A document's score for a language is the number of that language's
    * DISTINCT profile trigrams present in the text — and "distinct trigram
    * of t contains tri" is exactly "t contains tri", so the whole scoring
    * is |profiles| codegen'd substring searches PER ROW: no trigram
    * explode (the former plan generated every trigram of every document —
    * len(t) rows per doc — to keep ~2% of them), no distinct shuffle, no
    * profile join, no per-doc window. Zero exchanges at any corpus size;
    * the argmax over the (4-entry) language domain folds in-row with the
    * same (score desc, lang asc) total order, 0 hits → 'und'.
    */
  def predict(spark: SparkSession, docs: DataFrame): DataFrame = {
    val langs = profiles.map(_._1).distinct.sorted
    val t = lower(col("text"))
    def score(lang: String) =
      profiles.filter(_._1 == lang).map(_._2).distinct
        .map(tri => when(t.contains(tri), 1L).otherwise(0L))
        .reduce(_ + _)
    // fold langs ALPHABETICALLY, replacing only on strictly-greater score:
    // ties keep the earlier (smaller) lang — the window's
    // (score desc, lang asc) order
    val (bestLang, bestScore) = langs.tail.foldLeft(
      (lit(langs.head), score(langs.head))) { case ((bl, bs), lang) =>
      val sc = score(lang)
      (when(sc > bs, lit(lang)).otherwise(bl), greatest(sc, bs))
    }
    docs.select(col("doc_id"),
      when(bestScore > 0L, bestLang).otherwise(lit("und")).as("lang_pred"),
      bestScore.as("score"))
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
