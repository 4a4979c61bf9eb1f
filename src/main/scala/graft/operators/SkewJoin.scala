package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join split handles sort-merge skew at runtime; salting is the
  * explicit, planner-independent form for the pathological case — a handful
  * of keys holding a large share of the big side (hot users, null-ish
  * defaults, head words). The big side gets a deterministic per-row salt in
  * [0, salts); the small side is replicated once per salt value; the join
  * key becomes (key, salt), spreading each hot key over `salts` reducers.
  *
  * Cost model: small side is duplicated `salts` times — use for big⋈small
  * where small × salts still fits a broadcast or a modest shuffle. The salt
  * is `pmod(hash(key, uniform per-row counter), salts)` so the result is
  * reproducible (no rand()).
  */
object SkewJoin {

  def saltedEquiJoin(
      big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    // deterministic per-row spreading: hash of the whole row modulo salts
    val bigSalted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toSeq: _*), lit(salts)))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }
}
