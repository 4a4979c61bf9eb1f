package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed upsert (CDC merge): `updates` wins on key collision, all other
  * `base` rows are kept. This is the relational core of the reference's
  * idempotent daily re-run — `WRITE_TRUNCATE` per partition means "replace
  * today's rows, keep history" (reference `main.py:359-366`) — expressed
  * engine-side so it also covers the general out-of-order-key case.
  *
  * Scale design (100 TB): both sides shuffle once on the merge key
  * (`left_anti` is a hash join), so cost is one co-partitioned join plus a
  * union — no driver state. On a partitioned lake table you'd additionally
  * prune `base` to the partitions present in `updates` (dynamic partition
  * overwrite); Spark-on-parquet has no transactional MERGE INTO, so
  * anti-join + union IS the canonical implementation (it's what Delta/Iceberg
  * compile a full-table MERGE down to). If `updates` is a small CDC batch it
  * broadcasts and `base` never shuffles at all.
  */
object Merge {

  /** `updates ∪ (base ⟕̸ updates)` by `keys`; schemas must match by name. */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    updates.unionByName(base.join(updates.select(keys.map(col): _*), keys, "left_anti"))
}
