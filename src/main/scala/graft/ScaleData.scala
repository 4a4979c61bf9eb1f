package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic 10× replication of a testdata SF dir, for the scale probe
  * (BENCH_SCALE.md): `runMain graft.ScaleData [srcDir] [outDir] [reps]`.
  *
  * Replica r offsets every key space by r * (max_key + 1), so referential
  * integrity holds within each replica (orders↔lineitem↔supplier↔customer↔
  * part joins land exactly as in the base data) and key spaces never collide
  * across replicas. region/nation are shared dimensions and stay single-copy
  * (nationkey columns are not offset).
  *
  * Content columns are perturbed per replica so data DENSITIES scale the way
  * a real 10× corpus would, instead of every row gaining 9 identical twins:
  *  - documents.text is letter-rotated (codegen'd `translate`, replica 0 =
  *    identity) — token/shingle distributions keep their in-replica shape,
  *    but replicas are not near-duplicates of each other, so dedup pair
  *    density stays that of the base corpus;
  *  - embeddings.embedding is cyclically shifted by r positions (a
  *    norm-preserving permutation) so ANN neighborhoods don't become
  *    10-way exact ties.
  * Everything is a pure column function of the source rows — no rand(), so
  * the synthesized data is bit-identical across runs.
  */
object ScaleData {

  val lower = "abcdefghijklmnopqrstuvwxyz"
  val upper: String = lower.toUpperCase
  private def rot(s: String, r: Int) = s.drop(r % s.length) + s.take(r % s.length)

  /** 104 distinct letter bijections (rotation × case-swap × reversal), so
    * up to 104 replicas stay pairwise non-near-duplicate. r < 26 is the
    * plain rotation — identical to the original sf1 generation, so
    * previously measured sf1 artifacts remain reproducible bit-for-bit.
    * Distinctness + identity-at-0 are spec-gated (ScaleDataSpec).
    */
  def perm(r: Int): String = {
    val (lo, up) = (rot(lower, r % 26), rot(upper, r % 26))
    (r / 26) % 4 match {
      case 0 => lo + up
      case 1 => up + lo
      case 2 => lo.reverse + up.reverse
      case _ => up.reverse + lo.reverse
    }
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("scaledata/sf1")
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    // perm() yields 104 distinct letter bijections (26 rotations × 4
    // case/reversal variants); beyond that, replicas would silently reuse
    // letter maps and become exact near-duplicates, breaking the density
    // property ScaleDataSpec gates. Extend the bijection family before
    // raising this.
    require(reps <= 104, s"reps=$reps exceeds the 104 distinct letter bijections")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.build("graft-scaledata", cpus.toInt)
    // events.ts is parquet TIMESTAMP(NANOS) (see Tables.events): read the
    // nanos as a raw long and write them back as BIGINT — Tables.events'
    // `ts div 1000` accepts either representation
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def table(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def keySpan(t: String, c: String): Long =
      table(t).agg(max(col(c))).head().getLong(0) + 1L

    val ok = keySpan("orders", "o_orderkey")
    val ck = keySpan("customer", "c_custkey")
    val sk = keySpan("supplier", "s_suppkey")
    val pk = keySpan("part", "p_partkey")
    val dk = keySpan("documents", "doc_id")
    val vk = keySpan("embeddings", "vec_id")
    val ek = keySpan("events", "event_id")
    val uk = keySpan("events", "user_id")

    // per-replica transform of each table; offsets are (column -> span)
    def replicate(t: String, offsets: Map[String, Long],
                  perturb: (DataFrame, Int) => DataFrame = (df, _) => df,
                  parts: Int = 32): Unit = {
      val base = table(t)
      val rep = (0 until reps).map { r =>
        val shifted = offsets.foldLeft(base) { case (df, (c, span)) =>
          df.withColumn(c, col(c) + lit(r * span))
        }
        perturb(shifted, r)
      }.reduce(_ unionByName _)
      rep.repartition(parts).write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaledata] $t: ${reps}x written")
    }

    // shared dims: single copy
    Seq("region", "nation").foreach { t =>
      table(t).coalesce(1).write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaledata] $t: copied")
    }

    replicate("customer", Map("c_custkey" -> ck), parts = 8)
    replicate("supplier", Map("s_suppkey" -> sk), parts = 4)
    replicate("part", Map("p_partkey" -> pk), parts = 8)
    replicate("orders", Map("o_orderkey" -> ok, "o_custkey" -> ck))
    replicate("lineitem",
      Map("l_orderkey" -> ok, "l_partkey" -> pk, "l_suppkey" -> sk))
    replicate("events", Map("event_id" -> ek, "user_id" -> uk))
    replicate("documents", Map("doc_id" -> dk), (df, r) =>
      df.withColumn("text", translate(col("text"), lower + upper, perm(r))),
      parts = 16)
    // cyclic shift by r mod dim; sign-flip once the shifts wrap, so every
    // replica's vectors stay distinct (both transforms preserve norms)
    replicate("embeddings", Map("vec_id" -> vk), (df, r) => {
      val k = r % 64
      val sign = if ((r / 64) % 2 == 1) "-x" else "x"
      df.withColumn("embedding", expr(
        s"transform(concat(slice(embedding, ${k + 1}, size(embedding) - $k), " +
          s"slice(embedding, 1, $k)), x -> $sign)"))
    }, parts = 8)

    spark.stop()
  }
}
