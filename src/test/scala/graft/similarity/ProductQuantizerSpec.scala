package graft.similarity

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Product quantization trainer + ADC (emb3's engine): codebook shape
  * under emptied clusters, Lloyd inertia descent, partition invariance of
  * the trained encode, and ADC ranking on planted well-separated clusters.
  */
class ProductQuantizerSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("trained codebook keeps nSub x k entries (emptied clusters fall back to seed)") {
    val emb = Tables.embeddings(spark, sf)
    val books = ProductQuantizer.train(emb, "vec_id", "embedding",
      nSub = 8, subDim = 8, k = 4, iters = 2)
    val rows = books.collect()
    assert(rows.length == 32)
    assert(rows.map(r => (r.getInt(0), r.getLong(1))).toSet ==
      (for (s <- 0 until 8; c <- 0 until 4) yield (s, c.toLong)).toSet)
    rows.foreach(r => assert(r.getSeq[Double](2).length == 8))
  }

  test("Lloyd step does not increase quantization error") {
    val emb = Tables.embeddings(spark, sf)
    val subs = ProductQuantizer.subvectors(emb, "vec_id", "embedding", 8, 8)
    val b0 = ProductQuantizer.initCodebooks(emb, "vec_id", "embedding", 8, 8, 4)
    val b1 = ProductQuantizer.lloydStep(subs, "vec_id", b0)
    def err(b: org.apache.spark.sql.DataFrame) =
      ProductQuantizer.encode(subs, "vec_id", b)
        .agg(sum("dist")).head().getDouble(0)
    val (e0, e1) = (err(b0), err(b1))
    // true Lloyd inertia is monotone; 4dp distance rounding adds at most
    // 1e-4 per (vec, sub) term of slack
    assert(e1 <= e0 + 1e-4 * 500 * 8, s"inertia rose: $e0 -> $e1")
  }

  test("trained encode is invariant to input partitioning") {
    val emb = Tables.embeddings(spark, sf)
    def codes(df: org.apache.spark.sql.DataFrame) = {
      val b = ProductQuantizer.train(df, "vec_id", "embedding", 8, 8, 4, 1)
      ProductQuantizer.encode(
        ProductQuantizer.subvectors(df, "vec_id", "embedding", 8, 8),
        "vec_id", b)
        .select("vec_id", "sub", "code").orderBy("vec_id", "sub")
        .collect().toSeq
    }
    assert(codes(emb) == codes(emb.repartition(13)))
  }

  test("IVF-PQ probe masking keeps within-list candidates only (emb4's shape)") {
    // the emb4 composition invariant: with coarse lists = PQ clusters on
    // the planted corpus, a query probing its own list must see only that
    // list's members as candidates — ADC never scores an unprobed list.
    import spark.implicits._
    val protos = (0 until 4).map { p =>
      Array.tabulate(64)(i => if (i % 4 == p) 10f else 0f)
    }
    val corpus = (0 until 40).map { id =>
      (id.toLong, protos(id % 4).clone())
    }.toDF("vec_id", "embedding")
    val cents = corpus.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val coarse = KMeans.assign(corpus, "vec_id", "embedding", cents)
      .select(col("vec_id"), col("cid").as("lid"))
    val byList = coarse.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each planted vector lands in its prototype's list
    (0 until 40).foreach(id => assert(byList(id.toLong) == id % 4))
    val books = ProductQuantizer.train(corpus, "vec_id", "embedding", 8, 8, 4, 1)
    val subs = ProductQuantizer.subvectors(corpus, "vec_id", "embedding", 8, 8)
    val codes = ProductQuantizer.encode(subs, "vec_id", books)
      .select("vec_id", "sub", "code")
    // probe ONLY list 2; candidates joined through the coarse assignment
    val probe = Seq((2L, 2L)).toDF("qid", "lid")
    val qsubs = subs.filter(col("vec_id") === 2).withColumnRenamed("vec_id", "qid")
    val dtable = qsubs.join(broadcast(books), "sub")
      .select(col("qid"), col("sub"), col("cid").as("code"),
        round(KMeans.sqDist("sv", "cv") * 10000).cast("long").as("dfp"))
    val cand = codes.join(coarse, "vec_id").join(broadcast(probe), "lid")
    val nids = cand.join(broadcast(dtable), Seq("qid", "sub", "code"))
      .groupBy("qid", "vec_id").agg(sum(col("dfp")).as("adist_fp"))
      .collect().map(_.getLong(1)).toSet
    assert(nids == (0 until 40).filter(_ % 4 == 2).map(_.toLong).toSet,
      s"candidates leaked across lists: $nids")
  }

  test("ADC ranks planted clusters correctly") {
    // 4 well-separated prototypes (one-hot blocks scaled to 10), 10 copies
    // each with deterministic +-0.01 jitter; queries = the 4 prototypes.
    // After one Lloyd step each subspace codebook sits on the prototypes,
    // so ADC top-10 for query p must be exactly p's copies.
    import spark.implicits._
    val protos = (0 until 4).map { p =>
      Array.tabulate(64)(i => if (i % 4 == p) 10f else 0f)
    }
    val corpus = (0 until 40).map { id =>
      val p = id % 4
      val v = protos(p).clone()
      v(id % 64) = v(id % 64) + (if (id % 2 == 0) 0.01f else -0.01f)
      (id.toLong, v)
    }.toDF("vec_id", "embedding")
    val books = ProductQuantizer.train(corpus, "vec_id", "embedding", 8, 8, 4, 1)
    val subs = ProductQuantizer.subvectors(corpus, "vec_id", "embedding", 8, 8)
    val codes = ProductQuantizer.encode(subs, "vec_id", books)
      .select("vec_id", "sub", "code")
    val qsubs = subs.filter(col("vec_id") < 4).withColumnRenamed("vec_id", "qid")
    val top = ProductQuantizer.adcTopK(codes, books, qsubs, "qid", "vec_id", 10)
      .collect().groupBy(_.getLong(0))
    (0 until 4).foreach { p =>
      val nids = top(p.toLong).map(_.getLong(1)).toSet
      assert(nids == (0 until 40).filter(_ % 4 == p).map(_.toLong).toSet,
        s"query $p mixed clusters: $nids")
    }
  }
}
