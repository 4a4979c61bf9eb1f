package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata beside them. The decode/feature-extract stage
  * itself is stubbed deterministically (no media codecs in this environment —
  * see graft.multimodal.MediaPipeline), but the Spark-side schema, batching
  * and partitioning are real. Here the oracle-checkable slice: binary
  * payload length + fixed-size chunking metadata, as a storage planner for
  * blob columns would compute.
  */
object MultimodalQueries {

  def all: Seq[Q] = Seq(
    Q("mm1_binary_meta",
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |       CAST(ceil(octet_length(encode(text)) / 1024.0) AS BIGINT) AS n_chunks
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .select(col("doc_id"), octet_length(col("payload")).as("n_bytes"))
        .withColumn("n_chunks", ceil(col("n_bytes") / 1024.0).cast("long"))
        .orderBy("doc_id")
    }
  )
}
