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
    },

    // ── MM2: frame sampling over video-like payloads — fixed-size chunks of
    // the (base64) payload, keeping every stride-th frame. Runs through
    // graft.multimodal.MediaPipeline.frameSample (pure column ops, no UDF);
    // the oracle chunks with a constant range + substr (DuckDB's RE2 has no
    // \G boundary split).
    Q("mm2_frame_sample",
      """WITH m AS (SELECT doc_id AS media_id, base64(encode(text)) AS b64 FROM documents),
        |c AS (SELECT media_id, CAST(r.range AS INT) AS frame_no,
        |             substr(b64, r.range * 64 + 1, 64) AS frame
        |      FROM m, range(2048) r WHERE r.range * 64 < length(b64))
        |SELECT media_id, frame_no, frame FROM c WHERE frame_no % 4 = 0
        |ORDER BY media_id, frame_no""".stripMargin) { (s, d) =>
      graft.multimodal.MediaPipeline.frameSample(
        graft.multimodal.MediaPipeline.toMediaTable(Tables.documents(s, d)),
        frameBytes = 64, stride = 4)
        .orderBy("media_id", "frame_no")
    }
  )
}
