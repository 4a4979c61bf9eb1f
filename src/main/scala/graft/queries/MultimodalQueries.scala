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
    },

    // ── MM3: raw-file ingestion via Spark's `binaryFile` source — the
    // entry point of an image/audio corpus pipeline (one blob per file on
    // object storage → (path, length, content) rows). A bounded slice of
    // documents is staged as one .bin file per doc (fingerprint-guarded,
    // the src1 staging contract); the read extracts the id from the
    // filename and fingerprints the payload, and the oracle pins both
    // length and md5 to the parquet truth — a reader that truncates,
    // re-encodes, or mis-associates a single payload hash-mismatches.
    // At 100 TB this source is listed/split by the driver-side file index;
    // the per-file work here (length + digest) is the real shape of a
    // media-ingest manifest builder.
    Q("mm3_binaryfile_ingest",
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |       md5(text) AS payload_md5
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val dir = stageBinaryFiles(s, d)
      s.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(dir)
        .select(
          regexp_extract(col("path"), "(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
          col("length").cast("int").as("n_bytes"),
          md5(col("content")).as("payload_md5"))
        .orderBy("doc_id")
    }
  )

  /** Stage doc_id < 100 as one binary file per doc (UTF-8 payload),
    * re-staged whenever the source parquet fingerprint changes.
    */
  private def stageBinaryFiles(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    val sf = d.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = s"/root/repo/target/binfile-stage/docs_$sf"
    val marker = new java.io.File(dir, "_STAGED")
    val fp = CorpusQueries.sourceFingerprint(s"$d/documents.parquet")
    val stale = !marker.exists() ||
      scala.io.Source.fromFile(marker).mkString.trim != fp
    if (stale) {
      new java.io.File(dir).mkdirs()
      new java.io.File(dir).listFiles().foreach(f => if (f.getName.endsWith(".bin")) f.delete())
      Tables.documents(s, d).filter(col("doc_id") < 100)
        .select("doc_id", "text").collect().foreach { r =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"${r.getLong(0)}.bin"),
          r.getString(1).getBytes("UTF-8"))
      }
      val w = new java.io.PrintWriter(marker)
      try w.print(fp) finally w.close()
    }
    dir
  }
}
