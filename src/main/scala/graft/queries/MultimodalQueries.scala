package graft.queries

import graft.core.Graft
import graft.functions.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked faces of the multimodal plumbing ([[graft.functions.Multimodal]]):
  * the payload bytes here are the UTF-8 text (ASCII), so DuckDB can verify
  * the binary-side arithmetic (lengths, frame counts, md5-of-slice) against
  * Spark's genuine BinaryType processing.
  */
object MultimodalQueries {

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.withMedia(Graft.table(s, dir, "documents"))

  val all: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------ MM-1
    // Typed metadata over opaque payloads: the struct a real pipeline reads
    // from container headers, verified via its deterministic derivation.
    QueryDef("mm_metadata",
      """SELECT doc_id, 'fake/raw' AS format,
        |  16 * (1 + length(text) % 13) AS width,
        |  16 * (1 + length(text) % 7) AS height,
        |  length(text) AS n_bytes
        |FROM documents""".stripMargin) { (s, dir) =>
      media(s, dir).select(
        col("doc_id"),
        col("meta.format").as("format"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("meta.n_bytes").as("n_bytes"))
    },

    // ------------------------------------------------------------------ MM-2
    // Frame sampling over real BinaryType slices: Spark slices the payload
    // with substring-on-binary and hashes each frame; the oracle recomputes
    // the same frames from the (ASCII) text side. Row count, per-frame
    // length, and md5 must all agree.
    QueryDef("mm_frame_sample",
      """SELECT doc_id,
        |  CAST(i AS INT) AS frame_idx,
        |  length(substr(text, CAST(i * 256 + 1 AS INT), 256)) AS frame_len,
        |  md5(substr(text, CAST(i * 256 + 1 AS INT), 256)) AS frame_md5
        |FROM documents, unnest(range(0, CAST(ceil(length(text) / 256.0) AS BIGINT))) AS t(i)""".stripMargin) { (s, dir) =>
      Multimodal.frameSample(media(s, dir), 256)
        .select(col("doc_id"), col("frame_idx"),
          length(col("frame")).as("frame_len"),
          md5(col("frame")).as("frame_md5"))
    }
  )
}
