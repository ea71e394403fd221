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
    },

    // ------------------------------------------------------------------ MM-3
    // Resize + batch planning: the preprocessing DAG a vision pipeline runs
    // BEFORE the (stubbed) decode — aspect-preserving integer resize to a
    // 64px long side, then sequential greedy packing into ~65536-pixel GPU
    // batches per source (one partitioned cumulative-sum window, the
    // t_token_pack shape). All integer arithmetic: `(h * min(w,64)) div w`
    // is exact in both engines and collapses to identity when no downscale
    // is needed.
    QueryDef("mm_resize_plan",
      """WITH m AS (
        |  SELECT doc_id, source,
        |    16 * (1 + length(text) % 13) AS width,
        |    16 * (1 + length(text) % 7) AS height
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, width, height,
        |    CASE WHEN width >= height THEN LEAST(width, 64)
        |         ELSE GREATEST(1, (width * LEAST(height, 64)) // height)
        |    END AS resized_w,
        |    CASE WHEN width >= height
        |         THEN GREATEST(1, (height * LEAST(width, 64)) // width)
        |         ELSE LEAST(height, 64)
        |    END AS resized_h
        |  FROM m)
        |SELECT doc_id, source, width, height, resized_w, resized_h,
        |  CAST((SUM(resized_w * resized_h) OVER (PARTITION BY source
        |     ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    - resized_w * resized_h) // 65536 AS BIGINT) AS batch_id
        |FROM r""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val r = media(s, dir).select(
          col("doc_id"), col("source"),
          col("meta.width").as("width"), col("meta.height").as("height"))
        .withColumn("resized_w",
          when(col("width") >= col("height"), least(col("width"), lit(64)))
            .otherwise(greatest(lit(1),
              expr("(width * least(height, 64)) div height"))))
        .withColumn("resized_h",
          when(col("width") >= col("height"),
            greatest(lit(1), expr("(height * least(width, 64)) div width")))
            .otherwise(least(col("height"), lit(64))))
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val px = col("resized_w") * col("resized_h")
      r.withColumn("batch_id",
        ((sum(px).over(w) - px) / lit(65536)).cast("long"))
    }
  )
}
