package graft

import graft.functions.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: BinaryType payloads + typed metadata survive the
  * pipeline, the mapPartitions decode stub is deterministic and
  * batch-shaped, and frame sampling reassembles losslessly. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.withMedia(
    spark.read.parquet(s"$sf/documents.parquet"))

  test("withMedia produces binary payloads with consistent typed metadata") {
    val row = media.select(col("media"), col("meta.n_bytes"), length(col("media")))
      .as[(Array[Byte], Long, Int)].head()
    assert(row._1.length == row._2 && row._2 == row._3.toLong)
    val schema = media.schema("media").dataType.typeName
    assert(schema == "binary")
  }

  test("decodeBatch is deterministic, schema-stable, and feature-normalized") {
    val out1 = Multimodal.decodeBatch(media)
    assert(out1.schema == Multimodal.decodedSchema)
    val a = out1.orderBy("doc_id").as[(Long, Int, Int, Long, Seq[Double])].head(5)
    val b = Multimodal.decodeBatch(media).orderBy("doc_id")
      .as[(Long, Int, Int, Long, Seq[Double])].head(5)
    assert(a.sameElements(b))
    // histogram over 4 buckets sums to ~1
    a.foreach { r => assert(math.abs(r._5.sum - 1.0) < 1e-9) }
  }

  test("frameSample emits zero frames for an empty payload") {
    import org.apache.spark.sql.functions.lit
    val empty = Multimodal.withMedia(
      Seq((99L, "")).toDF("doc_id", "text").withColumn("lang", lit("en")))
    assert(Multimodal.frameSample(empty, 256).count() == 0)
  }

  test("frameSample reassembles to the original payload") {
    val frames = Multimodal.frameSample(media, 256)
    val rebuilt = frames
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("frame_idx"), col("frame")))).as("fs"))
      .select(col("doc_id"),
        expr("reduce(fs, cast('' as binary), (acc, f) -> concat(acc, f.frame))").as("rb"))
    val diff = rebuilt
      .join(media.select(col("doc_id"), col("media")), "doc_id")
      .filter(col("rb") =!= col("media"))
      .count()
    assert(diff == 0)
  }
}
