package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with a typed metadata struct, processed in partition-sized
  * batches.
  *
  * The decode step is a STUB — this container has no image/audio codecs, so
  * `decodeBatch` produces a deterministic fake feature vector from the raw
  * bytes. Everything around it is the real Spark shape a 100 TB media
  * pipeline needs:
  *
  *  - payloads stay `BinaryType` end-to-end (never stringified);
  *  - metadata travels as a typed struct column next to the bytes;
  *  - decode runs via `mapPartitions` so each task amortizes codec init
  *    across its whole partition (the Scala analogue of `mapInPandas`
  *    batching) and the cluster parallelism is the partition count;
  *  - frame sampling is a generator (`posexplode`) so Catalyst can prune /
  *    push filters below it.
  */
object Multimodal {

  /** Schema of the decode output — what a real codec would emit. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType),
    StructField("features", ArrayType(DoubleType))))

  /** Attach a fake media payload + typed metadata to each document: the
    * UTF-8 bytes of `text` stand in for image bytes. The metadata struct is
    * derived deterministically from the payload size (a real pipeline reads
    * it from the container header). */
  def withMedia(docs: DataFrame): DataFrame =
    docs
      .withColumn("media", col("text").cast("binary"))
      .withColumn("meta", struct(
        lit("fake/raw").as("format"),
        (lit(16) * (lit(1) + pmod(length(col("media")), lit(13)))).as("width"),
        (lit(16) * (lit(1) + pmod(length(col("media")), lit(7)))).as("height"),
        length(col("media")).cast("long").as("n_bytes")))

  /** STUB decode: ??? in a real deployment (codec over `media` bytes).
    * Here: a deterministic 4-bucket byte histogram so tests can assert
    * shape + determinism. Runs per-partition so codec init (the expensive
    * part in real decoders) happens once per task, not once per row. */
  def decodeBatch(withMediaDf: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    withMediaDf
      .select(col("doc_id"), col("media"), col("meta.width"), col("meta.height"))
      .mapPartitions { rows =>
        // real pipeline: val codec = Codec.init()  // once per partition
        rows.map { r =>
          val docId = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val hist = new Array[Double](4)
          bytes.foreach(b => hist((b & 0xff) / 64) += 1.0)
          val n = math.max(bytes.length, 1).toDouble
          Row(docId, r.getInt(2), r.getInt(3), bytes.length.toLong, hist.map(_ / n).toSeq)
        }
      }(enc)
  }

  /** Frame sampling: slice the payload into fixed-size frames (256 bytes
    * stands in for a video GOP / audio window) and explode — a generator,
    * not a collect, so it distributes. */
  def frameSample(withMediaDf: DataFrame, frameBytes: Int = 256): DataFrame =
    withMediaDf
      .withColumn("n_frames",
        ceil(length(col("media")) / lit(frameBytes.toDouble)).cast("int"))
      // guard n_frames=0: Spark's sequence(0, -1) yields [0, -1] (it infers
      // a descending step), which would emit two phantom frames for an
      // empty payload — an empty payload must produce zero frames.
      .select(col("doc_id"), col("media"),
        posexplode(expr(
          s"""CASE WHEN n_frames <= 0 THEN array()
             |ELSE transform(sequence(0, n_frames - 1),
             |       i -> substring(media, i * $frameBytes + 1, $frameBytes)) END""".stripMargin)))
      .select(col("doc_id"), col("pos").as("frame_idx"), col("col").as("frame"))
}
