package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with a typed metadata struct, processed in partition-sized
  * batches.
  *
  * Decode comes in two flavors: [[decodeImageBatch]] REALLY decodes the
  * container formats the JVM ships pure-Java codecs for (PNG/BMP/GIF/JPEG
  * via javax.imageio — no native libraries), and [[decodeBatch]] is the
  * deterministic stub for formats this container has no codec for (video,
  * audio); decodeImageBatch degrades to the stub per row and tags which
  * path ran. Everything around the codec is the real Spark shape a 100 TB
  * media pipeline needs:
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

  /** STUB decode for formats with no codec in this container (video — for
    * images use [[decodeImageBatch]], for WAV audio [[decodeAudioBatch]],
    * which really decode): a deterministic 4-bucket byte histogram so
    * tests can assert shape + determinism. The histogram runs as the
    * native codegen'd `byte_hist` expression — the whole decode-stub
    * projection stays inside one whole-stage-codegen span, where the old
    * per-partition closure fenced it off (the mapPartitions-as-codec-init
    * pattern lives on in [[decodeImageBatch]], which has a real codec to
    * amortize). */
  def decodeBatch(withMediaDf: DataFrame): DataFrame = {
    graft.functions.VectorExprs.register(withMediaDf.sparkSession)
    withMediaDf
      .select(col("doc_id"), col("meta.width").as("width"),
        col("meta.height").as("height"),
        length(col("media")).cast("long").as("n_bytes"),
        expr("transform(byte_hist(media, 4), " +
          "x -> x / cast(greatest(length(media), 1) as double))").as("features"))
      .to(decodedSchema)
  }

  /** [[decodedSchema]] plus which decode path ran ("imageio" | "stub"). */
  val decodedImageSchema: StructType =
    StructType(decodedSchema.fields :+ StructField("decoder", StringType))

  /** REAL image decode, pure JVM: javax.imageio reads PNG/BMP/GIF/JPEG
    * without native codecs. Width/height/features come from the decoded
    * pixels (4-bucket luminance histogram — integer math, deterministic);
    * payloads ImageIO cannot read (no codec in this container: video,
    * audio, raw text fixtures) fall back to the stub byte histogram so a
    * format gap degrades instead of failing the pipeline, with `decoder`
    * recording which path ran. Per-partition like the stub: ImageIO's
    * reader registry lookup is amortized across each task's rows. */
  def decodeImageBatch(withMediaDf: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedImageSchema)
    withMediaDf
      .select(col("doc_id"), col("media"), col("meta.width"), col("meta.height"))
      .mapPartitions { rows =>
        rows.map { r =>
          val docId = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            // NonFatal only: swallowing OutOfMemoryError (decompression
            // bombs) or InterruptedException into the stub fallback would
            // mask executor memory corruption and break task cancellation
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img != null) {
            val (w, h) = (img.getWidth, img.getHeight)
            val hist = new Array[Double](4)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
                hist(lum / 64) += 1.0
                x += 1
              }
              y += 1
            }
            // long product: a 50k x 50k scan would overflow Int
            val n = math.max(w.toLong * h, 1L).toDouble
            Row(docId, w, h, bytes.length.toLong, hist.map(_ / n).toSeq, "imageio")
          } else {
            val hist = new Array[Double](4)
            bytes.foreach(b => hist((b & 0xff) / 64) += 1.0)
            val n = math.max(bytes.length, 1).toDouble
            Row(docId, r.getInt(2), r.getInt(3), bytes.length.toLong,
              hist.map(_ / n).toSeq, "stub")
          }
        }
      }(enc)
  }

  /** Schema of [[decodeAudioBatch]]'s output: container metadata a real
    * audio pipeline reads from the header, plus the decoded PCM payload
    * that feeds the [[audioWindows]]/VAD/energy chain. */
  val decodedAudioSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_us", LongType),
    StructField("pcm", BinaryType),
    StructField("decoder", StringType)))

  /** REAL audio decode, pure JVM: javax.sound.sampled reads WAV/AIFF/AU
    * containers without native codecs (the same pattern
    * [[decodeImageBatch]] proved for images). Sample rate / channels /
    * frame count come from the decoded stream; `pcm` is the raw decoded
    * sample payload, which feeds the existing [[audioWindows]] → VAD →
    * `byte_sum` energy chain unchanged (rename `pcm` to `media`).
    * Payloads the JVM has no codec for (compressed audio, video, text
    * fixtures) degrade to the stub — the bytes pass through as "pcm" at a
    * nominal 8 kHz mono so the downstream windowing shape still runs —
    * with `decoder` recording which path ran. Per-partition mapPartitions
    * like the image decoder: codec/registry init amortizes across each
    * task's rows, the real shape of a media pipeline's decode stage. */
  def decodeAudioBatch(withMediaDf: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedAudioSchema)
    withMediaDf
      .select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          val docId = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          // NonFatal only, like the image path: OOM/interrupt must surface
          val decoded =
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              try {
                val fmt = ais.getFormat
                val pcm = ais.readAllBytes()
                val frames =
                  if (ais.getFrameLength >= 0) ais.getFrameLength
                  else pcm.length.toLong / math.max(1, fmt.getFrameSize)
                Some((math.round(fmt.getSampleRate), fmt.getChannels, frames, pcm))
              } finally ais.close()
            } catch { case scala.util.control.NonFatal(_) => None }
          decoded match {
            case Some((rate, ch, frames, pcm)) =>
              Row(docId, rate, ch, frames,
                frames * 1000000L / math.max(1, rate), pcm, "javasound")
            case None =>
              Row(docId, 8000, 1, bytes.length.toLong,
                bytes.length.toLong * 1000000L / 8000L, bytes, "stub")
          }
        }
      }(enc)
  }

  /** Schema of [[embedBatch]]'s output: the media-derived exact-integer
    * embedding the dedup/ANN spine consumes. */
  val embeddedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("qv", ArrayType(LongType))))

  /** Media → embedding feature extraction: a 64-bucket byte-count
    * histogram over the payload, as EXACT integers — the vision/audio
    * encoder stand-in that lets media columns ride the engine's
    * embedding convention (integer `qv`, native long_dot, one IEEE
    * division at the cosine) with no quantization step and therefore
    * bit-identical cross-engine parity. The histogram is the native
    * codegen'd `byte_hist` expression, so embedding extraction fuses
    * into the surrounding stage (a REAL encoder would instead amortize
    * model init per partition — [[decodeImageBatch]] keeps that shape);
    * downstream the vectors flow into the SAME semantic-dedup / IVF
    * machinery the text corpus uses — see `mm_embed_dup`/`mm_ann_probe`. */
  def embedBatch(withMediaDf: DataFrame): DataFrame = {
    graft.functions.VectorExprs.register(withMediaDf.sparkSession)
    withMediaDf
      .select(col("doc_id"), expr("byte_hist(media, 64)").as("qv"))
      .to(embeddedSchema)
  }

  /** Audio-shaped OVERLAPPING windowing: fixed-size windows every `hop`
    * bytes (hop < window — the STFT/VAD frame shape, vs
    * [[frameSample]]'s disjoint slices), as a generator so it
    * distributes and Catalyst can prune below it. Windows start at
    * i·hop for every start inside the payload; the tail windows run
    * short (substring semantics), matching how a streaming featurizer
    * pads or drops the last frames downstream. */
  def audioWindows(withMediaDf: DataFrame, windowBytes: Int = 400,
      hopBytes: Int = 160): DataFrame =
    withMediaDf
      .withColumn("n_win",
        ceil(length(col("media")) / lit(hopBytes.toDouble)).cast("int"))
      // same n<=0 guard as frameSample: sequence(0,-1) counts DOWN
      .select(col("doc_id"), col("media"),
        posexplode(expr(
          s"""CASE WHEN n_win <= 0 THEN array()
             |ELSE transform(sequence(0, n_win - 1),
             |       i -> substring(media, i * $hopBytes + 1, $windowBytes)) END""".stripMargin)))
      .select(col("doc_id"), col("pos").as("win_idx"), col("col").as("window"))

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
