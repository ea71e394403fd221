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

  test("decodeImageBatch really decodes PNG and BMP and falls back for non-images") {
    // deterministic fixtures built in-memory: an 8x4 half-black/half-white
    // PNG (luminance buckets 0 and 3, exactly 0.5 each) and a 4x4 BMP of
    // mid-gray 128 (bucket 2)
    def imageBytes(fmt: String, w: Int, h: Int, rgbAt: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgbAt(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer in the JVM")
      bos.toByteArray
    }
    val png = imageBytes("png", 8, 4, (x, _) => if (x < 4) 0x000000 else 0xffffff)
    val bmp = imageBytes("bmp", 4, 4, (_, _) => 0x808080)
    val textBytes = "not an image at all".getBytes("UTF-8")

    val df = Seq((1L, png), (2L, bmp), (3L, textBytes)).toDF("doc_id", "media")
      .withColumn("meta", struct(
        lit("mixed").as("format"), lit(0).as("width"), lit(0).as("height"),
        length(col("media")).cast("long").as("n_bytes")))
    val out = Multimodal.decodeImageBatch(df)
    assert(out.schema == Multimodal.decodedImageSchema)
    val rows = out.orderBy("doc_id")
      .as[(Long, Int, Int, Long, Seq[Double], String)].collect()

    val Array(p, b, t) = rows
    assert(p._6 == "imageio" && (p._2, p._3) == ((8, 4)))
    assert(p._5 == Seq(0.5, 0.0, 0.0, 0.5)) // black->bucket 0, white->bucket 3
    assert(b._6 == "imageio" && (b._2, b._3) == ((4, 4)))
    assert(b._5 == Seq(0.0, 0.0, 1.0, 0.0)) // gray 128 -> bucket 2
    assert(t._6 == "stub" && t._4 == textBytes.length.toLong)
    assert(math.abs(t._5.sum - 1.0) < 1e-9)
  }

  test("decodeAudioBatch really decodes WAV and feeds the windowing chain; non-audio falls back") {
    // deterministic in-memory WAV fixture: 16-bit signed LE mono 8 kHz,
    // 400 frames of a 440 Hz integer-sine — written through the SAME
    // javax.sound.sampled container writer a producer would use
    val rate = 8000
    val frames = 400
    val pcmRef = new Array[Byte](frames * 2)
    for (i <- 0 until frames) {
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * 12000).toInt.toShort
      pcmRef(2 * i) = (s & 0xff).toByte
      pcmRef(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcmRef), fmt, frames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val textBytes = "definitely not audio".getBytes("UTF-8")

    val df = Seq((1L, wav), (2L, textBytes)).toDF("doc_id", "media")
    val out = Multimodal.decodeAudioBatch(df)
    assert(out.schema == Multimodal.decodedAudioSchema)
    val rows = out.orderBy("doc_id")
      .as[(Long, Int, Int, Long, Long, Array[Byte], String)].collect()
    val Array(w, t) = rows
    assert(w._7 == "javasound", "WAV must take the real decode path")
    assert(w._2 == rate && w._3 == 1 && w._4 == frames.toLong)
    assert(w._5 == frames.toLong * 1000000L / rate)
    assert(java.util.Arrays.equals(w._6, pcmRef),
      "decoded PCM differs from the samples the container was written from")
    assert(t._7 == "stub" && t._4 == textBytes.length.toLong)

    // the decoded PCM rides the existing audio chain unchanged:
    // pcm -> audioWindows -> byte_sum energy
    graft.functions.VectorExprs.register(spark)
    val wins = Multimodal.audioWindows(
      out.select(col("doc_id"), col("pcm").as("media")),
      windowBytes = 400, hopBytes = 160)
      .withColumn("energy", expr("byte_sum(window)"))
    val wavWins = wins.filter(col("doc_id") === 1L).orderBy("win_idx")
      .as[(Long, Int, Array[Byte], Long)].collect()
    assert(wavWins.length == math.ceil(pcmRef.length / 160.0).toInt)
    assert(java.util.Arrays.equals(wavWins(0)._3, pcmRef.slice(0, 400)))
    assert(wavWins(0)._4 == pcmRef.slice(0, 400).map(b => (b & 0xff).toLong).sum)
  }

  test("audioWindows overlap by the hop and reassemble the payload prefix-exactly") {
    val out = Multimodal.audioWindows(media, windowBytes = 400, hopBytes = 160)
    val byDoc = out.select(col("doc_id"), col("win_idx"), col("window"))
      .as[(Long, Int, Array[Byte])].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val payloads = media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])].collect().toMap
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, wins) =>
      val bytes = payloads(id)
      assert(wins.length == math.ceil(bytes.length / 160.0).toInt,
        s"doc $id: window count off")
      wins.foreach { case (_, i, w) =>
        val expect = bytes.slice(i * 160, math.min(i * 160 + 400, bytes.length))
        assert(java.util.Arrays.equals(w, expect), s"doc $id window $i bytes differ")
      }
      // consecutive windows share window-hop bytes: real overlap, not slices
      wins.sliding(2).foreach {
        case Array((_, i, w1), (_, _, w2)) if w1.length == 400 =>
          assert(java.util.Arrays.equals(w1.drop(160), w2.take(240)),
            s"doc $id windows $i/${i + 1} do not overlap by hop")
        case _ => ()
      }
    }
  }

  test("media embeddings ride the ANN serving store end-to-end") {
    // embedBatch output feeds AnnStore's embedding convention directly:
    // qv is ALREADY the exact-integer vector, so quantization (floor of
    // x*1e6) must be the identity on its float image — prove the spine
    // accepts media vectors by building a store from them and probing it
    val emb = Multimodal.embedBatch(media)
      .select(col("doc_id").as("vec_id"),
        expr("transform(qv, x -> cast(x as float))").as("embedding"))
    val root = tmpDir("ann-media")
    assert(graft.pipeline.AnnStore.ensureBuilt(spark, root, emb))
    val res = graft.pipeline.AnnStore.probe(spark, root,
      emb.filter(col("vec_id") < 8), nprobe = 2, k = 5)
    assert(res.groupBy("q_id").count().filter(col("count") =!= 5).count() == 0,
      "media-vector probe did not return top-5 per query")
    // neighbors really are high-cosine byte-histogram matches
    assert(res.agg(min("cos_sim")).head.getDouble(0) > 0.5)
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
