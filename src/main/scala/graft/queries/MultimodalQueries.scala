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
    },

    // ------------------------------------------------------------------ MM-4
    // Audio-shaped OVERLAPPING windows (400-byte window, 160-byte hop —
    // the STFT/VAD frame shape, vs mm_frame_sample's disjoint slices):
    // Spark windows the real BinaryType payload through a generator and
    // sums per-window byte energy; the oracle re-derives the same windows
    // from the (ASCII) text. Start index, window bytes (md5), and the
    // integer energy must all agree.
    QueryDef("mm_audio_windows",
      """WITH w AS (
        |  SELECT doc_id, CAST(i AS INT) AS win_idx,
        |    substr(text, CAST(i * 160 + 1 AS INT), 400) AS win
        |  FROM documents,
        |    unnest(range(0, CAST(ceil(length(text) / 160.0) AS BIGINT))) AS t(i))
        |SELECT doc_id, win_idx, length(win) AS win_len, md5(win) AS win_md5,
        |  CAST(list_sum(list_transform(range(1, length(win) + 1),
        |    j -> ascii(substr(win, CAST(j AS INT), 1)))) AS BIGINT) AS energy
        |FROM w""".stripMargin) { (s, dir) =>
      graft.functions.VectorExprs.register(s)
      // energy via the native byte_sum expression: the SQL per-char form
      // (aggregate over substring(s, j, 1)) re-scans the prefix per char
      // — quadratic per window; byte_sum is one codegen'd loop over the
      // raw bytes, and equals the oracle's ascii sum on ASCII payloads
      Multimodal.audioWindows(media(s, dir), windowBytes = 400, hopBytes = 160)
        .select(col("doc_id"), col("win_idx"),
          length(col("window")).as("win_len"),
          md5(col("window")).as("win_md5"),
          expr("byte_sum(window)").as("energy"))
    },

    // ----------------------------------------------------------------- MM-5b
    // Keyframe selection by content change — the video-pipeline step
    // between frame slicing and (expensive) per-frame embedding: a frame
    // is a keyframe when its byte-energy signature moves >25% off its
    // predecessor's (integer cross-multiplied compare — exact), plus every
    // first frame. Energy rides the native codegen'd byte_sum over the
    // real BinaryType frame; the delta is one LAG per doc partition. At
    // 100 TB this is the decimation gate that keeps the embedding stage
    // O(keyframes), not O(frames); the (stubbed-decode) signature swaps
    // for a perceptual hash without touching the plan shape.
    QueryDef("mm_keyframes",
      """WITH f AS (
        |  SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |    substr(text, CAST(i * 256 + 1 AS INT), 256) AS frame
        |  FROM documents,
        |    unnest(range(0, CAST(ceil(length(text) / 256.0) AS BIGINT))) AS t(i)),
        |e AS (
        |  SELECT doc_id, frame_idx,
        |    CAST(list_sum(list_transform(range(1, length(frame) + 1),
        |      j -> ascii(substr(frame, CAST(j AS INT), 1)))) AS BIGINT) AS energy
        |  FROM f),
        |d AS (
        |  SELECT doc_id, frame_idx, energy,
        |    lag(energy) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
        |  FROM e)
        |SELECT doc_id, frame_idx, energy,
        |  CAST(abs(energy - prev) AS BIGINT) AS delta
        |FROM d WHERE prev IS NULL OR abs(energy - prev) * 4 > prev""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      graft.functions.VectorExprs.register(s)
      val w = Window.partitionBy("doc_id").orderBy("frame_idx")
      Multimodal.frameSample(media(s, dir), 256)
        .withColumn("energy", expr("byte_sum(frame)"))
        .withColumn("prev", lag("energy", 1).over(w))
        .filter(col("prev").isNull ||
          abs(col("energy") - col("prev")) * 4 > col("prev"))
        .select(col("doc_id"), col("frame_idx"), col("energy"),
          abs(col("energy") - col("prev")).cast("long").as("delta"))
    },

    // ------------------------------------------------------------------ MM-6
    // VAD-shaped segmentation over the audio windows: threshold the
    // per-window mean byte energy (integer compare — exact), then
    // collapse consecutive active windows into segments with the classic
    // gaps-and-islands idiom (win_idx − ROW_NUMBER over (doc, active) is
    // constant within each run). The speech-segmenter shape a real audio
    // pipeline runs between windowing and transcription, as one window
    // pass + one aggregation — no self-join, no iteration.
    QueryDef("mm_vad_segments",
      """WITH w AS (
        |  SELECT doc_id, CAST(i AS INT) AS win_idx,
        |    substr(text, CAST(i * 160 + 1 AS INT), 400) AS win
        |  FROM documents,
        |    unnest(range(0, CAST(ceil(length(text) / 160.0) AS BIGINT))) AS t(i)),
        |e AS (
        |  SELECT doc_id, win_idx,
        |    CAST(list_sum(list_transform(range(1, length(win) + 1),
        |      j -> ascii(substr(win, CAST(j AS INT), 1)))) AS BIGINT) AS energy,
        |    length(win) AS win_len
        |  FROM w),
        |a AS (SELECT doc_id, win_idx, energy >= 95 * win_len AS active FROM e),
        |g AS (
        |  SELECT doc_id, win_idx, active,
        |    win_idx - ROW_NUMBER() OVER (PARTITION BY doc_id, active ORDER BY win_idx) AS grp
        |  FROM a)
        |SELECT doc_id, CAST(MIN(win_idx) AS INT) AS seg_start,
        |  CAST(MAX(win_idx) AS INT) AS seg_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_windows
        |FROM g WHERE active GROUP BY doc_id, grp""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      graft.functions.VectorExprs.register(s)
      val e = Multimodal.audioWindows(media(s, dir), windowBytes = 400, hopBytes = 160)
        .select(col("doc_id"), col("win_idx"),
          expr("byte_sum(window)").as("energy"),
          length(col("window")).as("win_len"))
      val act = e.withColumn("active", col("energy") >= lit(95) * col("win_len"))
      val grp = col("win_idx") -
        row_number().over(Window.partitionBy("doc_id", "active").orderBy("win_idx"))
      act.withColumn("grp", grp)
        .filter(col("active"))
        .groupBy(col("doc_id"), col("grp"))
        .agg(min("win_idx").as("seg_start"), max("win_idx").as("seg_end"),
          count(lit(1)).as("n_windows"))
        .select(col("doc_id"), col("seg_start"), col("seg_end"), col("n_windows"))
    },

    // ------------------------------------------------------------------ MM-5
    // Media vectors through the SEMANTIC-DEDUP spine: embedBatch derives
    // a 64-bucket exact-integer byte histogram per payload (the encoder
    // stand-in), and the d_semantic_dedup centroid-blocking machinery —
    // √N stride codebook, broadcast argmax assignment, within-cell
    // pairwise exact-integer cosine — dedups them, proving the dedup/ANN
    // path serves non-text columns unchanged. Same cost shape as
    // d_semantic_dedup: one broadcast cross-join + per-cell pairs, never
    // all-pairs.
    QueryDef("mm_embed_dup",
      """WITH n0 AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 64), b -> CAST(length(list_filter(
        |      list_transform(range(1, length(text) + 1),
        |                     i -> ascii(substr(text, CAST(i AS INT), 1))),
        |      c -> c // 4 = b)) AS BIGINT)) AS qv
        |  FROM documents),
        |n AS (SELECT doc_id, qv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nq FROM n0),
        |sp AS (SELECT GREATEST(1, CAST(floor(sqrt(COUNT(*))) AS BIGINT)) AS stride FROM n),
        |cent AS (SELECT doc_id AS cid, qv AS cqv, nq AS cnq FROM n
        |         WHERE doc_id % (SELECT stride FROM sp) = 0),
        |assign AS (
        |  SELECT doc_id, cid, qv, nq FROM (
        |    SELECT v.doc_id, c.cid, v.qv, v.nq,
        |      ROW_NUMBER() OVER (PARTITION BY v.doc_id ORDER BY
        |        CAST(CAST(list_sum(list_transform(list_zip(v.qv, c.cqv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
        |          / (sqrt(CAST(v.nq AS DOUBLE)) * sqrt(CAST(c.cnq AS DOUBLE))) DESC, c.cid) AS rn
        |    FROM n v CROSS JOIN cent c)
        |  WHERE rn = 1),
        |dups AS (
        |  SELECT DISTINCT b.doc_id AS dup_id
        |  FROM assign a JOIN assign b ON a.cid = b.cid AND a.doc_id < b.doc_id
        |  WHERE CAST(CAST(list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE))) >= 0.998)
        |SELECT s.doc_id, s.cid AS cell_id, d.dup_id IS NULL AS is_kept
        |FROM assign s LEFT JOIN dups d ON s.doc_id = d.dup_id""".stripMargin) { (s, dir) =>
      graft.functions.VectorExprs.register(s)
      val n = Multimodal.embedBatch(media(s, dir))
        .withColumn("nq", expr("long_dot(qv, qv)"))
      // |documents| from footer metadata — no count job for the stride
      val stride = SimilarityQueries.centroidStride(
        Graft.parquetRowCount(s, s"$dir/documents.parquet"))
      // the SAME single-sourced spine d_semantic_dedup runs — the media
      // path cannot drift from the text path
      CentroidBlockDedup(n, "doc_id", stride, tau = 0.998)
    },

    // ------------------------------------------------------------------ MM-7
    // Media vectors through the PERSISTED ANN SERVING store (mm_embed_dup
    // proves the dedup spine; this proves serving): embedBatch's exact-
    // integer byte-histogram vectors build the same generational IVF index
    // text embeddings use (codebook + cell-bucketed inverted file as lake
    // tables, AnnStore), and a query batch probes it — broadcast cell pick,
    // bucket-pruned scan of only the probed cells, exact re-rank. All math
    // integral (the histograms ARE integers, no quantization step), so the
    // stored probe is bit-identical to this from-scratch oracle — the
    // ann_ivf ≡ ann_ivfs equivalence, replayed for the media flank.
    QueryDef("mm_ann_probe",
      """WITH n0 AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 64), b -> CAST(length(list_filter(
        |      list_transform(range(1, length(text) + 1),
        |                     i -> ascii(substr(text, CAST(i AS INT), 1))),
        |      c -> c // 4 = b)) AS BIGINT)) AS qv
        |  FROM documents),
        |n AS (SELECT doc_id AS vec_id, qv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nq FROM n0),
        |sp AS (SELECT GREATEST(1, CAST(floor(sqrt(COUNT(*))) AS BIGINT)) AS stride FROM n),
        |cent AS (SELECT vec_id AS cid, qv AS cqv, nq AS cnq FROM n
        |         WHERE vec_id % (SELECT stride FROM sp) = 0),
        |assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT v.vec_id, c.cid,
        |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
        |        CAST(CAST(list_sum(list_transform(list_zip(v.qv, c.cqv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
        |          / (sqrt(CAST(v.nq AS DOUBLE)) * sqrt(CAST(c.cnq AS DOUBLE))) DESC, c.cid) AS rn
        |    FROM n v CROSS JOIN cent c)
        |  WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS q_id, cid FROM (
        |    SELECT q.vec_id, c.cid,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |        CAST(CAST(list_sum(list_transform(list_zip(q.qv, c.cqv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
        |          / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(c.cnq AS DOUBLE))) DESC, c.cid) AS rn
        |    FROM n q CROSS JOIN cent c WHERE q.vec_id < 8)
        |  WHERE rn <= 4),
        |pairs AS (
        |  SELECT p.q_id, a.vec_id AS n_id,
        |    CAST(CAST(list_sum(list_transform(list_zip(q.qv, v.qv), x -> x[1] * x[2])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(v.nq AS DOUBLE))) AS cos_sim
        |  FROM probes p
        |  JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.q_id
        |  JOIN n q ON q.vec_id = p.q_id
        |  JOIN n v ON v.vec_id = a.vec_id),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
        |    ORDER BY cos_sim DESC, n_id) AS rank FROM pairs)
        |SELECT q_id, rank, n_id, cos_sim FROM ranked WHERE rank <= 5""".stripMargin) { (s, dir) =>
      val fp = Graft.dataFingerprint(s, s"$dir/documents.parquet")
      val root = graft.core.StoreRoots.rootFor("graft_mm_ann_store", "v1", dir, fp)
      val vecs = Multimodal.embedBatch(media(s, dir))
        .withColumnRenamed("doc_id", "vec_id")
      graft.pipeline.AnnStore.ensureBuilt(s, root, vecs)
      graft.pipeline.AnnStore.probe(s, root,
        vecs.filter(col("vec_id") < 8), nprobe = 4, k = 5)
    },

    // ------------------------------------------------------------------ MM-8
    // Perceptual-hash image near-dup — the dHash shape: sample the payload
    // into an 8×9 "grayscale grid" (here the raw bytes stand in for decoded
    // luma — the grid arithmetic is what's under test; a real vision
    // pipeline feeds decodeImageBatch's pixels into the SAME expressions),
    // take the 64 horizontal gradient bits, and pair documents by Hamming
    // distance ≤ 3. The 64-bit signature is carried as four 16-bit bands —
    // exactly the simhash/LSH banding trick: by pigeonhole, Hamming ≤ 3
    // over 4 bands forces at least one band EQUAL, so four equality
    // self-joins on a band value find every qualifying pair with no
    // all-pairs scan. At 100 TB: signatures are one map-side codegen
    // projection (no shuffle), the candidate space is 4 hash-partitioned
    // equi-joins on 16-bit band keys (a degenerate band value — e.g. flat
    // images — is the j_salted_skew case and takes the same salting), and
    // the Hamming verify is bit_count(xor) on already-joined ints.
    // Engine parity note: Spark samples BYTE positions of the binary
    // payload, the oracle CHAR positions of the text — equal only while
    // 1 char = 1 byte, which SchemaContractSpec pins for the fixture
    // (the ASCII contract the whole media-oracle idiom rests on).
    QueryDef("mm_phash", {
      def bandSql(k: Int): String = (0 until 16).map { j =>
        val b = 16 * k + j; val r = b / 8; val c = b % 8
        val l = r * 9 + c + 1
        s"CASE WHEN p[$l] > p[${l + 1}] THEN ${1 << j} ELSE 0 END"
      }.mkString(" + ")
      s"""WITH px AS (
         |  SELECT doc_id,
         |    list_transform(range(0, 72),
         |      i -> ascii(substr(text, CAST(i % length(text) AS INT) + 1, 1))) AS p
         |  FROM documents),
         |sig AS (
         |  SELECT doc_id, ${(0 until 4).map(k => s"${bandSql(k)} AS b$k").mkString(", ")}
         |  FROM px),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.b0 AS a0, a.b1 AS a1, a.b2 AS a2, a.b3 AS a3,
         |    b.b0 AS c0, b.b1 AS c1, b.b2 AS c2, b.b3 AS c3
         |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |    AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3))
         |SELECT doc_a, doc_b,
         |  CAST(bit_count(xor(a0, c0)) + bit_count(xor(a1, c1))
         |     + bit_count(xor(a2, c2)) + bit_count(xor(a3, c3)) AS INT) AS hamming
         |FROM cand
         |WHERE bit_count(xor(a0, c0)) + bit_count(xor(a1, c1))
         |    + bit_count(xor(a2, c2)) + bit_count(xor(a3, c3)) <= 3""".stripMargin
    }) { (s, dir) =>
      def band(k: Int): org.apache.spark.sql.Column = (0 until 16).map { j =>
        val b = 16 * k + j; val r = b / 8; val c = b % 8
        val l = r * 9 + c + 1
        when(expr(s"element_at(p, $l) > element_at(p, ${l + 1})"), lit(1 << j))
          .otherwise(lit(0))
      }.reduce(_ + _).as(s"b$k")
      // the signature table feeds eight join sides — compute it once
      val sig = media(s, dir)
        .withColumn("p", expr(
          """transform(sequence(0, 71),
            |  i -> ascii(cast(substring(media, cast(i % length(media) as int) + 1, 1) as string)))"""
            .stripMargin))
        .select(col("doc_id"), band(0), band(1), band(2), band(3))
        .persist()
      val cands = (0 until 4).map { k =>
        sig.as("a").join(sig.as("b"),
          col(s"a.b$k") === col(s"b.b$k") && col("a.doc_id") < col("b.doc_id"))
          .select(
            col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.b0").as("a0"), col("a.b1").as("a1"),
            col("a.b2").as("a2"), col("a.b3").as("a3"),
            col("b.b0").as("c0"), col("b.b1").as("c1"),
            col("b.b2").as("c2"), col("b.b3").as("c3"))
      }.reduce(_ union _).distinct()
      val ham = expr(
        "bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + bit_count(a2 ^ c2) + bit_count(a3 ^ c3)")
      CacheScope.sealResult(
        cands.filter(ham <= 3)
          .select(col("doc_a"), col("doc_b"), ham.cast("int").as("hamming")),
        sig)
    },

    // ------------------------------------------------------------------ MM-9
    // ViT-style patch-grid planning: the 16×16 patch lattice a vision
    // transformer consumes, computed from the container metadata (the
    // width/height the header declares are exact multiples of 16 here,
    // so the grid divides evenly — a real pipeline pads first, which is
    // the mm_resize_plan step). Per patch: grid coordinates, the
    // row-major byte offset into the raw payload, and — where the
    // payload actually extends that far — the md5 of the patch's first
    // 16-byte row over the REAL BinaryType slice (the mm_frame_sample
    // parity trick: the oracle recomputes it from the ASCII text side).
    // One metadata-driven explode, codegen end to end; the fan-out is
    // (w/16)·(h/16) ≤ 91 per document, bounded by the header fields.
    QueryDef("mm_patch_grid",
      """WITH m AS (
        |  SELECT doc_id, text, length(text) AS n_bytes,
        |    16 * (1 + length(text) % 13) AS width,
        |    16 * (1 + length(text) % 7) AS height
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, n_bytes, width, height,
        |    CAST(t.i % (width // 16) AS INT) AS px,
        |    CAST(t.i // (width // 16) AS INT) AS py,
        |    CAST(t.i AS INT) AS patch_idx, text
        |  FROM m, UNNEST(range(0, (width // 16) * (height // 16))) AS t(i))
        |SELECT doc_id, patch_idx, px, py,
        |  CAST(py * 16 * width + px * 16 AS BIGINT) AS byte_offset,
        |  CASE WHEN py * 16 * width + px * 16 < n_bytes
        |    THEN md5(substr(text, CAST(py * 16 * width + px * 16 + 1 AS INT), 16))
        |    ELSE NULL END AS row0_md5
        |FROM g""".stripMargin) { (s, dir) =>
      media(s, dir)
        .select(col("doc_id"), col("media"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.n_bytes").as("n_bytes"))
        .withColumn("patch_idx", explode(expr(
          "sequence(0, cast((width div 16) * (height div 16) as int) - 1)")))
        .withColumn("px", expr("cast(patch_idx % (width div 16) as int)"))
        .withColumn("py", expr("cast(patch_idx div (width div 16) as int)"))
        .withColumn("byte_offset",
          expr("cast(py * 16 * width + px * 16 as bigint)"))
        .select(col("doc_id"), col("patch_idx").cast("int").as("patch_idx"),
          col("px"), col("py"), col("byte_offset"),
          when(col("byte_offset") < col("n_bytes"),
            md5(expr("substring(media, cast(byte_offset + 1 as int), 16)")))
            .as("row0_md5"))
    }
  )
}
