package graft

import graft.core.Graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The fixture-schema contract: the driver regenerates the testdata between
  * rounds and has already changed column encodings once (`events.ts` went
  * from TIMESTAMP(NANOS)-as-int64 to TIMESTAMP_NTZ micros, silently
  * breaking 35 queries). This spec loads EVERY table the engine reads and
  * pins the adapted canonical types, so the next regeneration fails here
  * first — with a message naming the table and column — instead of as a
  * mid-plan DATATYPE_MISMATCH in 9 suites. */
class SchemaContractSpec extends SparkSpec {

  private val integral: DataType => Boolean =
    dt => dt == LongType || dt == IntegerType || dt == ShortType || dt == ByteType
  private val datetime: DataType => Boolean =
    dt => dt == TimestampType || dt == TimestampNTZType || dt == DateType

  test("every fixture table loads and exposes its contract columns") {
    val want: Map[String, Seq[(String, DataType => Boolean, String)]] = Map(
      "region" -> Seq(("r_regionkey", integral, "integral")),
      "nation" -> Seq(("n_nationkey", integral, "integral")),
      "customer" -> Seq(("c_custkey", integral, "integral")),
      "supplier" -> Seq(("s_suppkey", integral, "integral")),
      "part" -> Seq(("p_partkey", integral, "integral")),
      "orders" -> Seq(
        ("o_orderkey", integral, "integral"),
        ("o_totalprice", _ == DoubleType, "double"),
        ("o_orderdate", datetime,
          "timestamp/date")),
      "lineitem" -> Seq(
        ("l_orderkey", integral, "integral"),
        ("l_quantity", dt => dt == DoubleType || dt.isInstanceOf[DecimalType],
          "double/decimal"),
        ("l_shipdate", datetime,
          "timestamp/date")),
      "events" -> Seq(
        ("event_id", integral, "integral"),
        ("user_id", integral, "integral"),
        ("event_type", _ == StringType, "string"),
        ("value", _ == DoubleType, "double"),
        // ts is adaptive — LongType nanos OR a timestamp; epochUs() below
        // is the real gate
        ("ts", dt => dt == LongType || datetime(dt),
          "int64-nanos/timestamp")),
      "documents" -> Seq(
        ("doc_id", integral, "integral"),
        ("text", _ == StringType, "string"),
        ("lang", _ == StringType, "string"),
        ("source", _ == StringType, "string"),
        ("n_chars", integral, "integral")),
      "embeddings" -> Seq(
        ("vec_id", integral, "integral"),
        ("embedding", {
          case ArrayType(et, _) => et == FloatType || et == DoubleType
          case _ => false
        }, "array<float/double>"))
    )
    assert(want.keySet == Graft.tableNames.toSet) // every fixture table covered
    Graft.tableNames.foreach { t =>
      val df = Graft.table(spark, sf, t)
      val schema = df.schema
      want(t).foreach { case (colName, ok, desc) =>
        assert(schema.fieldNames.contains(colName),
          s"$t.$colName missing — fixture schema changed; loader contract broken " +
            s"(have: ${schema.fieldNames.mkString(", ")})")
        val dt = schema(colName).dataType
        assert(ok(dt),
          s"$t.$colName: stored type ${dt.catalogString} no longer satisfies the " +
            s"engine's contract ($desc) — extend the adaptive loader (Graft.scala)")
      }
    }
  }

  test("events adaptive loader yields microsecond epochs whatever the encoding") {
    val ev = Graft.events(spark, sf)
    assert(ev.schema("ts_us").dataType == LongType)
    val mm = ev.agg(min("ts_us"), max("ts_us")).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    // plausibility band: 2001-09-09..2286-11-20 in MICROseconds — catches a
    // silent unit regression (nanos would overshoot ~1000x, millis undershoot)
    assert(lo > 1000000000000000L && hi < 9999999999999999L, s"ts_us range [$lo, $hi]")
  }

  test("epochUs matches the legacy int64-nanos derivation bit-for-bit") {
    // round-trip: re-encode the current fixture as the OLD layout and check
    // the adaptive loader lands on identical microsecond values
    val dir = tmpDir("schema-nanos")
    Graft.events(spark, sf)
      .select(col("event_id"), (col("ts_us") * 1000L).as("ts"))
      .write.mode("overwrite").parquet(dir)
    val legacy = Graft.withEpochUs(spark.read.parquet(dir), "ts", "ts_us", "events")
      .select("event_id", "ts_us")
    val current = Graft.events(spark, sf).select("event_id", "ts_us")
    assert(legacy.exceptAll(current).isEmpty && current.exceptAll(legacy).isEmpty)
  }

  test("narrowed ids and widened embeddings still run (documents/embeddings drift shield)") {
    // the round-7 class of break, applied to the OTHER fixture tables: a
    // regeneration that writes doc_id/vec_id as int32 (or the embedding as
    // float64) must flow through the loader's width canonicalization, not
    // explode in the engine's getLong watermark fetches mid-query
    val dir = tmpDir("schema-drift")
    Graft.table(spark, sf, "documents")
      .withColumn("doc_id", col("doc_id").cast("int"))
      .withColumn("n_chars", col("n_chars").cast("int"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Graft.table(spark, sf, "embeddings")
      .withColumn("vec_id", col("vec_id").cast("int"))
      .withColumn("embedding", col("embedding").cast("array<double>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    assert(Graft.table(spark, dir, "documents").schema("doc_id").dataType == LongType,
      "documents.doc_id must canonicalize back to bigint")
    assert(Graft.table(spark, dir, "embeddings").schema("vec_id").dataType == LongType,
      "embeddings.vec_id must canonicalize back to bigint")
    // d_incremental_dedup exercises the driver-scalar watermark
    // (agg(max(doc_id)).head.getLong) that int32 would break
    assert(SparkEntry.queries("d_incremental_dedup")(spark, dir).count() > 0)
    // the ANN path quantizes float64 through the same cast as float32
    assert(SparkEntry.queries("ann_bruteforce_topk")(spark, dir).count() > 0)
  }

  test("an unsupported ts encoding fails loudly, naming table/column/type") {
    val dir = tmpDir("schema-bad")
    spark.range(3).selectExpr("id AS event_id", "CAST(id AS STRING) AS ts")
      .write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Graft.withEpochUs(spark.read.parquet(dir), "ts", "ts_us", "events")
    }
    assert(e.getMessage.contains("events.ts") && e.getMessage.contains("string"))
  }

  test("parquetRowCount (footer metadata) equals the scan count for every table") {
    for (t <- Seq("events", "documents", "embeddings", "orders", "lineitem")) {
      val meta = graft.core.Graft.parquetRowCount(spark, s"$sf/$t.parquet")
      val scan = spark.read.parquet(s"$sf/$t.parquet").count()
      assert(meta == scan, s"$t: footer says $meta, scan says $scan")
      assert(meta > 0, s"$t is empty at sf0.001")
    }
  }

  test("documents.text is pure ASCII — the media-oracle byte/char parity contract") {
    // The multimodal oracles verify Spark's genuine BinaryType arithmetic
    // from DuckDB's text side (MultimodalQueries header): that only holds
    // while one character IS one byte. mm_phash (byte-position sampling vs
    // char-position sampling) and mm_frame_sample (byte slices vs char
    // slices) would silently diverge on a multi-byte code point, so a
    // fixture regeneration that introduces one must fail HERE, loudly,
    // not as an opaque oracle hash mismatch.
    import org.apache.spark.sql.functions._
    val nonAscii = spark.read.parquet(s"$sf/documents.parquet")
      .filter(length(col("text")) =!= octet_length(col("text")) ||
        col("text").rlike("[^\\x00-\\x7F]"))
      .count()
    assert(nonAscii == 0,
      s"$nonAscii documents carry non-ASCII text: the byte-side multimodal " +
        "oracles (mm_phash, mm_frame_sample) assume 1 char = 1 byte")
  }
}
