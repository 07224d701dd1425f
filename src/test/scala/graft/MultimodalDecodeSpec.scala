package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** The r16 real-container decode (BMP + canonical PCM WAV header byte
  * math) against HAND-WRITTEN golden bytes — independent of the
  * synthesizer, so a mirrored encode/decode error (both sides agreeing
  * on the wrong endianness or offset) cannot pass. The oracle row
  * (q_multimodal_decode / q_multimodal_wav) then verifies the
  * synth→decode roundtrip at corpus scale. */
class MultimodalDecodeSpec extends SparkSpec {
  import spark.implicits._

  // 2x2 24bpp bottom-up BMP, 54-byte header + 2 rows of 8 bytes
  // (6 pixel bytes + 2 pad), file size 70 = 0x46 — laid out by hand from
  // the public BITMAPFILEHEADER/BITMAPINFOHEADER spec
  private val goldenBmpHex =
    "424D" + "46000000" + "00000000" + "36000000" +
      "28000000" + "02000000" + "02000000" + "0100" + "1800" +
      "00000000" + "10000000" + "130B0000" + "130B0000" +
      "00000000" + "00000000" +
      "00112233445566778899AABBCCDDEEFF"

  // same image, top-down: height = -2 (LE two's complement FEFFFFFF)
  private val topDownBmpHex = goldenBmpHex.patch(44, "FEFFFFFF", 8)

  // mono 8000 Hz 16-bit PCM WAV, 4 samples (8 data bytes):
  // RIFF size 44-8 = 36+8 = 0x2C, byte rate 16000 = 0x3E80
  private val goldenWavHex =
    "52494646" + "2C000000" + "57415645" + "666D7420" +
      "10000000" + "0100" + "0100" + "401F0000" + "803E0000" +
      "0200" + "1000" + "64617461" + "08000000" +
      "0011223344556677"

  private def mediaOf(hexes: (Long, String)*) =
    hexes.toSeq.toDF("doc_id", "hx")
      .withColumn("content", unhex(col("hx"))).drop("hx")

  test("golden hand-written BMP decodes to its known header fields") {
    val r = Multimodal.decodeBmpMeta(mediaOf(1L -> goldenBmpHex))
      .select("is_bmp", "bmp_width", "bmp_height", "bmp_bpp",
        "bmp_file_size", "bmp_data_offset", "bmp_compression")
      .head()
    assert(r.getBoolean(0))
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 24L)
    assert(r.getLong(4) == 70L && r.getLong(5) == 54L && r.getLong(6) == 0L)
  }

  test("negative (top-down) height reads signed; meta takes the magnitude") {
    val r = Multimodal.decodeBmpMeta(
        mediaOf(1L -> topDownBmpHex)
          .withColumn("meta", struct(
            lit("application/octet-stream").as("mime"),
            lit(null).cast("int").as("width"),
            lit(null).cast("int").as("height"),
            lit(null).cast("long").as("duration_ms"))))
      .select(col("bmp_height"), col("meta.height"), col("meta.mime"))
      .head()
    assert(r.getLong(0) == -2L)
    assert(r.getInt(1) == 2)
    assert(r.getString(2) == "image/bmp")
  }

  test("golden hand-written WAV decodes to its known header fields") {
    val r = Multimodal.decodeWavMeta(mediaOf(1L -> goldenWavHex))
      .select("is_wav", "wav_channels", "wav_sample_rate", "wav_bits",
        "wav_data_bytes", "wav_n_samples", "wav_duration_ms")
      .head()
    assert(r.getBoolean(0))
    assert(r.getLong(1) == 1L && r.getLong(2) == 8000L && r.getLong(3) == 16L)
    assert(r.getLong(4) == 8L && r.getLong(5) == 4L)
    assert(r.getLong(6) == 0L) // 0.5 ms floors to 0 — integer contract
  }

  // 2x3 8-bit truecolor PNG: signature + IHDR with the REAL CRC32 of
  // the 17 type+data bytes (368849D6, zlib) — laid out by hand from the
  // public PNG spec (big-endian dims at fixed offsets 17/21)
  private val goldenPngHex =
    "89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000002" + "00000003" + "08" + "02" + "00" + "00" + "00" +
      "368849D6"

  // 3x2 GIF89a: LE dims, packed 0x91 (GCT present, 2^(1+1)=4 entries),
  // background index 1, 12 color-table bytes, trailer
  private val goldenGifHex =
    "474946383961" + "0300" + "0200" + "91" + "01" + "00" +
      "000000FFFFFF00FF00FF0000" + "3B"

  test("golden hand-written PNG decodes to its known IHDR fields") {
    val r = Multimodal.decodePngMeta(mediaOf(1L -> goldenPngHex))
      .select("is_png", "png_width", "png_height", "png_bit_depth",
        "png_color_type", "png_interlace")
      .head()
    assert(r.getBoolean(0))
    assert(r.getLong(1) == 2L && r.getLong(2) == 3L)
    assert(r.getLong(3) == 8L && r.getLong(4) == 2L && r.getLong(5) == 0L)
  }

  test("golden hand-written GIF decodes its logical-screen descriptor; " +
      "GIF87a is accepted too") {
    val gif87 = goldenGifHex.patch(8, "37", 2) // version byte '7'
    val rs = Multimodal.decodeGifMeta(
        mediaOf(1L -> goldenGifHex, 2L -> gif87))
      .select("is_gif", "gif_width", "gif_height", "gif_has_gct",
        "gif_gct_size", "gif_bg_index")
      .orderBy("gif_width").collect()
    rs.foreach { r =>
      assert(r.getBoolean(0))
      assert(r.getLong(1) == 3L && r.getLong(2) == 2L)
      assert(r.getBoolean(3) && r.getLong(4) == 4L && r.getLong(5) == 1L)
    }
  }

  // hand-written JFIF stream: SOI, a 2-payload-byte COM segment, one
  // legal FF fill byte, then SOF1 (extended baseline) 128x256, 8-bit,
  // 3 components — the scanner must skip the COM by its length word and
  // step over the fill byte to reach the SOF
  private val goldenJpegHex =
    "FFD8" + "FFFE0004ABCD" + "FF" + "FFC1" + "0011" + "08" +
      "0100" + "0080" + "03" + "011100" + "021101" + "031101"

  // same stream with a TEM standalone marker (no length word) before
  // the frame, and SOF2 — progressive must flag
  private val goldenJpegProgHex =
    "FFD8" + "FF01" + "FFC2" + "0011" + "08" +
      "0040" + "0020" + "03" + "011100" + "021101" + "031101"

  test("golden hand-written JPEG: the marker scan skips COM by length, " +
      "steps fill bytes and standalone markers, reads SOF1/SOF2") {
    val rs = Multimodal.decodeJpegMeta(
        mediaOf(1L -> goldenJpegHex, 2L -> goldenJpegProgHex))
      .select("doc_id", "is_jpeg", "jpeg_width", "jpeg_height",
        "jpeg_precision", "jpeg_ncomp", "jpeg_progressive")
      .orderBy("doc_id").collect()
    assert(rs(0).getBoolean(1))
    assert(rs(0).getLong(2) == 128L && rs(0).getLong(3) == 256L)
    assert(rs(0).getLong(4) == 8L && rs(0).getLong(5) == 3L)
    assert(!rs(0).getBoolean(6))
    assert(rs(1).getBoolean(1))
    assert(rs(1).getLong(2) == 32L && rs(1).getLong(3) == 64L)
    assert(rs(1).getBoolean(6), "SOF2 must flag progressive")
  }

  test("hostile JPEG streams read as clean false rows: bad lengths, " +
      "SOS/EOI before any SOF, truncation") {
    val junk = mediaOf(
      1L -> ("FFD8" + "FFFE" + "0001" + "00"),     // length word < 2
      2L -> ("FFD8" + "FFFE" + "0FFF" + "0000"),   // length past buffer
      3L -> ("FFD8" + "FFDA" + "000C" + "00" * 10), // SOS before SOF
      4L -> "FFD8FFD9",                             // EOI immediately
      5L -> "FFD8FF",                               // truncated marker
      6L -> ("FFD8" + "00" * 30),                   // no marker prefix
      7L -> ("FFD8" + ("FF010000" * 2)))            // malformed after TEM
    val rs = Multimodal.decodeJpegMeta(junk)
      .select("is_jpeg", "jpeg_width").collect()
    assert(rs.forall(r => !r.getBoolean(0) && r.isNullAt(1)))
  }

  test("jpeg kernel: NO_CODEGEN fallback agrees with codegen") {
    // (plan-shape asserts live in the corpus-wide synth test below — a
    // local Seq relation constant-folds to a LocalTableScan here)
    val df = mediaOf(1L -> goldenJpegHex, 2L -> goldenJpegProgHex,
      3L -> "FFD8FFD9", 4L -> "00")
    def run(): Seq[org.apache.spark.sql.Row] =
      Multimodal.decodeJpegMeta(df)
        .select("doc_id", "is_jpeg", "jpeg_width", "jpeg_height",
          "jpeg_progressive")
        .orderBy("doc_id").collect().toSeq
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(key, "FALLBACK")
    val withCodegen = run()
    try {
      spark.conf.set(key, "NO_CODEGEN")
      assert(run() == withCodegen)
    } finally spark.conf.set(key, prev)
  }

  test("synthJpeg puts SOF at an id-dependent offset and decode " +
      "returns the embedded fields, scan-stage only (corpus-wide)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val decoded = Multimodal.decodeJpegMeta(
      Multimodal.synthJpeg(docs, "doc_id", "text"))
    val bad = decoded.where(!col("is_jpeg") ||
        col("jpeg_width") =!= col("doc_id") % 333 + 1 ||
        col("jpeg_height") =!= col("doc_id") % 501 + 1 ||
        col("jpeg_precision") =!= 8 || col("jpeg_ncomp") =!= 3 ||
        col("jpeg_progressive") ||
        // the COM segment really varies: total length tracks id%37
        length(col("content")) =!= col("doc_id") % 37 + 1 + 63)
      .count()
    assert(bad == 0L)
    val plan = decoded.queryExecution.executedPlan.toString
    assert(plan.contains("graft_jpeg_sof"), plan)
    assert(!plan.contains("Exchange") && !plan.contains("ScalaUDF"), plan)
  }

  test("non-container content yields false magic and all-null fields, " +
      "never a throw") {
    val junk = mediaOf(
      1L -> "00",                       // 1 byte
      2L -> ("424D" + "00" * 10),       // BM magic but truncated header
      3L -> ("52494646" + "00" * 60),   // RIFF but not WAVE/fmt/data
      4L -> ("FF" * 100),
      5L -> "89504E470D0A1A0A00000004",   // PNG signature, truncated
      6L -> ("89504E470D0A1A0A" + "0000000D" + "49454E44" + "00" * 17),
      7L -> "474946383961030002")         // GIF magic, descriptor short
    val b = Multimodal.decodeBmpMeta(junk)
      .select("is_bmp", "bmp_width").collect()
    assert(b.forall(r => !r.getBoolean(0) && r.isNullAt(1)))
    val w = Multimodal.decodeWavMeta(junk)
      .select("is_wav", "wav_sample_rate").collect()
    assert(w.forall(r => !r.getBoolean(0) && r.isNullAt(1)))
    val p = Multimodal.decodePngMeta(junk)
      .select("is_png", "png_width").collect()
    assert(p.forall(r => !r.getBoolean(0) && r.isNullAt(1)))
    val g = Multimodal.decodeGifMeta(junk)
      .select("is_gif", "gif_width").collect()
    assert(g.forall(r => !r.getBoolean(0) && r.isNullAt(1)))
  }

  test("synthPng emits a REAL IHDR (CRC verifies) and decode returns " +
      "the embedded fields, scan-stage only (corpus-wide)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val decoded = Multimodal.decodePngMeta(
      Multimodal.synthPng(docs, "doc_id"))
    val bad = decoded.where(!col("is_png") ||
        col("png_width") =!= col("doc_id") % 21 + 1 ||
        col("png_height") =!= col("doc_id") % 13 + 1 ||
        col("png_bit_depth") =!= 8 ||
        // independent CRC re-check over the synthesized bytes
        crc32(substring(col("content"), 13, 17)) =!=
          conv(hex(substring(col("content"), 30, 4)), 16, 10).cast("long"))
      .count()
    assert(bad == 0L)
    val plan = decoded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("ScalaUDF"), plan)
  }

  test("synthGif emits a complete no-frame GIF (trailer present, table " +
      "sized to the packed bits) and decode returns the embedded fields") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val decoded = Multimodal.decodeGifMeta(
      Multimodal.synthGif(docs, "doc_id", "text"))
    val bad = decoded.where(!col("is_gif") ||
        col("gif_width") =!= col("doc_id") % 321 + 1 ||
        col("gif_height") =!= col("doc_id") % 214 + 1 ||
        !col("gif_has_gct") ||
        col("gif_gct_size") =!= call_function("shiftleft", lit(2L), (col("doc_id") % 8).cast("int")) ||
        // 13-byte header + 3 bytes/entry + 1-byte trailer
        length(col("content")) =!= col("gif_gct_size") * 3 + 14 ||
        substring(col("content"), -1, 1) =!= lit(Array[Byte](0x3B.toByte)))
      .count()
    assert(bad == 0L)
    val plan = decoded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("ScalaUDF"), plan)
  }

  test("synthBmp emits well-formed files: declared size equals actual " +
      "byte length and decode returns the embedded dims (corpus-wide)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val decoded = Multimodal.decodeBmpMeta(
      Multimodal.synthBmp(docs, "doc_id", "text"))
    val bad = decoded.where(!col("is_bmp") ||
        col("bmp_file_size") =!= length(col("content")) ||
        col("bmp_width") =!= col("doc_id") % 21 + 1 ||
        col("bmp_height") =!= col("doc_id") % 13 + 1 ||
        col("bmp_bpp") =!= 24)
      .count()
    assert(bad == 0L)
    // pure expressions: the whole synth+decode runs in the scan stage
    val plan = decoded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("ScalaUDF"), plan)
  }

  test("synthWav emits well-formed files: RIFF size and data size agree " +
      "with actual byte length; decode returns the embedded params") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val decoded = Multimodal.decodeWavMeta(
      Multimodal.synthWav(docs, "doc_id", "text"))
    val bad = decoded.where(!col("is_wav") ||
        col("wav_data_bytes") + 44 =!= length(col("content")) ||
        col("wav_channels") =!= col("doc_id") % 2 + 1 ||
        col("wav_n_samples") =!= col("doc_id") % 200 + 1 ||
        col("wav_bits") =!= 16)
      .count()
    assert(bad == 0L)
  }
}
