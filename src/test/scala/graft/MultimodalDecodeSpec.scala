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

  test("non-container content yields false magic and all-null fields, " +
      "never a throw") {
    val junk = mediaOf(
      1L -> "00",                       // 1 byte
      2L -> ("424D" + "00" * 10),       // BM magic but truncated header
      3L -> ("52494646" + "00" * 60),   // RIFF but not WAVE/fmt/data
      4L -> ("FF" * 100))
    val b = Multimodal.decodeBmpMeta(junk)
      .select("is_bmp", "bmp_width").collect()
    assert(b.forall(r => !r.getBoolean(0) && r.isNullAt(1)))
    val w = Multimodal.decodeWavMeta(junk)
      .select("is_wav", "wav_sample_rate").collect()
    assert(w.forall(r => !r.getBoolean(0) && r.isNullAt(1)))
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
