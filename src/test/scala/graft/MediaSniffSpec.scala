package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Guards the data-pinned assumption under every multimodal oracle row
  * (r16 ADVICE): the raw (non-synthesized) documents in each sf dir
  * must never START with container magic — a corpus regeneration that
  * ships a doc opening with "BM"/"RIFF…WAVEfmt "/PNG signature/"GIF8"
  * would decode on the Spark side, flip a mime/field, and surface only
  * as an opaque driver hash mismatch. Fail loudly here instead, naming
  * the directory. */
class MediaSniffSpec extends SparkSpec {

  test("no raw document text sniffs as BMP/WAV/PNG/GIF/JPEG in any sf dir") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val c = col("content")
      val n = Multimodal.asMedia(
          Tables.load(spark, dir, "documents"), "text")
        .where(Multimodal.isBmp(c) || Multimodal.isWav(c) ||
          Multimodal.isPng(c) || Multimodal.isGif(c) ||
          Multimodal.isJpeg(c))
        .count()
      assert(n == 0L,
        s"$dir: $n raw docs carry container magic — a regenerated corpus " +
          "would break the multimodal oracle hashes; repartition the " +
          "raw/synth doc_id split or strip the offending prefix")
    }
  }
}
