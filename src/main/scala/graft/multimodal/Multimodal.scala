package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column handling (SURVEY.md §7.6; BASELINE.json north star).
  *
  * Convention: media travel as opaque `BinaryType` columns next to a typed
  * metadata struct; every cleaning operator in graft.ops type-dispatches and
  * passes non-atomic columns through untouched, so media survive a cleaning
  * pipeline unmodified.
  *
  * Real decode (image/audio libs) is NOT available in this environment —
  * [[stubDecodeFeatures]] is a clearly-marked deterministic stand-in with
  * the same shape a real decoder would produce; the Spark-side plumbing
  * (schema, batch iteration, partition-parallel execution) is real and is
  * what a production decoder would plug into.
  */
object Multimodal {

  val MetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Wrap a string column as a binary media column + metadata struct —
    * the corpus has no real media, so documents.text stands in as bytes. */
  def asMedia(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("content", col(srcCol).cast(BinaryType))
      .withColumn("meta", struct(
        lit("application/octet-stream").as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")))

  /** Cheap, SQL-expressible byte-level features: size + content hash.
    * Pure expressions — run in the scan stage. */
  def byteFeatures(df: DataFrame): DataFrame =
    df.withColumn("byte_len", length(col("content")).cast(LongType))
      .withColumn("content_sha", sha2(col("content"), 256))

  /** STUB decoder: where a real pipeline would decode media and extract
    * features (via a partition-parallel batch UDF), this produces a
    * deterministic `dims`-dim pseudo-feature row from the content's sha-256
    * digest. Scalar `feature_i` columns (not an array) so downstream
    * tooling — including a pandas comparator — can sort/hash the output.
    * The partitioning shape is the real one; only the math inside is fake.
    * Replace the body per modality in production.
    *
    * feature_i = (ascii-sum of hex digest chars [i*stride, (i+1)*stride))
    *             mod 1000 / 1000 — chosen because every term is a plain
    * SQL builtin, so an external engine can recompute it for verification. */
  def stubDecodeFeatures(df: DataFrame, dims: Int = 8): DataFrame = {
    require(64 % dims == 0, s"dims must divide 64, got $dims")
    val stride = 64 / dims
    val withSha = df.withColumn("_sha_hex", sha2(col("content"), 256))
    val feats = (0 until dims).map { i =>
      val asciiSum = (1 to stride)
        .map(j => ascii(substring(col("_sha_hex"), i * stride + j, 1)))
        .reduce(_ + _)
      round((asciiSum % 1000).cast(DoubleType) / 1000.0, 6).as(s"feature_$i")
    }
    withSha.select(col("*") +: feats: _*).drop("_sha_hex")
  }

  /** Frame-sample stand-in: pick every `stride`-th byte as a "frame"
    * (the real operator samples video frames; same slicing plumbing). */
  def sampleBytes(df: DataFrame, stride: Int = 100): DataFrame =
    df.withColumn("sampled",
      transform(sequence(lit(1), greatest(length(col("content")), lit(1)),
        lit(stride)), i => substr(col("content"), i, lit(1))))

  /** Frame sampling over an opaque binary payload: fixed `frameBytes`-size
    * frames (a partial tail frame counts), keep every `every`-th, emit one
    * row per kept frame with its md5 — the shape a video frame-sampler
    * produces (frame index + decoded-frame fingerprint), with byte-slice
    * plumbing standing in for the codec. Pure expressions: slicing,
    * filtering and hashing all happen in the scan stage, rows explode only
    * for KEPT frames. On ASCII payloads the digests equal char-space
    * digests, which is what lets an external engine verify the output
    * (q_multimodal_frames). */
  def sampleFrames(df: DataFrame, frameBytes: Int, every: Int,
      contentCol: String = "content", idCol: String = "doc_id"): DataFrame = {
    require(frameBytes > 0 && every > 0)
    val nFrames = ceil(length(col(contentCol)).cast(DoubleType) / frameBytes)
      .cast(IntegerType)
    val kept = filter(
      sequence(lit(0), greatest(nFrames - 1, lit(0))),
      i => i % every === 0)
    df.select(col(idCol), explode(transform(kept, i => struct(
        i.cast(LongType).as("frame_idx"),
        md5(substr(col(contentCol), i * frameBytes + 1, lit(frameBytes)))
          .as("frame_md5")))).as("f"))
      .select(col(idCol), col("f.frame_idx").as("frame_idx"),
        col("f.frame_md5").as("frame_md5"))
  }
}
