package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar int8 embedding quantization — the standard 4× storage/IO
  * shrink in front of a vector index (per-vector affine min/max scheme,
  * the faiss `SQ8`/`ScalarQuantizer` layout): each float dimension maps
  * to a byte code `round((x − min) / scale) − 128` with
  * `scale = (max − min)/255`, reconstructed as `(code + 128)·scale +
  * min`; worst-case reconstruction error is scale/2 per dimension. At
  * 100 TB of embeddings the 4× matters twice — once on disk, once on
  * every shuffle/broadcast an ANN build moves the vectors through.
  *
  * Scale shape: pure per-row projections (array_min/max + one
  * `transform`) — no UDF, no shuffle, no action; codegen keeps the whole
  * row pipeline in one stage. All arithmetic is double-precision with
  * HALF_UP rounding on non-negative operands, so an external engine
  * reproduces the codes bit-exactly from the same floats (the
  * q_embed_quantize oracle recomputes them in DuckDB).
  *
  * Degenerate vectors (max == min, including all-zero) quantize to code
  * 0 everywhere with scale 0 and reconstruct exactly as the constant.
  */
object Quantize {

  /** (idCol, minv double, scale double, codes array<tinyint>). */
  def quantizeInt8(df: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    df.select(col(idCol), col(vecCol).as("__v"))
      .withColumn("minv", array_min(col("__v")).cast(DoubleType))
      .withColumn("__scale",
        (array_max(col("__v")).cast(DoubleType) - col("minv")) / 255.0)
      .select(col(idCol), col("minv"), col("__scale").as("scale"),
        transform(col("__v"), x =>
          when(col("__scale") === 0.0, lit(0))
            .otherwise(least(lit(127), greatest(lit(-128),
              (round((x.cast(DoubleType) - col("minv")) / col("__scale"))
                .cast(IntegerType) - 128))))
            .cast(ByteType)).as("codes"))
  }

  /** Inverse: (idCol, vec array<double>) reconstructed from codes. */
  def dequantizeInt8(quantized: DataFrame, idCol: String): DataFrame =
    quantized.select(col(idCol),
      transform(col("codes"), c =>
        (c.cast(DoubleType) + 128.0) * col("scale") + col("minv"))
        .as("vec"))
}
