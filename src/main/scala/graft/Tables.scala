package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Parquet table loader for the driver-generated corpus
  * (`/root/repo/TESTDATA.md`). One parquet dir per table under the sf dir. */
object Tables {
  val All: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** `dt` with every TIMESTAMP_NTZ — however deeply nested in
    * struct/array/map — replaced by TimestampType. */
  private[graft] def swapNtz(dt: DataType): DataType = dt match {
    case TimestampNTZType => TimestampType
    case s: StructType =>
      StructType(s.fields.map(f => f.copy(dataType = swapNtz(f.dataType))))
    case a: ArrayType => a.copy(elementType = swapNtz(a.elementType))
    case m: MapType =>
      m.copy(keyType = swapNtz(m.keyType), valueType = swapNtz(m.valueType))
    case other => other
  }

  /** The corpus generator has shipped timestamps three ways across rounds:
    * TIMESTAMP(NANOS) (read as Long under `nanosAsLong`), adjusted-to-UTC
    * micros (TimestampType), and — since r13 — plain `timestamp[us]` with
    * no UTC flag, which Spark 4 infers as TIMESTAMP_NTZ. Event-time
    * streaming rejects NTZ (`EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`) and
    * NTZ/LTZ comparisons coerce unpredictably, so every loader funnels
    * through here: NTZ columns become TimestampType — including NTZ
    * fields nested inside struct/array/map columns (a future multimodal
    * or documents schema must not bypass normalization; cast rebuilds
    * the nested type field-wise). Sessions pin
    * `spark.sql.session.timeZone=UTC`, so the cast is value-preserving
    * (same micros) and DuckDB — which reads the same files as naive
    * timestamps — renders identical values. TablesSpec pins this against
    * the next generator format drift. */
  def normalizeTimestamps(df: DataFrame): DataFrame = {
    val changed = df.schema.fields
      .filter(f => swapNtz(f.dataType) != f.dataType)
    if (changed.isEmpty) df
    else df.withColumns(
      changed.map(f => f.name -> col(f.name).cast(swapNtz(f.dataType))).toMap)
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeTimestamps(spark.read.parquet(s"$sfDir/$name.parquet"))
}
