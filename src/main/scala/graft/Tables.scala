package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Parquet table loader for the driver-generated corpus
  * (`/root/repo/TESTDATA.md`). One parquet dir per table under the sf dir. */
object Tables {
  val All: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** The corpus generator has shipped timestamps three ways across rounds:
    * TIMESTAMP(NANOS) (read as Long under `nanosAsLong`), adjusted-to-UTC
    * micros (TimestampType), and — since r13 — plain `timestamp[us]` with
    * no UTC flag, which Spark 4 infers as TIMESTAMP_NTZ. Event-time
    * streaming rejects NTZ (`EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`) and
    * NTZ/LTZ comparisons coerce unpredictably, so every loader funnels
    * through here: NTZ columns become TimestampType. Sessions pin
    * `spark.sql.session.timeZone=UTC`, so the cast is value-preserving
    * (same micros) and DuckDB — which reads the same files as naive
    * timestamps — renders identical values. */
  def normalizeTimestamps(df: DataFrame): DataFrame = {
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
    if (ntz.isEmpty) df
    else df.withColumns(
      ntz.map(f => f.name -> col(f.name).cast(TimestampType)).toMap)
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeTimestamps(spark.read.parquet(s"$sfDir/$name.parquet"))
}
