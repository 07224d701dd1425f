package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC source/sink — the warehouse interchange format on the Hive /
  * Trino / Presto side of the lake (what CSV is to spreadsheets and
  * JSONL to LLM corpora, ORC is to existing Hadoop warehouses: a corpus
  * engine that cannot read a warehouse export forces a conversion step
  * in front of every enterprise dataset). The reference engine is
  * CSV-only; this rounds out the [[Csv]]/[[Jsonl]]/parquet source
  * surface with the remaining first-class columnar format Spark ships a
  * native vectorized reader for.
  *
  * Scale notes: ORC is splittable by stripe and Spark's reader is
  * vectorized with predicate pushdown (min/max stripe statistics +
  * optional bloom filters), so filters prune stripes the same way
  * parquet row-groups prune — a 100 TB ORC corpus scans like parquet,
  * no format penalty. Types (timestamp, decimal, nested) round-trip
  * natively — none of the CSV path's string re-inference applies.
  *
  * KNOWN LIMITATION (measured on this Spark/ORC pair, pinned by
  * CsvSpec): a PRE-EPOCH timestamp with a sub-second component comes
  * back shifted forward one second — ORC encodes timestamps as
  * (floor-seconds since epoch, positive nanos) and the writer/reader
  * pair disagree on the floor for negative seconds. Parquet and JSONL
  * round-trip the same values exactly. Archive pre-1970 event times
  * through parquet, or store epoch micros as a long column. */
object Orc {

  /** Read ORC; pass `schema` in production to skip the footer-sampling
    * inference pass (same contract note as [[Jsonl.read]]). */
  def read(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).orc(path)
  }

  /** Write ORC. `singleFile` mirrors [[Csv.write]]'s contract-parity
    * coalesce; drop it at scale (a directory of stripe-split part files
    * is the native shape). */
  def write(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").orc(path)
  }
}
