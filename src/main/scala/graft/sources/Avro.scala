package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Avro source/sink — the row-oriented interchange format of the Kafka /
  * stream-ingest side of the lake (schema-registry payloads, CDC topics,
  * cross-language event archives). Completes the source surface next to
  * [[Csv]] (spreadsheets), [[Jsonl]] (LLM corpora), [[Orc]] (Hive
  * warehouses) and parquet (the native analytical store): a corpus
  * engine that cannot read an Avro archive forces a conversion step in
  * front of every Kafka-sourced dataset.
  *
  * Registered by fully-qualified class name: this distribution bundles
  * the Avro module's classes but not its `DataSourceRegister` service
  * entry, so the short name `format("avro")` does not resolve while the
  * FQCN does (pinned in CsvSpec).
  *
  * Scale notes: Avro files are splittable on sync markers and the
  * format is row-oriented — fine for ingest/interchange, wrong for
  * analytical scans (no column pruning or predicate pushdown; a
  * projection still reads whole rows). The intended 100 TB pattern is
  * the one real pipelines use: land Avro from the stream side, convert
  * once to parquet for repeated analytics. Types round-trip natively:
  * timestamps are `timestamp-micros` logical types (exact micros, no
  * pre-epoch quirk — unlike the ORC pair, see `Orc.scala`), doubles and
  * longs are direct.
  */
object Avro {

  private val Format = "org.apache.spark.sql.avro.AvroFileFormat"

  /** Read Avro; pass `schema` in production to skip the
    * reader-schema-from-file inference pass (same contract note as
    * [[Jsonl.read]]). */
  def read(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.format(Format)
    schema.fold(r)(s => r.schema(s)).load(path)
  }

  /** Write Avro. `singleFile` mirrors [[Csv.write]]'s contract-parity
    * coalesce; drop it at scale (a directory of sync-marker-split part
    * files is the native shape). */
  def write(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.format(Format).mode("overwrite").save(path)
  }
}
