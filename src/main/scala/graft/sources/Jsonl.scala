package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON Lines source/sink — the de-facto interchange format of LLM
  * training corpora (one JSON object per line: WebText, The Pile, Dolma,
  * FineWeb all ship this way). The reference engine is CSV-only; a
  * corpus engine without JSONL would force a conversion step in front of
  * every real dataset.
  *
  * Scale notes: single-line JSON (the default — `multiLine` stays off)
  * is SPLITTABLE, so a 100 TB corpus parallelizes across executors like
  * CSV/parquet. Pass an explicit `schema` in production: schema
  * inference samples the input with an extra scan, and two inference
  * runs over different samples can disagree on numeric widths —
  * pipelines should pin the contract, not re-derive it per run.
  */
object Jsonl {

  /** Read JSONL; with no schema, Spark infers one (extra sampling scan,
    * columns come back alphabetically ordered — select to re-order). */
  def read(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** Write JSONL, one object per line, field order = schema order.
    * `singleFile` mirrors [[Csv.write]]'s contract-parity coalesce; drop
    * it at scale (a directory of part files is the native shape). */
  def write(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").json(path)
  }
}
