package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Hive-style partitioned write + partition-pruned read — the first
  * lever every 100 TB corpus pulls. A corpus laid out as
  * `path/lang=en/source=web/part-*.parquet` lets a query that filters
  * on `lang`/`source` skip whole DIRECTORIES at planning time
  * (PartitionFilters in the scan node), before any file footer is even
  * opened — the difference between scanning 100 TB and scanning the
  * 2 TB slice a training run actually mixes in. The reference engine
  * (single-CSV surface, `/root/reference/pipeline.py:131`) has no
  * analogue; this is pure engine extension surface.
  *
  * Scale design:
  *  - SMALL-FILE CONTROL. A naive `df.write.partitionBy(cols)` makes
  *    every input task open a writer for every partition value it sees:
  *    T tasks × P values → up to T·P files (the classic small-file
  *    explosion — at 1000 executors and 100 languages, 100k files per
  *    write). [[write]]'s `filesPerPartition` routes rows with ONE hash
  *    shuffle on (partitionCols, stable bucket) first, so each output
  *    directory is written by exactly `filesPerPartition` tasks —
  *    P·files files total, with the bucket hash (not task order)
  *    deciding file membership. The bucket rides on `xxhash64(bucketBy
  *    cols)`, so skew inside one partition value spreads evenly.
  *  - PRUNED READ. [[read]] discovers partitions from directory names;
  *    a filter on a partition column becomes a PartitionFilter (pruned
  *    at planning, zero I/O for pruned values) rather than a data
  *    filter. PartitionedSpec pins both: the scan node's
  *    PartitionFilters is non-empty and a one-value predicate reads
  *    only that value's files.
  *  - TYPES. Partition values live in directory NAMES (strings on
  *    disk). Spark re-infers their types on read (int-looking values
  *    come back int). For a stable contract across engines pass
  *    `inferTypes = false` — every partition column reads back string,
  *    which is also what DuckDB's hive_partitioning=1 does by default.
  */
object Partitioned {

  /** Write `df` partitioned by `partitionCols` (hive layout:
    * `path/col=value/...`).
    *
    * `filesPerPartition > 0` bounds output files at
    * values(partitionCols) × filesPerPartition by pre-shuffling on
    * (partitionCols, bucket): `bucketBy` names the columns whose hash
    * spreads rows across the partition's files (default: all
    * non-partition columns — deterministic for a given row, even
    * spread). 0 skips the shuffle (writer-side layout is whatever the
    * upstream partitioning produced — fine for one-off dumps, not for
    * a corpus written once and read thousands of times). */
  def write(df: DataFrame, path: String, partitionCols: Seq[String],
      format: String = "parquet", filesPerPartition: Int = 0,
      bucketBy: Seq[String] = Nil): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    val routed =
      if (filesPerPartition <= 0) df
      else {
        val spreadCols: Seq[String] =
          if (bucketBy.nonEmpty) bucketBy
          else df.columns.toSeq.filterNot(partitionCols.contains)
        require(spreadCols.nonEmpty,
          "no non-partition columns to bucket by; pass bucketBy")
        val bucket: Column = pmod(
          xxhash64(spreadCols.map(col): _*), lit(filesPerPartition))
        df.repartition(
          partitionCols.map(col) :+ bucket: _*)
      }
    routed.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .format(format)
      .save(path)
  }

  /** Read a hive-partitioned layout. Filters on partition columns prune
    * directories at planning time. `inferTypes = false` keeps every
    * partition column a string (the on-disk truth and the cross-engine
    * stable choice — DuckDB's hive_partitioning default); `true` uses
    * Spark's directory-name inference (int-looking values come back
    * int, date-looking come back date). An explicit `schema` overrides
    * both and also skips the data-schema inference pass.
    *
    * Inference of partition VALUE types is a session conf, not a reader
    * option, and it is consulted when `load()` builds the file index —
    * so it is set/restored around that call. The window is
    * plan-resolution only (no job runs inside it); concurrent reads on
    * the same session during that window would see the override. */
  def read(spark: SparkSession, path: String, format: String = "parquet",
      schema: Option[StructType] = None,
      inferTypes: Boolean = false): DataFrame = {
    val r = spark.read.format(format).option("basePath", path)
    val withSchema = schema.fold(r)(r.schema)
    if (schema.nonEmpty) withSchema.load(path)
    else {
      val key = "spark.sql.sources.partitionColumnTypeInference.enabled"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, inferTypes.toString)
      try withSchema.load(path)
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
