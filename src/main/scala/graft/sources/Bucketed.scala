package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table write + shuffle-free co-located join — the second
  * lever (after [[Partitioned]]'s directory pruning) a 100 TB layout
  * pulls: pre-hash the rows of BOTH sides of a recurring join into the
  * same bucket scheme ONCE at write time, and every later join on the
  * bucket key plans with zero Exchange — the single biggest shuffle in
  * a fact-to-fact join (lineitem⋈orders at TPC-H shapes: the whole
  * fact table over the wire, every run) is paid once at ingest instead
  * of per-query. The reference engine (single in-memory table,
  * `pipeline.py:131`) has no layout surface at all; this is pure
  * engine extension in the [[Partitioned]] family.
  *
  * Mechanics: `bucketBy(n, key)` + `sortBy(key)` + `saveAsTable`
  * records the bucket spec in the catalog; a scan of the table reports
  * `HashPartitioning(key, n)` as its output partitioning, so
  * `EnsureRequirements` inserts NO Exchange when two scans with the
  * same spec join on the key. The in-bucket sort order is recorded for
  * file-level mergeability, but Spark 3+ deliberately does not trust
  * it at scan time (`spark.sql.legacy.bucketedTableScan.outputOrdering`
  * defaults false — multi-file buckets would break it), so the
  * sort-merge join re-sorts WITHIN partitions: an in-memory per-bucket
  * sort, no shuffle — the Exchange elimination is the lever that
  * matters at scale. BucketedSpec pins exactly that: a
  * broadcast-disabled join of two co-bucketed tables whose physical
  * plan contains zero Exchange nodes.
  *
  * Scale notes:
  *  - FILE COUNT. A naive bucketed write emits one file per (input
  *    task × bucket) — the same small-file explosion [[Partitioned]]
  *    documents. [[writeTable]] repartitions by the bucket key into
  *    exactly `buckets` partitions first; Spark's repartition hash and
  *    its bucket-assignment hash are the same `HashPartitioning`
  *    (Murmur3 of the column, modulo n), so each task holds exactly
  *    one bucket's rows → exactly `buckets` files.
  *  - CATALOG. Tables register in the session catalog (in-memory —
  *    no external metastore needed) with data at an explicit external
  *    `path`; `overwrite` mode makes re-runs idempotent within and
  *    across sessions.
  *  - Bucket counts must MATCH across join sides (Spark joins tables
  *    of different bucket counts by shuffling the smaller spec's side);
  *    callers pick one n per join key family. n sizes the read-side
  *    parallelism floor: each bucket is one task's merge stream.
  */
object Bucketed {

  /** Write `df` as a parquet table bucketed AND in-bucket-sorted by
    * `bucketCol` into exactly `buckets` files at `path`, registered as
    * `table` in the session catalog. */
  def writeTable(df: DataFrame, table: String, path: String,
      buckets: Int, bucketCol: String): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    df.repartition(buckets, col(bucketCol))
      .write.format("parquet").option("path", path)
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .mode("overwrite").saveAsTable(table)
  }

  /** The co-located equi-join of two same-bucket-count tables on their
    * bucket keys. The plan is the point: with matching bucket specs on
    * both scans there is no Exchange (BucketedSpec pins it). */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable),
        col(leftKey) === col(rightKey))
}
