package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Interval-containment join — "every (interval, point) pair with the
  * same key and start <= t <= end". Incident-window analysis (which
  * events happened during an outage), ad-exposure attribution, genomic
  * range overlap.
  *
  * The naive Spark encoding — an inequality join `l.key = r.key AND t
  * BETWEEN start AND end` — hash-joins on the key alone and evaluates
  * the range predicate as a post-filter over every same-key pair: a hot
  * key with h intervals and p points pays h·p comparisons. This plan is
  * the standard GRID-BUCKETING decomposition: time is tiled into
  * fixed-width cells, each interval is exploded to the cells it
  * overlaps, each point falls in exactly ONE cell, and the join runs on
  * (key, cell) — a plain equi-join whose per-group work is bounded by
  * local density, not key history. Because a point has exactly one
  * cell, every qualifying pair is produced exactly once: no dedup pass.
  *
  * Cost: explode factor = len/cell + 1 per interval (choose `cellSeconds`
  * near the typical interval length: ~2 cells each); then one shuffle
  * per side on (key, cell). Skew concentrates only where (key, cell)
  * density is genuinely high — AQE's skew-join split handles that at
  * runtime. A pathologically long interval cannot silently explode the
  * plan: intervals wider than `maxCellsPerInterval` cells fail the query
  * with `raise_error` (the guard lives inside the `sequence()` bound, so
  * column pruning can never drop it).
  *
  * Intervals with null key/bounds or end < start match nothing and are
  * filtered; points with a null key or ts likewise (SQL comparison
  * semantics — a null bound can never satisfy BETWEEN).
  */
object IntervalJoin {

  /** All qualifying (interval, point) pairs: `intervals.* ++ points
    * payload` (points' key columns are dropped — equal by join). Bounds
    * and ts may be TimestampType or numeric; cells are computed in
    * epoch-seconds double space. Column names must not clash between the
    * two sides (pre-rename; keys excepted). */
  def containment(intervals: DataFrame, points: DataFrame,
      keys: Seq[String], startCol: String, endCol: String, tsCol: String,
      cellSeconds: Double, maxCellsPerInterval: Int = 4096): DataFrame = {
    require(keys.nonEmpty, "interval join needs at least one equality key")
    require(cellSeconds > 0, s"cellSeconds must be > 0, got $cellSeconds")
    require(maxCellsPerInterval >= 1,
      s"maxCellsPerInterval must be >= 1, got $maxCellsPerInterval")
    val clash = intervals.columns.toSet
      .intersect(points.columns.toSet) -- keys
    require(clash.isEmpty,
      s"both sides carry columns ${clash.mkString(", ")} — rename one side")

    def cellOf(c: Column): Column =
      floor(c.cast(DoubleType) / cellSeconds).cast(LongType)
    val c0 = cellOf(col(startCol))
    val c1 = cellOf(col(endCol))
    // the guard rides inside the sequence() upper bound: an unused
    // standalone guard column would be pruned away and never fire
    val guarded = when(c1 - c0 >= maxCellsPerInterval,
      raise_error(concat(
        lit(s"interval wider than $maxCellsPerInterval cells of " +
          s"$cellSeconds s (key "),
        concat_ws(",", keys.map(k => col(k).cast(StringType)): _*),
        lit(") — raise maxCellsPerInterval or widen cellSeconds")))
        .cast(LongType))
      .otherwise(c1)
    val iv = intervals
      .where(keys.map(col(_).isNotNull).reduce(_ && _) &&
        col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol).cast(DoubleType) >= col(startCol).cast(DoubleType))
      .withColumn("__cell", explode(sequence(c0, guarded)))
    val pt = points
      .where(keys.map(col(_).isNotNull).reduce(_ && _) &&
        col(tsCol).isNotNull)
      .withColumn("__cell", cellOf(col(tsCol)))
    iv.join(pt, keys :+ "__cell")
      .where(col(tsCol).cast(DoubleType).between(
        col(startCol).cast(DoubleType), col(endCol).cast(DoubleType)))
      .drop("__cell")
  }
}
