package graft.plans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import graft.util.Exprs

/** Distributed forward/backward fill — the 100 TB path for the reference's
  * `ffill()`/`bfill()` (`/root/reference/methods/missingValues.py:159-165`,
  * SURVEY.md §2.5, §7.4).
  *
  * The oracle-exact default in [[graft.ops.MissingValues]] uses a global
  * unpartitioned window: one task sorts everything — fine at test scale,
  * impossible at 1000 executors. This plan keeps the exact same semantics
  * with no single-task stage:
  *
  *  1. `repartitionByRange(n, orderCol)` + `sortWithinPartitions` — Spark's
  *     range partitioner samples the key, so partitions tile the global
  *     order; each sorts locally in parallel.
  *  2. Pass 1 (tiny output): per partition, the LAST non-null raw value of
  *     every fillable column — n rows collected to the driver.
  *  3. Driver prefix-scan: carry(p) = last non-null among partitions < p —
  *     exactly the value a fill crossing the boundary must see; O(n·cols),
  *     n = numPartitions, negligible.
  *  4. Pass 2: per-partition scan-carry fill seeded with the broadcast
  *     carry(p) — embarrassingly parallel, one row at a time, no window.
  *
  * Backward fill is the same algorithm over the reversed range order.
  * Cost: ONE range-shuffle+sort — the sorted RDD is staged DISK_ONLY
  * (the NearDup convention for corpus-sized intermediates) before pass 1,
  * whose collect materializes every partition, so pass 2 reads the staged
  * copy instead of re-shuffling the table. The staged RDD follows the
  * caller-unpersists contract ([[graft.util.CacheHygiene]]): Bench and
  * Verify sweep it after consuming the result; an unswept copy ages out
  * with the app, and re-evaluating the result after a sweep just
  * recomputes the lineage. The per-row loop is genuine per-partition
  * imperative logic — the one place SURVEY.md §7.4 calls for dropping
  * below the DataFrame API.
  */
object PartitionedFill {

  def ffill(df: DataFrame, orderCol: String, cols: Seq[String] = Nil,
      numPartitions: Int = 0): DataFrame =
    fill(df, orderCol, forward = true, cols, numPartitions)

  def bfill(df: DataFrame, orderCol: String, cols: Seq[String] = Nil,
      numPartitions: Int = 0): DataFrame =
    fill(df, orderCol, forward = false, cols, numPartitions)

  private def fill(df: DataFrame, orderCol: String, forward: Boolean,
      cols: Seq[String], numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val key = if (forward) col(orderCol).asc else col(orderCol).desc
    val sorted = df.repartitionByRange(n, key).sortWithinPartitions(key)
    val schema = df.schema
    val targets: Set[String] =
      if (cols.nonEmpty) cols.toSet
      else schema.fields.collect {
        case f if f.name != orderCol && Exprs.isAtomic(f.dataType) => f.name
      }.toSet
    val fillIdx: Array[Int] = schema.fields.zipWithIndex
      .collect { case (f, i) if targets(f.name) => i }

    // ONE shuffle+sort for both passes: pass 1's collect touches every
    // partition, so the DISK_ONLY staging is fully written before pass 2
    // reads it — at 100 TB the second range-shuffle this replaces IS the
    // dominant cost of the operator
    val sortedRdd = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)

    // pass 1: last non-null per column per partition (raw values — the
    // carry INTO partition p is by definition a raw value from before it)
    val lasts: Map[Int, Array[Any]] = sortedRdd.mapPartitionsWithIndex {
      (pid, it) =>
        val last = Array.fill[Any](fillIdx.length)(null)
        it.foreach { r =>
          var j = 0
          while (j < fillIdx.length) {
            val v = r.get(fillIdx(j)); if (v != null) last(j) = v; j += 1
          }
        }
        Iterator.single((pid, last))
    }.collect().toMap

    // driver prefix-scan over partition index. The range partitioner may
    // create FEWER partitions than requested (few distinct keys) — size to
    // what actually exists.
    val actualN = lasts.size
    val carry = Array.fill(actualN)(Array.fill[Any](fillIdx.length)(null))
    for (p <- 1 until actualN; j <- fillIdx.indices) {
      val prev = lasts(p - 1)(j)
      carry(p)(j) = if (prev != null) prev else carry(p - 1)(j)
    }
    val bc = spark.sparkContext.broadcast(carry)

    // pass 2: seeded scan-carry fill, reading the staged sort
    val filled = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      val cur = bc.value(pid).clone()
      it.map { r =>
        val vals = r.toSeq.toArray
        var j = 0
        while (j < fillIdx.length) {
          val i = fillIdx(j)
          if (vals(i) == null) vals(i) = cur(j) else cur(j) = vals(i)
          j += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }
    spark.createDataFrame(filled, schema)
  }
}
