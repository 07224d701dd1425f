package graft.util

import org.apache.spark.sql.SparkSession

/** The caller-side half of the pair-operator cache contract
  * ([[graft.dedup.NearDup.minhashPairs]], `embeddingPairs`, `clusters`):
  * those operators eagerly materialize their small result, drop their own
  * O(corpus) intermediates, and return the result CACHED; whoever consumed
  * the result releases it. Bench and Verify run dozens of queries in one
  * session — without this sweep each pair query would leave its result
  * pinned for the session, and storage would grow with query count instead
  * of staying flat. */
object CacheHygiene {

  /** Ids of currently persisted RDDs — take before running a query. */
  def snapshot(spark: SparkSession): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Unpersist every RDD persisted since `before`; returns how many were
    * released. Non-blocking — the executors clean up asynchronously. */
  def releaseNew(spark: SparkSession, before: Set[Int]): Int = {
    val fresh = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before(id) }
    fresh.values.foreach(_.unpersist(false))
    fresh.size
  }

  /** Number of RDDs still persisted — assert 0 at the end of a harness
    * run to prove the session stayed flat. */
  def persistedCount(spark: SparkSession): Int =
    spark.sparkContext.getPersistentRDDs.size
}
