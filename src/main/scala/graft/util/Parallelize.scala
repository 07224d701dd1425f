package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Scale-adaptive parallelism for CPU-heavy per-row kernels (r21,
  * guide §2: derive partitioning from input size, don't hard-code either
  * the local or the cluster shape).
  *
  * A narrow plan inherits the scan's split count, and a split exists only
  * per `spark.sql.files.maxPartitionBytes` of input — so a small table
  * feeds an expensive per-row kernel (minhash/winnow signatures, k-gram
  * explosion) with fewer tasks than the session has cores: measured at
  * sf0.1/32 cores, the whole minhash signature pass ran as 6 tasks (26
  * cores idle), the substring-dedup gram pipeline as 3.
  *
  * [[bySize]] hash-repartitions on the row id to the default parallelism
  * ONLY when the optimizer's size estimate proves the scan cannot reach
  * it (estimated bytes < cores × maxPartitionBytes). The condition makes
  * the shuffle self-limiting: it can only fire when the whole input is
  * smaller than one split per core — data a 100 TB run's scan splits
  * thousands of ways never qualifies, so production plans are unchanged
  * and no heavy payload gains a shuffle (§2.4). Hash-on-id is
  * deterministic under retries (no round-robin, no rand — SPARK-38388).
  */
object Parallelize {

  /** `df` repartitioned to the session default parallelism on `idCol`
    * when the size estimate says the plan is under-parallel (see object
    * doc); `df` unchanged otherwise. */
  def bySize(df: DataFrame, idCol: String): DataFrame =
    bySize(df, col(idCol))

  /** [[bySize]] keyed by an arbitrary deterministic column — for inputs
    * with no id column (e.g. word-count passes hash on the text itself). */
  def bySize(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // r22 (r21 ADVICE): read the conf of the DataFrame's OWN session —
    // SQLConf.get is the thread-local active session, which can differ
    // when ops run from another thread or a cloned session.
    val splitBytes = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val fire = estBytes < BigInt(target.toLong) * splitBytes
    // r22 (r21 ADVICE): say when the gate fires/skips so a plan without
    // reliable stats (post-join/UDF sizeInBytes can be huge) that
    // silently never repartitions is attributable from the logs.
    log.info(s"bySize gate ${if (fire) "FIRES" else "skips"}: est=$estBytes" +
      s" vs $target x $splitBytes")
    if (fire) df.repartition(target, key)
    else df
  }

  private lazy val log =
    org.slf4j.LoggerFactory.getLogger(Parallelize.getClass)
}
