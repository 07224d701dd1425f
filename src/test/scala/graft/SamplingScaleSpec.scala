package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Mega-group scale behavior of capPerGroup/topKPerGroup (r13 verdict
  * #4): Catalyst's `InferWindowGroupLimit` must keep rewriting the
  * `row_number <= k` shape into a two-phase rank — Partial
  * WindowGroupLimit before the exchange (each input partition forwards at
  * most k rows per group), Final after — so a group bigger than an
  * executor's spill budget never materializes on one partition. These
  * pins fail if a refactor breaks the rewrite's preconditions (filter no
  * longer directly above the single rank column, k above
  * `spark.sql.optimizer.windowGroupLimitThreshold`, …). */
class SamplingScaleSpec extends SparkSpec {

  // one pathological group of 2M rows plus two small ones (the verdict's
  // "≥10⁶ rows" bar): without the Partial phase the whole 2M-row group
  // crosses the exchange and sorts on ONE post-shuffle partition
  private val N = 2000000L
  private def patho: DataFrame =
    spark.range(0, N + 64).select(
      when(col("id") < N, lit("mega")).otherwise(
        when(col("id") % 2 === 0, lit("s1")).otherwise(lit("s2"))).as("g"),
      col("id").as("doc_id"),
      // a score with heavy ties plus a unique tail — exercises the
      // tie-break path through the partial phase too
      (col("id") % 1024).cast("double").as("score"))

  private def shuffleRecordsDuring(body: => Unit): Long = {
    val written = new AtomicLong(0)
    val l = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          written.addAndGet(te.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      var last = -1L
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val c = written.get()
        if (c == last) stable += 1 else { stable = 0; last = c }
      }
    } finally spark.sparkContext.removeSparkListener(l)
    written.get()
  }

  private def withRewriteDisabled[A](body: => A): A = {
    val key = "spark.sql.optimizer.windowGroupLimitThreshold"
    val prev = spark.conf.get(key)
    try { spark.conf.set(key, "-1"); body }
    finally spark.conf.set(key, prev)
  }

  test("capPerGroup: two-phase WindowGroupLimit fires and the exchange " +
      "ships ~k rows per group per partition, not the mega-group") {
    val capped = Sampling.capPerGroup(patho, "g", "doc_id", 50)
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"InferWindowGroupLimit no longer fires — whole groups would cross " +
        s"the exchange and sort on one partition:\n$plan")
    val shuffled = shuffleRecordsDuring {
      capped.write.format("noop").mode("overwrite").save()
    }
    // bound: k per group per input partition (+ AQE bookkeeping slack) —
    // the 2M-row group must NOT cross the exchange
    val parts = spark.sparkContext.defaultParallelism
    assert(shuffled < 50L * 3 * parts * 4 + 1000,
      s"exchange carried $shuffled records for a ${N + 64}-row input — " +
        "the partial rank phase is not limiting")
    assert(shuffled < (N + 64) / 100,
      s"shuffle volume $shuffled is within 100x of the input — mega-group " +
        "rows are crossing the exchange")
  }

  test("two-phase results are bit-identical to the rewrite-disabled " +
      "single-phase rank (cap and topK)") {
    val cap2 = Sampling.capPerGroup(patho, "g", "doc_id", 25)
      .orderBy("g", "doc_id").collect().toSeq
    val top2 = Sampling.topKPerGroup(patho, "g", "score", "doc_id", 25)
      .orderBy("g", "rk").collect().toSeq
    val (cap1, top1) = withRewriteDisabled {
      (Sampling.capPerGroup(patho, "g", "doc_id", 25)
         .orderBy("g", "doc_id").collect().toSeq,
       Sampling.topKPerGroup(patho, "g", "score", "doc_id", 25)
         .orderBy("g", "rk").collect().toSeq)
    }
    assert(cap2.nonEmpty && cap2 == cap1)
    assert(top2.size == 75 && top2 == top1)
  }

  test("topKPerGroup: partial phase fires for the score-ordered rank too") {
    val plan = Sampling.topKPerGroup(patho, "g", "score", "doc_id", 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      plan)
  }
}
