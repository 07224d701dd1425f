package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling
import graft.text.{Collocations, InvertedIndex}

/** Value-level pins for the r17 corpus-statistics additions: weighted
  * sampling without replacement, PMI collocations, inverted-index
  * postings. Each test checks hand-computable ground truth on a tiny
  * frame plus the property that makes the operator scale-safe. */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  // ---- weighted sampling -------------------------------------------------

  test("weightedSample: k rows, no duplicates, deterministic, " +
      "null/non-positive weights excluded") {
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "w")
      .union(Seq((101L, -1.0), (102L, 0.0)).toDF("id", "w"))
      .union(Seq((103L, Option.empty[Double])).toDF("id", "w"))
    val a = Sampling.weightedSample(df, "id", "w", k = 10)
      .select("id").as[Long].collect().toSeq
    val b = Sampling.weightedSample(df, "id", "w", k = 10)
      .select("id").as[Long].collect().toSeq
    assert(a.length == 10 && a.distinct.length == 10)
    assert(a.sorted == b.sorted, "same salt must draw the same sample")
    assert(!a.exists(id => id >= 101L), "invalid-weight rows must not draw")
  }

  test("weightedSample: selection is weight-sensitive and repartition-" +
      "invariant, and k > n returns every valid row") {
    // one row with overwhelming weight is drawn essentially surely:
    // P(miss) <= (expected) 50/1e9-ish across the 50-of-100 draw
    val df = ((1L to 99L).map(i => (i, 1.0)) :+ (100L, 1e9))
      .toDF("id", "w")
    val ids = Sampling.weightedSample(df, "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    assert(ids.contains(100L), "a 1e9-weight row must be in a 50-draw")
    val one = Sampling.weightedSample(df.repartition(7), "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    assert(one == ids, "kept set must not depend on partitioning")
    val all = Sampling.weightedSample(df, "id", "w", k = 500)
    assert(all.count() == 100L)
  }

  test("weightedSample plans as TakeOrdered (per-partition heaps, " +
      "no global sort materialization)") {
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "w")
    val p = Sampling.weightedSample(df, "id", "w", k = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  // ---- PMI collocations --------------------------------------------------

  test("pmiTopK: hand-computed PMI, minCount filter, tie-break order") {
    // corpus: "a b" x3, "a c" x1  => tokens: a:4 b:3 c:1, N_uni=8
    // bigrams: (a,b):3, (a,c):1, N_bi=4
    val df = Seq("a b", "a b", "a b", "a c").toDF("text")
    val out = Collocations.pmiTopK(df, "text", minCount = 1L, k = 10)
      .collect()
    assert(out.length == 2)
    val ab = out.find(r => r.getString(0) == "a" && r.getString(1) == "b").get
    assert(ab.getLong(2) == 3L)
    // pmi(a,b) = ln(3 * 8 * 8 / (4 * 4 * 3)) = ln(4)
    assert(math.abs(ab.getDouble(3) - math.log(4.0)) < 1e-6)
    val ac = out.find(r => r.getString(0) == "a" && r.getString(1) == "c").get
    // pmi(a,c) = ln(1 * 64 / (4 * 4 * 1)) = ln(4) — equal score: tie
    // breaks on (w1, w2), so (a,b) sorts before (a,c)
    assert(ac.getDouble(3) == ab.getDouble(3))
    assert(out(0).getString(1) == "b" && out(1).getString(1) == "c")
    // minCount drops the hapax pair
    val filtered = Collocations.pmiTopK(df, "text", minCount = 2L, k = 10)
      .collect()
    assert(filtered.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "b")))
  }

  test("pmiTopK is lazy at build (totals ride as scalar subqueries, " +
      "no driver count action)") {
    // same listener pattern as KeywordsSpec's stat-action budget: count
    // SQL executions started while BUILDING the frame — must be zero
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case _: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          counter.incrementAndGet()
        case _ => ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      Collocations.pmiTopK(Seq("x y").toDF("text"), "text", 1L, 5)
      var last = -1; var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val c = counter.get()
        if (c == last) stable += 1 else { stable = 0; last = c }
      }
      assert(counter.get() == 0, "plan build must launch zero SQL executions")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  // ---- inverted index ----------------------------------------------------

  test("postings: sorted ascending ids, within-doc dedup, fractional " +
      "df window drops rare and stop terms") {
    val df = Seq(
      (30L, "apple banana apple"), // apple dedups within doc
      (2L, "apple cherry"),
      (1L, "banana cherry stop"),
      (4L, "stop stop"),
      (5L, "stop"),
      (6L, "stop")).toDF("doc_id", "text")
    // 6 docs; window [0.3, 0.55] → df in (1.8, 3.3) → df 2 and 3 kept
    val out = InvertedIndex.postings(df, "doc_id", "text",
        minDfFrac = 0.3, maxDfFrac = 0.55)
      .orderBy("term").collect()
    // df: apple 2, banana 2, cherry 2, stop 4 (stopword — dropped)
    assert(out.map(_.getString(0)).toSeq == Seq("apple", "banana", "cherry"))
    val apple = out(0)
    assert(apple.getLong(1) == 2L)
    assert(apple.getSeq[Long](2) == Seq(2L, 30L),
      "postings must be ascending NUMERIC ids (not lexicographic)")
    assert(out(1).getSeq[Long](2) == Seq(1L, 30L))
  }

  test("phrasePostings: adjacent-word phrase terms with the same " +
      "window and ordering contract") {
    val df = Seq(
      (1L, "big data join"),
      (2L, "big data scan"),
      (3L, "slow scan")).toDF("doc_id", "text")
    val out = InvertedIndex.phrasePostings(df, "doc_id", "text",
        minDfFrac = 0.5, maxDfFrac = 1.0)
      .collect()
    // phrase df: "big data" 2, others 1 — only "big data" in [1.5, 3]
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
      .toSeq == Seq(("big data", 2L, Seq(1L, 2L))))
  }

  test("postings: the df filter lands before list assembly " +
      "(count agg upstream of the join, no corpus-wide collect)") {
    val df = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val p = InvertedIndex.postings(df, "doc_id", "text", 0.0, 1.0)
      .queryExecution.optimizedPlan.toString
    // the degenerate-term guard: df counting aggregates BEFORE any
    // collect_list in the plan tree (reading bottom-up, count's agg is
    // deeper than the list agg)
    assert(p.indexOf("collect_list") < p.lastIndexOf("count(1)"),
      s"df count must aggregate upstream of list assembly:\n$p")
  }
}
