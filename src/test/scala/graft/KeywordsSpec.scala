package graft

import org.apache.spark.sql.functions._
import graft.text.Keywords

/** TF-IDF / BM25 semantics on a hand-computed corpus. */
class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  // 3 docs: "cat" in 1 doc, "dog" in 2, "the" in all 3 (idf = 0)
  private def docs = Seq(
    (1L, "the cat cat sat"),
    (2L, "the dog sat sat"),
    (3L, "The Dog  ran")).toDF("doc_id", "text")

  test("tfidfTopK: classic tf*ln(N/df), ties break on term") {
    val out = Keywords.tfidfTopK(docs, "doc_id", "text", k = 2)
      .select($"doc_id", $"rk", $"term", $"tfidf")
      .orderBy("doc_id", "rk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    // Spark's Log expression evaluates via StrictMath (platform-stable),
    // which differs from Math.log by 1 ulp for some inputs
    val ln3 = StrictMath.log(3.0)
    val ln32 = StrictMath.log(1.5)
    // doc1: cat 2*ln(3)=2.20, sat 1*ln(3/2)=0.405, the 0 → [cat, sat]
    // doc2: sat 2*ln(3/2)=0.81, dog 1*ln(3/2)=0.405 → [sat, dog]
    // doc3: ran 1*ln(3), dog 1*ln(3/2) → [ran, dog]
    assert(out.toSeq == Seq(
      (1L, 1, "cat", 2 * ln3), (1L, 2, "sat", ln32),
      (2L, 1, "sat", 2 * ln32), (2L, 2, "dog", ln32),
      (3L, 1, "ran", ln3), (3L, 2, "dog", ln32)))
  }

  test("bm25: hand-computed scores, zero-overlap docs survive at 0") {
    val out = Keywords.bm25(docs, "doc_id", "text", Seq("dog"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // N=3, df(dog)=2 → idf = ln(1 + 1.5/2.5); dl = 4,4,3; avgdl = 11/3
    val idf = math.log(1 + 1.5 / 2.5)
    def s(tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (11.0 / 3)))
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(
      (1L, 4L, 0.0), (2L, 4L, r6(s(1, 4))), (3L, 3L, r6(s(1, 3)))))
  }

  test("keyword plans: key joins only, no cartesian product") {
    val plan = Keywords.tfidfTopK(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      plan)
    val plan2 = Keywords.bm25(docs, "doc_id", "text", Seq("dog"))
      .queryExecution.executedPlan.toString
    assert(!plan2.contains("Cartesian") &&
      !plan2.contains("BroadcastNestedLoop"), plan2)
  }

  test("stat-action budget: tfidf builds lazily, bm25 pays ONE stat " +
      "action (r13 verdict #3)") {
    // Before r14 each call paid standalone driver actions (tfidf:
    // df.count(); bm25: count() + avg(dl).head()) — full extra corpus
    // scans per call at 100 TB. Pin the fixed budget by counting SQL
    // executions (one per action; a single action may span several Spark
    // jobs under AQE) started while BUILDING the frame.
    def actionsDuring(body: => Unit): Int = {
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
        body
        // the listener bus is async (and private); drain by polling the
        // counter until it holds still for 300 ms
        var last = -1
        var stable = 0
        while (stable < 3) {
          Thread.sleep(100)
          val c = counter.get()
          if (c == last) stable += 1 else { stable = 0; last = c }
        }
      } finally spark.sparkContext.removeSparkListener(l)
      counter.get()
    }
    assert(actionsDuring { Keywords.tfidfTopK(docs, "doc_id", "text", 3) } == 0,
      "tfidfTopK must not launch driver actions at build (N rides as a " +
        "scalar subquery)")
    val bm = actionsDuring { Keywords.bm25(docs, "doc_id", "text", Seq("dog")) }
    assert(bm == 1,
      s"bm25 must pay exactly ONE combined (N, avgdl) stat action, saw $bm")
  }
}
