package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-statistical term scoring: TF-IDF keyword extraction and BM25
  * relevance — the classic lexical tools of corpus curation (keyword
  * labels per document; query-relevance filtering of a crawl against a
  * topic term list).
  *
  * Shared shape: one explode→(doc, term) aggregation for term
  * frequencies, one term-keyed aggregation for document frequencies,
  * then key joins — never a cross join, never a driver-side vocabulary.
  * Scale notes per method.
  */
object Keywords {

  private def terms(textCol: Column): Column =
    filter(TextAnalysis.tokens(textCol), t => t =!= "")

  /** Top-k TF-IDF terms per document (classic `tf · ln(N/df)`).
    *
    * Plan: tf agg (one shuffle on (id, term)) → df agg (one shuffle on
    * term) → key join tf⋈df → per-document row_number window (one
    * shuffle on id; group size = distinct terms of ONE document, so the
    * window sort is document-bounded, not corpus-bounded). N rides as a
    * scalar subquery — no extra driver action. Ties (equal tfidf —
    * common for equal tf, df) break on term order so the kept set is
    * engine-independent.
    *
    * 100 TB: every stage is keyed by (doc) or (term); the heaviest
    * intermediate is the (doc, term) pair list ≈ token count after
    * within-doc dedup. A pathologically hot TERM (stopword) makes one
    * big df group — a count, which partial-aggregates map-side; the
    * join back is term-keyed and AQE splits skewed term partitions. */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // N rides as a SCALAR SUBQUERY instead of a df.count() driver action
    // (r13 verdict #3): the count was a standalone job — a full extra
    // corpus scan per call at 100 TB, plus a driver barrier at plan-build
    // time. Dataset.scalar() keeps the whole call lazy (KeywordsSpec pins
    // zero SQL executions at build): the count executes as a subquery
    // stage of the one real action. (A broadcast equi-join on a constant
    // key was tried first and does NOT survive the optimizer: the
    // non-nullable key folds to a literal, the condition is pushed down
    // as a one-sided filter, and the join degrades to
    // BroadcastNestedLoopJoin — the node KeywordsSpec bans.)
    val nDocs = df.agg(count(lit(1)).cast(DoubleType).as("__n")).scalar()
    val tf = df
      .select(col(idCol), explode(terms(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .withColumn("tfidf",
        col("tf").cast(DoubleType) *
          log(nDocs / col("df").cast(DoubleType)))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col(idCol), col("rk"), col("term"),
        col("tf"), col("df"), col("tfidf"))
  }

  /** Okapi BM25 relevance of every document against a fixed term list
    * (k1 = 1.2, b = 0.75, Lucene's `ln(1 + (N−df+0.5)/(df+0.5))` idf —
    * nonnegative even for terms in most documents).
    *
    * Document length and its corpus average are exact integers summed
    * in double space (exact below 2^53), so `avgdl` is bit-identical
    * regardless of aggregation order — the one scalar that crosses the
    * whole corpus cannot drift between engines. The term filter lands
    * BEFORE the tf aggregation: the shuffled pair list is |query terms|
    * × docs, not the full token inventory.
    *
    * Returns every document with its score (0 for no overlap — the
    * row survives via the length join), rounded to 6 dp. */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "empty query term list")
    val lens = df.select(col(idCol),
      size(terms(col(textCol))).cast(DoubleType).as("dl"))
    // N and avgdl in ONE combined aggregation over lens (r13 verdict #3):
    // previously df.count() + avg(dl).head() were two standalone jobs —
    // two full extra corpus scans per call at 100 TB. One stat job now
    // computes both; the values still land as plan literals, so the
    // downstream plan (and hashes) are unchanged.
    val stats = lens
      .agg(count(lit(1)).cast(DoubleType).as("n"), avg(col("dl")).as("avgdl"))
      .head()
    val nDocs = stats.getDouble(0)
    val avgdl = stats.getDouble(1)
    val tf = df
      .select(col(idCol), explode(terms(col(textCol))).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast(DoubleType).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast(DoubleType).as("df"))
    val idf = log(lit(1.0) +
      (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val perTerm = tf.join(dfreq, "term")
      .join(lens, idCol)
      .select(col(idCol),
        (idf * col("tf") * (k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl)))
          .as("s"))
    lens.join(perTerm.groupBy(idCol).agg(sum(col("s")).as("score")),
        Seq(idCol), "left")
      .select(col(idCol), col("dl").cast(LongType).as("dl"),
        round(coalesce(col("score"), lit(0.0)), 6).as("score"))
  }
}
