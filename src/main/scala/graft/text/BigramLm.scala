package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based bigram language model for corpus quality scoring — the
  * Spark-native analogue of CCNet's KenLM perplexity filter (Wenzek et
  * al. 2020): fit token statistics on a reference corpus, score every
  * document by average bits per bigram, drop or bucket the high-bit
  * (unnatural relative to the reference) tail. Gibberish, wrong-language
  * and boilerplate documents score high; fluent in-domain text scores
  * low.
  *
  * Model: P(w2|w1) = (c(w1,w2) + α) / (c(w1) + α·V), add-α smoothing
  * over the fitted vocabulary of size V; an unseen w1 degrades to the
  * uniform 1/V. Score = mean −log2 P over the document's bigrams (null
  * for sub-2-word documents).
  *
  * Shape at scale: fit is two count aggregations (unigram, bigram — one
  * shuffle each); scoring explodes the corpus to (doc, w1, w2) and meets
  * the two count tables in key joins — the LM tables are DataFrames, so
  * a 100 TB fit never lands on the driver, and AQE broadcasts small
  * vocabularies on its own. Tokenization is the [[TextAnalysis.tokens]]
  * convention (lower, trim, split on whitespace runs), reproducible in
  * DuckDB for the q_lm_score oracle.
  */
object BigramLm {

  final case class Fit(unigrams: DataFrame, bigrams: DataFrame,
      vocabSize: Long) {
    /** Release the persisted count frames (caller-unpersists contract —
      * the same lifecycle as the pair operators' cached results; Bench
      * and Verify sweep via CacheHygiene). */
    def release(): Unit = {
      unigrams.unpersist(false)
      bigrams.unpersist(false)
    }
  }

  private def words(c: Column): Column =
    filter(split(trim(lower(c)), "\\s+"), t => length(t) > 0)

  /** (w1, w2) adjacent-pair rows of a text column. The token array is
    * STAGED as its own projection before the pair transform: `ws` is
    * referenced twice per bigram (two element_at) plus twice for the
    * bounds, and an inline expression gets re-inlined at every reference
    * — re-running split+filter per element_at made the explode O(words²)
    * in tokenizer work (measured ~15x on the sf0.1 scoring pass when the
    * r11 filter form surfaced the real cost; the count-only bench of the
    * score form had hidden it behind join elimination). */
  private def pairs(df: DataFrame, textCol: String,
      carry: Seq[Column]): DataFrame = {
    val ws = col("__ws")
    val ps = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => struct(element_at(ws, i).as("w1"),
          element_at(ws, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    df.select(carry :+ words(col(textCol)).as("__ws"): _*)
      .select(carry :+ explode(ps).as("__p"): _*)
      .select(carry ++ Seq(col("__p.w1").as("__w1"), col("__p.w2").as("__w2")): _*)
  }

  /** Fit unigram/bigram counts + vocabulary size on a reference corpus.
    * The count frames stay distributed (only V — one long — is
    * collected) and come back PERSISTED: the vocab count materializes
    * the unigram agg, and every scoring call re-reads both tables, so an
    * unpersisted fit would re-run full reference-corpus aggregations per
    * action. Call [[Fit.release]] when done. */
  def fit(reference: DataFrame, textCol: String): Fit = {
    val uni = reference
      .select(explode(words(col(textCol))).as("__w1"))
      .groupBy("__w1").agg(count(lit(1)).as("__c_uni"))
      .persist()
    val bi = pairs(reference, textCol, Nil)
      .groupBy("__w1", "__w2").agg(count(lit(1)).as("__c_bi"))
      .persist()
    Fit(uni, bi, uni.count())
  }

  /** Per-document LM score against a fit: `n_bigrams` and
    * `bits_per_bigram` (mean −log2 P, rounded to 6; null when the
    * document has no bigram). */
  def scoreBits(corpus: DataFrame, fitted: Fit, textCol: String,
      idCol: String, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, "add-alpha smoothing needs alpha > 0")
    val docPairs = pairs(corpus, textCol, Seq(col(idCol)))
    val scored = docPairs
      .join(fitted.bigrams, Seq("__w1", "__w2"), "left")
      .join(fitted.unigrams, Seq("__w1"), "left")
      .select(col(idCol),
        (-log(2.0,
          (coalesce(col("__c_bi"), lit(0L)) + lit(alpha)) /
            (coalesce(col("__c_uni"), lit(0L)) +
              lit(alpha * fitted.vocabSize)))).as("__bits"))
    corpus.select(col(idCol)).distinct()
      .join(scored.groupBy(idCol)
          .agg(count(lit(1)).as("n_bigrams"),
            round(avg(col("__bits")), 6).as("bits_per_bigram")),
        Seq(idCol), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
  }

  /** Filter form: corpus rows scoring at or under `maxBits` (sub-2-word
    * documents have no score and are dropped — no evidence of fluency). */
  def filterByBits(corpus: DataFrame, fitted: Fit, textCol: String,
      idCol: String, maxBits: Double, alpha: Double = 0.5): DataFrame = {
    val scores = scoreBits(corpus, fitted, textCol, idCol, alpha)
      .where(col("bits_per_bigram") <= maxBits)
      .select(col(idCol))
    corpus.join(scores, Seq(idCol), "left_semi")
  }
}
