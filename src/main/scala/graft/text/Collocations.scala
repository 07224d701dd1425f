package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pointwise-mutual-information bigram collocations — phrase mining
  * over a corpus ("new york", "machine learning"): the vocabulary-
  * induction step of tokenizer training (a BPE/WordPiece merge is
  * chosen by exactly this kind of pair-association statistic) and the
  * classic first pass of phrase-aware indexing. The reference engine
  * has no corpus-statistical surface at all (its text analysis is
  * per-cell cleaning, `methods/text_cleaning.py`); this extends the
  * TF-IDF/BM25/bigram-LM family in [[Keywords]]/[[BigramLm]] with the
  * association-scoring member.
  *
  * PMI(w1, w2) = ln( P(w1 w2) / (P(w1) · P(w2)) ) with
  * P(w1 w2) = c(w1,w2)/N_bi over adjacent pairs and P(w) = c(w)/N_uni
  * over tokens. Rare-pair noise (two hapaxes adjacent once have huge
  * PMI) is handled the standard way: pairs below `minCount` are
  * dropped BEFORE scoring.
  *
  * Determinism: counts are exact integers; the two corpus totals are
  * integer-valued doubles (exact below 2^53, safe for any real corpus's
  * token count), so the PMI ratio is bit-stable across engines up to
  * one `ln` — rounded to 6 dp on both sides, with (w1, w2) breaking
  * score ties, exactly the repo-wide ulp-drift convention.
  *
  * 100 TB shape: one explode→unigram agg (shuffle on token), one
  * pair-explode→bigram agg (shuffle on pair) — both partial-aggregate
  * map-side, so the shuffled volume is the DISTINCT vocabulary /
  * pair-vocabulary, not the token stream; the `minCount` filter lands
  * between the bigram agg and the joins, so the two unigram joins key
  * on the (much smaller) surviving pair set; totals ride as scalar
  * subqueries (no extra driver action, same as [[Keywords.tfidfTopK]]);
  * the final top-k is a TakeOrdered (per-partition heads, never a
  * global sort materialization). A stopword pair ("of the") has a huge
  * count but LOW PMI — hot keys cost one map-side-combined count each,
  * and AQE splits any skewed join partition.
  */
object Collocations {

  /** Top-`k` adjacent-word bigrams by PMI among those seen at least
    * `minCount` times: (w1, w2, n_pair, pmi), ordered by
    * (pmi desc, w1, w2). Tokenization is the repo-standard
    * whitespace-split of lowercased trimmed text (empty tokens
    * dropped) — identical to [[BigramLm]] and [[Keywords]]. */
  def pmiTopK(df: DataFrame, textCol: String, minCount: Long,
      k: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    val ws = filter(split(trim(lower(col(textCol))), "\\s+"),
      t => length(t) > 0)
    // token stream staged once (same O(words²) re-inline hazard
    // BigramLm documents: element_at re-runs an inlined split per call)
    val toks = df.select(ws.as("__ws"))
    val uni = toks.select(explode(col("__ws")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c_uni"))
    val pairCol = when(size(col("__ws")) >= 2,
      transform(sequence(lit(1), size(col("__ws")) - 1),
        i => struct(element_at(col("__ws"), i).as("w1"),
          element_at(col("__ws"), i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val bi = toks.select(explode(pairCol).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minCount)
    val nUni = uni.agg(sum("__c_uni").cast(DoubleType).as("__n")).scalar()
    val nBi = toks.select(
        greatest(size(col("__ws")) - 1, lit(0)).cast(LongType).as("__nb"))
      .agg(sum("__nb").cast(DoubleType).as("__n")).scalar()
    bi.join(uni.withColumnRenamed("__w", "w1")
          .withColumnRenamed("__c_uni", "__c1"), "w1")
      .join(uni.withColumnRenamed("__w", "w2")
          .withColumnRenamed("__c_uni", "__c2"), "w2")
      .select(col("w1"), col("w2"), col("n_pair"),
        round(log(col("n_pair").cast(DoubleType) * nUni * nUni /
          (nBi * col("__c1").cast(DoubleType) *
            col("__c2").cast(DoubleType))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
