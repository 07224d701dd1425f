package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Test-set decontamination: flag corpus documents sharing any word
  * n-gram with a benchmark/eval set (the GPT-3 appendix-C / Llama data
  * prep step — training on eval text inflates benchmark scores, so
  * overlapping documents are dropped or split before training).
  *
  * Shape at scale: both sides explode to (id, gram-HASH) and meet in one
  * shuffle keyed by the 64-bit gram hash — the corpus never joins the
  * benchmark row-wise, gram strings never travel (xxhash64 collisions at
  * ~2^-64 would FLAG a clean doc, the safe direction), and the hit list
  * is a distinct id set joined back to the corpus. When the benchmark
  * gram set is small (the common case — eval sets are thousands of
  * docs), AQE broadcasts it and the corpus-side explode never shuffles
  * at all.
  *
  * Tokenization is the [[QualityFilters]] / [[TextAnalysis.tokens]]
  * convention (lower, trim, split on whitespace runs), so the oracle can
  * rebuild grams externally. Default n = 13 follows GPT-3; the oracle
  * query uses a smaller n because its corpus plants short documents.
  */
object Decontaminate {

  /** All word n-grams of a text column as an array (empty when the text
    * has fewer than n words). The sequence bound is guarded: Spark's
    * `sequence(1, 0)` counts DOWN ([1, 0]) instead of yielding empty. */
  def wordNgrams(c: Column, n: Int): Column = {
    val toks = filter(split(trim(lower(c)), "\\s+"), t => length(t) > 0)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Corpus + a `contaminated` boolean: true when the document shares at
    * least one word n-gram with any benchmark document. */
  def flagContaminated(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 13): DataFrame = {
    val corpusGrams = corpus.select(col(idCol),
      explode(wordNgrams(col(textCol), n)).as("__g"))
      .select(col(idCol), xxhash64(col("__g")).as("__gh"))
    val benchGrams = benchmark
      .select(explode(wordNgrams(col(textCol), n)).as("__g"))
      .select(xxhash64(col("__g")).as("__gh")).distinct()
    val hits = corpusGrams.join(benchGrams, Seq("__gh"), "left_semi")
      .select(idCol).distinct()
      .withColumn("__hit", lit(true))
    corpus.join(hits, Seq(idCol), "left")
      .withColumn("contaminated", coalesce(col("__hit"), lit(false)))
      .drop("__hit")
  }

  /** The filter form: corpus rows NOT sharing an n-gram with the
    * benchmark — what an ingest pipeline actually keeps. */
  def removeContaminated(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 13): DataFrame =
    flagContaminated(corpus, benchmark, textCol, idCol, n)
      .where(!col("contaminated")).drop("contaminated")
}
