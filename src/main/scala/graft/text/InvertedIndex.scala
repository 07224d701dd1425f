package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Inverted-index materialization: term → sorted posting list of the
  * documents containing it — the retrieval-side artifact a curated
  * corpus ships with (BM25 search, contamination lookups, "which docs
  * mention X" audits all read postings, not documents). [[Keywords]]
  * SCORES terms per document; this materializes the transposed view.
  * Two term granularities: single words ([[postings]]) and adjacent-
  * word phrases ([[phrasePostings]] — the phrase-query index, and the
  * granularity with a discriminating document frequency on small
  * vocabularies). No analogue in the reference engine (per-cell text
  * cleaning only).
  *
  * Scale design — the whole problem is the degenerate term:
  *  - A stopword's posting list at corpus scale is the corpus itself
  *    (billions of ids in ONE group — unbuildable and useless). The
  *    standard IR answer is a document-frequency window, here
  *    FRACTIONAL (df/N ∈ [minDfFrac, maxDfFrac]) so the same call is
  *    meaningful at every corpus size: terms above the ceiling are
  *    stopwords, terms below the floor are noise. Pass 1 aggregates df
  *    counts only (longs, partial map-side — a hot term costs one
  *    count, never a list); the window filters that small term table;
  *    only SURVIVING terms' pairs reach the pass-2 list build, so the
  *    largest possible assembled group is maxDfFrac·N ids by
  *    construction.
  *  - The (doc, term) pair stream dedups within-document FIRST
  *    (array_distinct before the explode — no shuffle), so both passes
  *    key on the within-doc-distinct pair set, not the token stream.
  *  - Postings ship as an ascending array<bigint>: sorted for
  *    mergeability (two index shards union by term + merge-sort
  *    postings) and kept NUMERIC end to end — r17 shipped them as a
  *    comma-joined string, which paid for the id bytes twice (decimal
  *    rendering during assembly, then the widened string through the
  *    shuffle and the sink) and was the posting-payload term behind
  *    the super-linear sf10 step (3.6× at ×3.33 data). The array form
  *    shuffles 8-byte longs and lets a columnar sink delta-encode the
  *    sorted run.
  *  - N rides as a scalar subquery (no driver count action, the
  *    [[Keywords.tfidfTopK]] pattern); the window bounds are the
  *    IDENTICAL double products on both engines, so an exactly-on-
  *    boundary df decides the same way everywhere.
  *
  * Shuffles: pair-distinct agg, df agg, the term-keyed filter join
  * (broadcast when the surviving vocabulary is small; AQE decides),
  * list-assembly agg — all term- or pair-keyed, nothing corpus-global.
  */
object InvertedIndex {

  private def words(textCol: Column): Column =
    filter(split(trim(lower(textCol)), "\\s+"), t => length(t) > 0)

  /** Adjacent-word phrases ("data join") of a text column — staged
    * token array, the [[BigramLm]] pair shape. */
  private def phraseTerms(ws: Column): Column =
    when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** (term, df, postings) over single-word terms. */
  def postings(df: DataFrame, idCol: String, textCol: String,
      minDfFrac: Double, maxDfFrac: Double): DataFrame =
    build(df, idCol, words(col(textCol)), minDfFrac, maxDfFrac)

  /** (term, df, postings) over adjacent-word phrases. */
  def phrasePostings(df: DataFrame, idCol: String, textCol: String,
      minDfFrac: Double, maxDfFrac: Double): DataFrame = {
    val staged = df.select(col(idCol), words(col(textCol)).as("__ws"))
    build(staged, idCol, phraseTerms(col("__ws")), minDfFrac, maxDfFrac)
  }

  private def build(df: DataFrame, idCol: String, termsCol: Column,
      minDfFrac: Double, maxDfFrac: Double): DataFrame = {
    require(minDfFrac >= 0 && maxDfFrac >= minDfFrac && maxDfFrac <= 1.0,
      s"need 0 <= minDfFrac <= maxDfFrac <= 1, got [$minDfFrac, $maxDfFrac]")
    val nDocs = df.agg(count(lit(1)).cast(DoubleType).as("__n")).scalar()
    val pairs = df.select(col(idCol).as("__id"),
      explode(array_distinct(termsCol)).as("term"))
    val dfreq = pairs.groupBy("term")
      .agg(count(lit(1)).as("df"))
      .where(col("df").cast(DoubleType) >= lit(minDfFrac) * nDocs &&
        col("df").cast(DoubleType) <= lit(maxDfFrac) * nDocs)
    pairs.join(dfreq, "term")
      .groupBy("term", "df")
      .agg(array_sort(collect_list(col("__id"))).as("postings"))
      .select(col("term"), col("df"), col("postings"))
  }
}
