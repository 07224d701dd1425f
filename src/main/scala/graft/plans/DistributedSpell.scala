package graft.plans

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.TypoFix

/** Distributed corpus spell-check — the 100 TB path for the reference's
  * `spell_check` (`/root/reference/methods/spellingFix.py:201-268`,
  * SURVEY.md §7.5 item 5).
  *
  * [[graft.ops.TypoFix]] builds the correction map on the driver: every
  * rare word is compared against the whole vocabulary — O(rare·vocab)
  * with both sets collected. Here the same map is computed distributed:
  *
  *  1. word frequencies: one explode → groupBy (the corpus never leaves
  *     the cluster).
  *  2. vocabulary = words with frequency > 1 (reference rule); correction
  *     candidates = rare (frequency 1) words longer than 2 chars.
  *  3. blocking: three deterministic key passes — 2-char prefix, 2-char
  *     suffix, sorted-character multiset — unioned. A single-edit typo
  *     (substitution, insertion, deletion, transposition) always shares
  *     at least one key with its correction: an edit at position ≥ 2
  *     keeps the prefix, an edit before the last two chars keeps the
  *     suffix, and a transposition keeps the character multiset. (Bigram
  *     MinHash banding — right for multi-word values in
  *     [[DistributedFuzzy]] — fails here: a transposition can leave two
  *     short words sharing one bigram, e.g. sprak/spark at bigram-Jaccard
  *     0.14 but Ratcliff 0.8.) Keys carry a width-3 length band so the
  *     |Δlen| ≤ 2 constraint prunes at the JOIN KEY, bounding the
  *     worst-case block; the reference's |Δlen| ≤ 2 prefilter still
  *     applies exactly at the join. Coverage bound: the three keys are
  *     provably complete for SINGLE-edit pairs; a multi-edit pair that a
  *     low threshold admits on long words (levSim ≥ 0.8 allows 2 edits
  *     from length 10) can miss all three blocks. The all-pairs oracle
  *     twins (q_spell_corrections / q_typofix_spell_lev) re-derive the
  *     map exhaustively, so any such divergence on real data surfaces as
  *     a correctness diff rather than silently.
  *  4. per rare word: the most similar vocabulary word with ratio ≥
  *     threshold (tie: lexicographically smallest — the reference's
  *     deterministic sort), via one window.
  *
  * The map application (one tokenizing broadcast-map pass) is identical
  * to the driver path. The reference's empty-vocabulary fallback
  * (top-50 words when nothing repeats) is intentionally dropped: at
  * corpus scale the vocabulary is never empty, and the fallback would
  * need a global ordering pass.
  */
object DistributedSpell {

  /** Ratcliff/Obershelp similarity as a column expression (difflib parity,
    * the reference's metric) — a UDF, since the recursive LCS decomposition
    * has no expression-language form. */
  val ratcliffSim: (Column, Column) => Column = {
    val u = udf { (a: String, b: String) => TypoFix.ratio(a, b) }
    (a, b) => u(a, b)
  }

  /** Normalized-edit-distance similarity 1 − lev/maxLen. Unlike Ratcliff,
    * `levenshtein` is a native function in Spark AND in external SQL
    * engines (DuckDB, Trino, Postgres with fuzzystrmatch), so a correction
    * map built with this metric is value-checkable end to end by an
    * independent engine — and it is codegen'd, no UDF. */
  val levSim: (Column, Column) => Column = (a, b) =>
    lit(1.0) - levenshtein(a, b).cast(DoubleType) /
      greatest(length(a), length(b)).cast(DoubleType)

  /** Correction map (`__from` rare word, `__to` vocab word), distributed.
    * `maxCorrections` bounds the applied map (reference takes 500, in word
    * order — rare words all tie at frequency 1); `sim` is the similarity
    * metric (default: the reference's Ratcliff ratio). */
  def corrections(df: DataFrame, c: String, threshold: Double = 0.8,
      maxCorrections: Int = 500,
      sim: (Column, Column) => Column = ratcliffSim): DataFrame = {
    val words = df
      .select(explode(split(lower(col(c).cast(StringType)), "\\W+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
    // Every key carries a length band (width 3): the |Δlen| ≤ 2 join
    // constraint means a match sits in the same or an adjacent band
    // (bands are wider than the max length gap), so the rare side fans
    // out to bands b−1..b+1 while the vocab side keys once per word.
    // Without the band, one 2-char prefix ("th") collects the whole
    // "th…" vocabulary into a single block; with it, worst-case blocks
    // are bounded by prefix × band. Fan-out lives on the RARE side —
    // the small set by construction (frequency-1 words).
    def keyed(side: DataFrame, prefix: String, fanOut: Boolean): DataFrame = {
      val w = col("w")
      val band = floor(length(w) / 3).cast(LongType)
      val bands = if (fanOut) Seq(band - 1, band, band + 1) else Seq(band)
      val baseKeys = Seq(
        concat(lit("p:"), substring(w, 1, 2)),
        concat(lit("s:"), substring(w, -2, 2)),
        concat(lit("c:"), array_join(array_sort(split(w, "")), "")))
      val keys = for { k <- baseKeys; b <- bands }
        yield concat(k, lit("#"), b.cast(StringType))
      side.select(w.as(s"${prefix}w"),
        explode(array(keys: _*)).as(s"${prefix}k"))
    }
    val vocab = keyed(words.where(col("n") > 1), "v", fanOut = false)
    val rare = keyed(
      words.where(col("n") === 1 && length(col("w")) > 2), "r", fanOut = true)
    val cand = rare.join(vocab,
        col("rk") === col("vk") &&
          abs(length(col("rw")) - length(col("vw"))) <= 2)
      .select(col("rw"), col("vw")).distinct()
      .withColumn("__ratio", sim(col("rw"), col("vw")))
      .where(col("__ratio") >= threshold)
    val pick = Window.partitionBy("rw")
      .orderBy(col("__ratio").desc, col("vw").asc)
    cand.withColumn("__rk", row_number().over(pick))
      .where(col("__rk") === 1)
      .select(col("rw").as("__from"), col("vw").as("__to"))
      .orderBy("__from").limit(maxCorrections)
  }

  /** Rewrite the column through the correction map, word-boundary,
    * case-insensitive — one tokenizing broadcast-map pass
    * ([[TypoFix.applyWordMap]]), same apply path as the driver version. */
  def fix(df: DataFrame, c: String, threshold: Double = 0.8,
      maxCorrections: Int = 500,
      sim: (Column, Column) => Column = ratcliffSim): DataFrame = {
    val map = corrections(df, c, threshold, maxCorrections, sim)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    TypoFix.applyWordMap(df, c, map)
  }
}
