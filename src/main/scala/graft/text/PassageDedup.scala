package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.dedup.NearDup

/** Exact duplicated-PASSAGE removal (Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better", ExactSubstr): delete every
  * span of ≥ `l` consecutive tokens that occurs more than once in the
  * corpus — the license headers, quoted tweets, and templated paragraphs
  * that survive whole-document dedup ([[graft.dedup.NearDup.minhashPairs]]),
  * exact-line dedup ([[LineDedup]]), and fingerprint overlap (winnowing)
  * because they sit INSIDE otherwise-unique documents.
  *
  * Semantics: tokenize the normalized text (lowercase, whitespace-split —
  * same normalization as the other dedup ops); a token is removed iff it
  * is covered by at least one `l`-token window whose content occurs ≥ 2
  * times corpus-wide (within-document repeats count — a doc that repeats
  * its own paragraph is self-duplicated in exactly Lee et al.'s sense).
  * ALL occurrences are removed, not all-but-one: keeping "the first"
  * requires a total document order, which at 100 TB is an artificial
  * global-sort bottleneck for no modeling benefit (the paper notes the
  * choice is immaterial). Output is one row per input doc —
  * (id, rebuilt text, n_removed) — never a dropped row; a fully
  * duplicated document comes back as the empty string.
  *
  * Shape at scale (the paper uses a single-machine suffix array; this is
  * the distributed-shuffle equivalent):
  *   1. one projection explodes each doc into its `l`-gram window hashes
  *      (xxhash64 of the gram string — 8 bytes/window, linear);
  *   2. one hash-keyed groupBy counts occurrences (map-side partial
  *      aggregation pre-reduces hot boilerplate grams);
  *   3. a left-semi join back on the hash keeps only duplicated window
  *      starts (AQE skew-split handles mega-hot grams);
  *   4. one id-keyed groupBy collects the (few) duplicated starts per
  *      doc, merged into disjoint coverage spans by a linear fold;
  *   5. rebuild = per-token exists() over the MERGED spans — O(tokens ×
  *      spans) with spans already coalesced, so a heavily duplicated doc
  *      collapses toward one span, not one span per window.
  * Hash collisions (xxhash64) can mark a unique window duplicated with
  * probability ~2⁻⁶⁴ per pair — the same trade the paper's hashed
  * variants make.
  */
object PassageDedup {

  private def winHashes(toks: Column, l: Int): Column =
    transform(sequence(lit(0), size(toks) - l),
      i => xxhash64(concat_ws(" ", slice(toks, i + lit(1), lit(l)))))

  /** (id, window start, window hash) for every `l`-token window. */
  private def windows(toks: DataFrame, idCol: String, l: Int): DataFrame =
    toks.where(size(col("__toks")) >= l)
      .select(col(idCol),
        posexplode(winHashes(col("__toks"), l)).as(Seq("__pos", "__h")))

  /** Fold the sorted duplicated window starts into disjoint, coalesced
    * coverage spans [a, b] (token indexes, inclusive). Adjacent or
    * overlapping windows merge: start s covers [s, s+l-1], and a next
    * start ≤ b+1 extends the open span. */
  private def mergedSpans(l: Int): Column = expr(
    s"""aggregate(
       |  __starts,
       |  cast(array() as array<struct<a:int,b:int>>),
       |  (acc, s) -> if(size(acc) > 0 and s <= element_at(acc, -1).b + 1,
       |    concat(slice(acc, 1, size(acc) - 1),
       |      array(named_struct('a', element_at(acc, -1).a,
       |        'b', greatest(element_at(acc, -1).b, s + ${l - 1})))),
       |    concat(acc, array(named_struct('a', s, 'b', s + ${l - 1})))))"""
      .stripMargin)

  /** Remove every token covered by a duplicated `l`-gram; returns
    * (idCol, textCol rebuilt from surviving tokens, n_removed). */
  def removeDuplicatePassages(df: DataFrame, textCol: String, idCol: String,
      l: Int = 50): DataFrame = {
    require(l >= 2, s"window length must be >= 2 tokens, got $l")
    // r21: the gram-window derivation inherits the scan's split count —
    // size-gated repartition keeps all cores busy on small corpora
    // (measured 3 tasks on 32 cores at sf0.1; no-op at scan-splittable
    // sizes, see Parallelize).
    val toks = graft.util.Parallelize.bySize(df, idCol)
      .select(col(idCol),
        split(NearDup.normalize(col(textCol)), " ").as("__toks"))
    val wins = windows(toks, idCol, l)
    val dupH = wins.groupBy("__h").agg(count(lit(1)).as("__c"))
      .where(col("__c") >= 2).select("__h")
    val starts = wins.join(dupH, Seq("__h"), "left_semi")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__pos"))).as("__starts"))
    val kept = filter(col("__toks"), (_, i) =>
      !exists(col("__spans"), sp =>
        i >= sp.getField("a") && i <= sp.getField("b")))
    toks.join(starts, Seq(idCol), "left")
      .withColumn("__spans", when(col("__starts").isNull,
          expr("cast(array() as array<struct<a:int,b:int>>)"))
        .otherwise(mergedSpans(l)))
      .select(col(idCol),
        concat_ws(" ", kept).as(textCol),
        (size(col("__toks")) - size(kept)).cast(LongType).as("n_removed"))
  }
}
