package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for LLM training-data pipelines (SURVEY.md §7.6;
  * extension surface mandated by BASELINE.json "north_star": language ID,
  * quality scoring, token counting, document fingerprinting).
  *
  * Everything here is a pure column expression — whole-stage-codegen'd, no
  * UDFs, no shuffles; a single projection over the scan at any scale. All
  * formulas are deterministic and mirrored 1:1 in the DuckDB oracle SQL
  * (same operation shapes, same tie-breaks).
  */
object TextAnalysis {

  // Tiny function-word lists for the n-gram-free language heuristic.
  // Distinct-token overlap with these sets drives the vote; CJK character
  // share short-circuits to "zh". Lists sorted, lowercase, ASCII-safe.
  val StopEn = Seq("a", "and", "as", "at", "for", "in", "is", "it", "of",
    "on", "that", "the", "to", "was", "with")
  val StopDe = Seq("auf", "das", "den", "der", "die", "ein", "eine", "für",
    "im", "ist", "mit", "nicht", "und", "von", "zu")
  val StopEs = Seq("con", "de", "el", "en", "es", "la", "las", "los", "no",
    "para", "por", "que", "un", "una", "y")
  val StopFr = Seq("avec", "dans", "de", "est", "et", "la", "le", "les",
    "ne", "pas", "pour", "que", "sur", "un", "une")

  val CjkRegex = "[\\x{4e00}-\\x{9fff}]"
  /** BPE-ish tokenization: word runs or single non-space symbols. */
  val BpeTokenRegex = "\\w+|[^\\w\\s]"

  /** Whitespace tokens of the lowercased, trimmed text. */
  def tokens(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** Whitespace token count (0 for empty/blank text). */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0L)).otherwise(size(tokens(c)).cast(LongType))

  /** [[tokens]] with empty strings dropped — the exact Spark twin of
    * the oracles' `list_filter(regexp_split_to_array(...), x -> x <> '')`.
    * Differs from [[tokenCount]] only on text led/trailed by non-space
    * whitespace (SQL `trim` strips spaces ONLY, so `"\tfoo"` splits to
    * a leading empty token that tokenCount counts and this drops);
    * the BPE family uses this so a generator edge case cannot drift
    * the n_ws column from its oracle (r18 ADVICE). */
  def nonEmptyTokens(c: Column): Column = array_remove(tokens(c), "")

  def nonEmptyTokenCount(c: Column): Column =
    size(nonEmptyTokens(c)).cast(LongType)

  /** Regex-token count (word runs + symbols) — the BPE-ish proxy. */
  def bpeTokenCount(c: Column): Column = regexp_count(c, lit(BpeTokenRegex)).cast(LongType)

  def charCount(c: Column): Column = length(c).cast(LongType)

  /** Mean token length = non-space chars / token count (null when empty). */
  def avgTokenLen(c: Column): Column =
    when(tokenCount(c) > 0,
      length(regexp_replace(trim(c), "\\s+", "")).cast(DoubleType) / tokenCount(c))

  /** Share of alphabetic chars (ASCII letters) in the text. */
  def alphaRatio(c: Column): Column =
    when(length(c) > 0,
      length(regexp_replace(c, "[^a-zA-Z]", "")).cast(DoubleType) / length(c))

  /** Share of punctuation characters in the text. */
  def punctRatio(c: Column): Column =
    when(length(c) > 0,
      (length(c) - length(translate(c, graft.ops.TextClean.Punctuation, "")))
        .cast(DoubleType) / length(c))

  /** Share of distinct tokens that are English function words. */
  def stopwordRatio(c: Column): Column = {
    val distinctToks = array_distinct(tokens(c))
    when(size(distinctToks) > 0,
      size(array_intersect(distinctToks, array(StopEn.map(lit): _*)))
        .cast(DoubleType) / size(distinctToks))
  }

  /** Heuristic quality score in [0,1]: rewards mid-length documents, high
    * alpha share, presence of function words; penalizes punctuation soup.
    * Formula (fixed, documented for the oracle):
    *   0.25·min(1, tokens/50) + 0.35·alpha + 0.25·min(1, 4·stop) + 0.15·(1−min(1, 4·punct))
    */
  def qualityScore(c: Column): Column = {
    val tok = least(lit(1.0), tokenCount(c).cast(DoubleType) / 50.0)
    val al = coalesce(alphaRatio(c), lit(0.0))
    val st = least(lit(1.0), coalesce(stopwordRatio(c), lit(0.0)) * 4.0)
    val pu = lit(1.0) - least(lit(1.0), coalesce(punctRatio(c), lit(0.0)) * 4.0)
    tok * 0.25 + al * 0.35 + st * 0.25 + pu * 0.15
  }

  /** Distinct-token overlap with a language's function-word list. */
  def stopHits(c: Column, words: Seq[String]): Column =
    size(array_intersect(array_distinct(tokens(c)), array(words.map(lit): _*)))

  /** Language ID: CJK share > 0.3 → zh; else arg-max of function-word hits
    * over {de,en,es,fr} with ties broken in lexicographic language order —
    * the SAME fixed comparison chain as the oracle SQL. */
  def langId(c: Column): Column = {
    val cjk = when(length(c) > 0,
      regexp_count(c, lit(CjkRegex)).cast(DoubleType) / length(c)).otherwise(0.0)
    val de = stopHits(c, StopDe); val en = stopHits(c, StopEn)
    val es = stopHits(c, StopEs); val fr = stopHits(c, StopFr)
    when(cjk > 0.3, "zh")
      .when(de >= en && de >= es && de >= fr, "de")
      .when(en >= es && en >= fr, "en")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** Content fingerprint: md5 of the whitespace-normalized lowercase text —
    * exact-dup detection key that survives formatting noise. */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(trim(lower(c)), "\\s+", " ").cast(BinaryType))

  /** Winnowing fingerprint (Schleimer/Wilkerson/Aiken 2003, the MOSS
    * algorithm): the distinct minima of every `w`-window over the rolling
    * k-gram hash sequence of the normalized text, ascending. Guarantees
    * any shared substring of length ≥ w+k-1 contributes a common
    * fingerprint value — the robust partial-overlap counterpart of
    * [[fingerprint]]'s whole-document key.
    *
    * The k-gram hash is the engine-portable md5 form ([[graft.dedup
    * .NearDup.md5Hash56]]'s arithmetic: first 14 hex chars base-16), so
    * an external SQL engine can rebuild every value — q_winnow_fp is
    * oracle-checked. One-pass kernel per row (code-point windows, one
    * MessageDigest instance per row, sliding-window minima by rescan
    * only when the outgoing element was the minimum); selection is by
    * VALUE (distinct minima), so tie-break position conventions cannot
    * drift between engines. Pure projection — no shuffle. */
  def winnowingFingerprint(c: Column, k: Int = 5, w: Int = 4): Column =
    winnowUdf(regexp_replace(trim(lower(c)), "\\s+", " "), lit(k), lit(w))

  private val winnowUdf = udf { (s: String, k: Int, w: Int) =>
    if (s == null) Array.empty[Long]
    else {
      val cps = s.codePoints().toArray
      val n = cps.length - k + 1 // k-gram count
      if (n < w) Array.empty[Long]
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hs = new Array[Long](n)
        var i = 0
        while (i < n) {
          val bytes = md.digest(new String(cps, i, k)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // first 14 hex chars == the top 7 bytes exactly (2 hex/byte)
          var h = 0L
          var j = 0
          while (j < 7) { h = (h << 8) | (bytes(j) & 0xffL); j += 1 }
          hs(i) = h // digest() auto-resets for the next gram
          i += 1
        }
        val out = new java.util.TreeSet[java.lang.Long]()
        var min = Long.MaxValue
        var minAt = -1
        var sstart = 0
        while (sstart + w <= n) {
          if (minAt < sstart) { // outgoing element was the min: rescan
            min = Long.MaxValue
            var j = sstart
            while (j < sstart + w) {
              if (hs(j) <= min) { min = hs(j); minAt = j }; j += 1
            }
          } else if (hs(sstart + w - 1) <= min) {
            min = hs(sstart + w - 1); minAt = sstart + w - 1
          }
          out.add(min)
          sstart += 1
        }
        val arr = new Array[Long](out.size)
        val it = out.iterator()
        var idx = 0
        while (it.hasNext) { arr(idx) = it.next(); idx += 1 }
        arr
      }
    }
  }
}
