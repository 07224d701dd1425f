package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding apply kernels — the token accounting behind the
  * BPE twins of chunking / sequence packing / budget sampling
  * ([[graft.text.Bpe]]). Whitespace pre-tokenization (the
  * [[graft.text.TextAnalysis.nonEmptyTokens]] convention: lower, split
  * on `\s+`, drop empties), then per word the merge list is applied IN
  * RANK ORDER, each
  * merge as ONE left-to-right greedy pass over the word's token
  * sequence.
  *
  * Rank-order apply (vs the min-rank-first loop some implementations
  * use) is exact for any WELL-FORMED merge list — one where every
  * merge's constituents are single characters or products of strictly
  * earlier merges, which is what BPE training produces by construction
  * ([[graft.text.Bpe.learn]]): a token minted at rank j can never
  * complete a pair for a merge k < j, because merge k was learned when
  * only tokens of rank < k existed, so after processing merge k in
  * order there is nothing left for it to do. The payoff is an oracle
  * that DuckDB can replay as a recursive CTE with ONE string `replace`
  * per rank over a bracketed-unit encoding (see
  * `SparkEntry.bpeWordCtes`) — min-rank-first would need a per-step
  * argmin over pairs, which SQL cannot express at reasonable cost.
  *
  * One greedy pass per merge is itself a fixpoint: merging (l, r) → lr
  * creates only adjacencies (prev, lr) and (lr, next), and lr equals
  * neither l nor r (both non-empty), so no new (l, r) pair can appear.
  *
  * Scale shape: pure per-row expressions inside whole-stage codegen —
  * token accounting is embarrassingly parallel and must never shuffle
  * the corpus. Per word the merge loop is O(merges · |word|) worst
  * case, with a `word.contains(merged)` precheck (adjacent tokens are
  * contiguous substrings of the original word, so pair (l, r) present
  * implies substring l+r present) that skips merges that cannot fire.
  * A bounded per-executor memo (word → token array) turns the
  * Zipf-shaped corpus vocabulary into O(1) amortized lookups.
  */
object BpeKernels {

  /** A compiled, immutable merge list plus the per-executor word memo.
    * Shipped to executors once per plan via `addReferenceObj` — the
    * [[BloomMightContainLong]] route for runtime-data kernels. */
  final class MergeTable(merges: Seq[(String, String)]) extends Serializable {
    require(merges.forall { case (l, r) => l.nonEmpty && r.nonEmpty },
      "BPE merge constituents must be non-empty")
    val left: Array[String] = merges.map(_._1).toArray
    val right: Array[String] = merges.map(_._2).toArray
    val merged: Array[String] = merges.map { case (l, r) => l + r }.toArray
    def size: Int = left.length

    /** Word → BPE token memo. Bounded: at 2^16 entries the map is
      * cleared, not capped — output never depends on cache state, and a
      * clear under a pathological vocabulary is cheaper than an LRU.
      * ConcurrentHashMap because codegen references are shared across a
      * stage's tasks within one executor JVM. */
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]](1024)
    private val MaxMemo = 1 << 16

    def tokensOf(word: String): Array[String] = {
      val hit = memo.get(word)
      if (hit != null) return hit
      val toks = applyMerges(word)
      if (memo.size >= MaxMemo) memo.clear()
      memo.put(word, toks)
      toks
    }

    /** Rank-order apply over one word (no memo). */
    private def applyMerges(word: String): Array[String] = {
      var toks: Array[String] = {
        // split into code points so astral chars stay whole tokens
        val cps = word.codePoints().toArray
        val a = new Array[String](cps.length)
        var i = 0
        while (i < cps.length) {
          a(i) = new String(Character.toChars(cps(i))); i += 1
        }
        a
      }
      var r = 0
      while (r < left.length) {
        if (toks.length >= 2 && word.contains(merged(r)))
          toks = mergePass(toks, left(r), right(r), merged(r))
        r += 1
      }
      toks
    }
  }

  /** ONE left-to-right greedy pass merging every (l, r) adjacency —
    * shared verbatim by apply (above) and training
    * ([[graft.text.Bpe.learnFromCounts]]) so the two can never drift. */
  private[graft] def mergePass(toks: Array[String], l: String, r: String,
      lr: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += lr; i += 2
      } else {
        out += toks(i); i += 1
      }
    }
    out.toArray
  }

  /** Whitespace pre-tokens of `text` — MUST match
    * [[graft.text.TextAnalysis.nonEmptyTokens]] (lower, split on
    * `\s+`, DROP empty tokens) and the oracle's
    * `list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
    * x -> x <> '')`. Java `trim` strips all chars ≤ U+0020, so a
    * tab/newline-led word never yields a leading empty token here —
    * the same result the empty-filter gives the other two twins
    * (BpeSpec pins the edge case). Locale.ROOT: Spark's `lower` is
    * locale-independent. */
  private def preTokens(text: UTF8String): Array[String] = {
    val t = text.toString.toLowerCase(java.util.Locale.ROOT).trim
    if (t.isEmpty) Array.empty[String] else t.split("\\s+")
  }

  /** Flat BPE token array over the whole document (word tokens
    * concatenated in word order). Blank/empty → empty array. */
  def encodeKernel(text: UTF8String, mt: MergeTable): ArrayData = {
    val words = preTokens(text)
    var n = 0
    val perWord = new Array[Array[String]](words.length)
    var i = 0
    while (i < words.length) {
      val t = mt.tokensOf(words(i)); perWord(i) = t; n += t.length; i += 1
    }
    val out = new Array[Any](n)
    var k = 0
    i = 0
    while (i < words.length) {
      val t = perWord(i)
      var j = 0
      while (j < t.length) { out(k) = UTF8String.fromString(t(j)); k += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** BPE token COUNT — the cheap path: no per-token UTF8String or array
    * materializes when only the count is needed (budget sampling,
    * packing placement). */
  def countKernel(text: UTF8String, mt: MergeTable): Long = {
    val words = preTokens(text)
    var n = 0L
    var i = 0
    while (i < words.length) { n += mt.tokensOf(words(i)).length; i += 1 }
    n
  }
}

/** BPE tokenize to a flat array<string> — null in → null out, blank in
  * → empty array (a blank doc has zero tokens, not a null count). */
case class BpeEncode(child: Expression,
    mt: BpeKernels.MergeTable) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_encode needs a string argument, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  override protected def nullSafeEval(s: Any): Any =
    BpeKernels.encodeKernel(s.asInstanceOf[UTF8String], mt)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mtRef = ctx.addReferenceObj("graftBpeTable", mt,
      classOf[BpeKernels.MergeTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeKernels.encodeKernel($c, $mtRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncode = copy(child = newChild)
}

/** BPE token count — same semantics as [[BpeEncode]].size without
  * materializing the tokens. */
case class BpeCount(child: Expression,
    mt: BpeKernels.MergeTable) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_count needs a string argument, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  override protected def nullSafeEval(s: Any): Any =
    BpeKernels.countKernel(s.asInstanceOf[UTF8String], mt)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mtRef = ctx.addReferenceObj("graftBpeTable", mt,
      classOf[BpeKernels.MergeTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeKernels.countKernel($c, $mtRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeCount = copy(child = newChild)
}
