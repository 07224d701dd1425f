package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) subword segmentation — the THIRD
  * tokenizer inference family (r20, closing the r19 verdict's "budget
  * cross-check triangle"): [[BpeKernels]] replays merges in rank order,
  * [[WordPieceKernels]] greedily takes the longest matching prefix;
  * this one picks the GLOBALLY best segmentation of each word by
  * Viterbi max-product over per-piece log-probabilities (Kudo 2018) —
  * equivalently, min-sum over integer COSTS (see below). The three
  * rules genuinely differ on the same piece inventory (UnigramSpec
  * pins diverging cases): greedy commits to a long rare piece where
  * the likelihood model prefers two short common ones, and BPE's merge
  * order can block a merge the global optimum uses.
  *
  * Costs are INTEGER fixed-point negative log-probs: cost(piece) =
  * round(100 · ln(rank + 2)) for a piece minted by merge `rank`
  * (Zipf proxy: creation order ≈ frequency order), single characters
  * at rank = |merges| ([[graft.text.Unigram.pieceCosts]]). Integers —
  * not doubles — because the DuckDB oracle replays the identical DP
  * and float summation-order drift across engines would flip
  * tie-breaks; with integer costs both engines do exact arithmetic.
  *
  * Tie-break (total, both engines): among candidate last-pieces at a
  * position with equal total cost, the LONGEST wins. Two candidates
  * with equal total AND equal length are the same substring, hence the
  * same piece — the rule is exhaustive, so the DP entry at every
  * position is unique and the oracle's `list_sort(...)[1]` replays it
  * exactly.
  *
  * UNK: a word containing a character with no vocabulary piece has no
  * full segmentation (reachability fails exactly there) and becomes
  * one whole-word `[UNK]` token — the same rule as
  * [[WordPieceKernels]], and the oracle replays it (LEFT JOIN +
  * coalesce), per the r19 ADVICE on the WordPiece twin.
  *
  * Scale shape: pure per-row expressions inside whole-stage codegen;
  * the corpus never shuffles. Per word the DP is
  * O(|word| · maxPieceLen) hash probes, memoized per distinct word
  * exactly like the other two families.
  */
object UnigramKernels {

  val Unk = "[UNK]"

  /** Compiled (piece → cost) inventory + per-executor word memo.
    * Shipped to executors once per plan via `addReferenceObj`.
    * Duplicate piece strings keep the CHEAPEST cost (a BPE merge list
    * can mint the same product at two ranks — ("a","bc") and
    * ("ab","c") both yield "abc"; the earlier mint is the frequency
    * signal). */
  final class PieceTable(costed: Seq[(String, Long)]) extends Serializable {
    require(costed.nonEmpty, "unigram needs a non-empty vocabulary")
    require(costed.forall { case (p, c) =>
      p.nonEmpty && !p.exists(_.isWhitespace) && c >= 0L },
      "unigram pieces must be non-empty, whitespace-free, cost >= 0")
    private val map = new java.util.HashMap[String, java.lang.Long](
      costed.size * 2)
    costed.foreach { case (p, c) =>
      val old = map.get(p)
      if (old == null || c < old) map.put(p, c)
    }
    private val maxLen: Int = costed.iterator.map(_._1.length).max

    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]](1024)
    private val MaxMemo = 1 << 16

    def piecesOf(word: String): Array[String] = {
      val hit = memo.get(word)
      if (hit != null) return hit
      val toks = segment(word)
      if (memo.size >= MaxMemo) memo.clear()
      memo.put(word, toks)
      toks
    }

    /** Viterbi min-cost DP (no memo). `cost(i)` = best total over
      * segmentations of the length-i prefix; `back(i)` = length of the
      * winning last piece. Candidates scan lp descending so an
      * equal-total longer piece is installed first and the `>` guard
      * keeps it — the oracle's (total asc, length desc) sort order.
      * Costs are bounded by |word| · max single-piece cost (≤ ~700 per
      * piece at 1k merges), so Long sums cannot overflow. */
    private def segment(word: String): Array[String] = {
      val n = word.length
      val Inf = Long.MaxValue
      val cost = new Array[Long](n + 1)
      val back = new Array[Int](n + 1)
      java.util.Arrays.fill(cost, Inf)
      cost(0) = 0L
      var i = 1
      while (i <= n) {
        var lp = math.min(maxLen, i)
        while (lp >= 1) {
          if (cost(i - lp) != Inf) {
            val c = map.get(word.substring(i - lp, i))
            if (c != null) {
              val tot = cost(i - lp) + c.longValue()
              if (tot < cost(i) || (tot == cost(i) && lp > back(i))) {
                cost(i) = tot
                back(i) = lp
              }
            }
          }
          lp -= 1
        }
        i += 1
      }
      if (cost(n) == Inf) return Array(Unk) // whole-word UNK rule
      var k = 0
      var pos = n
      while (pos > 0) { k += 1; pos -= back(pos) }
      val out = new Array[String](k)
      pos = n
      while (pos > 0) {
        val lp = back(pos)
        k -= 1
        out(k) = word.substring(pos - lp, pos)
        pos -= lp
      }
      out
    }
  }

  /** Flat piece array over the whole document (word order preserved).
    * Blank/empty → empty array. */
  def encodeKernel(text: UTF8String, pt: PieceTable): ArrayData = {
    val words = preTokens(text)
    var n = 0
    val perWord = new Array[Array[String]](words.length)
    var i = 0
    while (i < words.length) {
      val t = pt.piecesOf(words(i)); perWord(i) = t; n += t.length; i += 1
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

  /** Piece COUNT without materializing the pieces. */
  def countKernel(text: UTF8String, pt: PieceTable): Long = {
    val words = preTokens(text)
    var n = 0L
    var i = 0
    while (i < words.length) { n += pt.piecesOf(words(i)).length; i += 1 }
    n
  }

  // identical convention to BpeKernels/WordPieceKernels.preTokens
  private def preTokens(text: UTF8String): Array[String] = {
    val t = text.toString.toLowerCase(java.util.Locale.ROOT).trim
    if (t.isEmpty) Array.empty[String] else t.split("\\s+")
  }
}

/** Viterbi unigram tokenize to a flat array<string> — null in → null
  * out, blank in → empty array. */
case class UnigramEncode(child: Expression,
    pt: UnigramKernels.PieceTable) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_unigram_encode needs a string argument, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_encode"

  override protected def nullSafeEval(s: Any): Any =
    UnigramKernels.encodeKernel(s.asInstanceOf[UTF8String], pt)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ptRef = ctx.addReferenceObj("graftUgTable", pt,
      classOf[UnigramKernels.PieceTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramKernels.encodeKernel($c, $ptRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramEncode = copy(child = newChild)
}

/** Piece count — [[UnigramEncode]].size without the arrays. */
case class UnigramCount(child: Expression,
    pt: UnigramKernels.PieceTable) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_unigram_count needs a string argument, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_unigram_count"

  override protected def nullSafeEval(s: Any): Any =
    UnigramKernels.countKernel(s.asInstanceOf[UTF8String], pt)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ptRef = ctx.addReferenceObj("graftUgTable", pt,
      classOf[UnigramKernels.PieceTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramKernels.countKernel($c, $ptRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramCount = copy(child = newChild)
}
