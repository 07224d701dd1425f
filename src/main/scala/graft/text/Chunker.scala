package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document chunking — fixed-token windows with overlap, the standard
  * splitter in front of embedding models and context-bounded training
  * (long documents become `chunkTokens`-token pieces whose `overlap`
  * tail repeats at the head of the next piece so no boundary context is
  * lost). The complement of [[graft.plans.SequencePacking]]: packing
  * concatenates short documents up to a budget, chunking splits long
  * ones down to it.
  *
  * Chunk i covers tokens [i·stride, i·stride + chunkTokens) with
  * stride = chunkTokens − overlap; starts are every stride while
  * < token count, so the final chunk may be short (its real length is
  * emitted as `n_chunk_tokens`). Blank/empty/null documents emit no
  * rows — a chunker that invents an empty chunk would feed blanks to
  * the embedder downstream. Tokenization is the
  * [[TextAnalysis.tokens]] convention (lower, trim, split on
  * whitespace runs), reproducible in SQL for the q_chunk_docs oracle.
  *
  * Scale shape: pure expressions — one projection builds the token
  * array once (the start list rides `sequence(0, n−1, stride)` off it),
  * one explode; no UDF, no shuffle, no action. Output volume is
  * ~n/stride rows per n-token document, the same linear factor any
  * chunker pays. */
object Chunker {

  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlapTokens")
    val stride = chunkTokens - overlapTokens
    // split("") yields [""] — the blank guard keeps empty/blank/null
    // docs at ZERO chunks instead of one empty chunk
    val ws = when(length(trim(col(textCol))) > 0,
      TextAnalysis.tokens(col(textCol)))
      .otherwise(array().cast(ArrayType(StringType)))
    df.withColumn("__ws", ws)
      .withColumn("__start", explode(
        when(size(col("__ws")) > 0,
          sequence(lit(0), size(col("__ws")) - 1, lit(stride)))
          .otherwise(array().cast(ArrayType(IntegerType)))))
      .select(col(idCol),
        (col("__start") / stride).cast(LongType).as("chunk_id"),
        least(lit(chunkTokens), size(col("__ws")) - col("__start"))
          .cast(LongType).as("n_chunk_tokens"),
        concat_ws(" ",
          slice(col("__ws"), col("__start") + 1, lit(chunkTokens)))
          .as("chunk_text"))
  }

  /** [[chunk]] over a PRE-TOKENIZED array column — the tokenizer-
    * agnostic form (r18): the caller picks the tokenization
    * ([[TextAnalysis.tokens]] whitespace words, [[Bpe.encode]] subword
    * tokens, …) and the window arithmetic is identical. Chunk windows
    * may split inside a word when the tokens are subwords — exactly
    * what a context-length-bounded trainer does — so the output carries
    * the token ARRAY, not reassembled text. Empty/null token arrays
    * emit no chunks, matching [[chunk]]'s blank-document contract.
    *
    * Same scale shape as [[chunk]]: one `sequence` + one explode, no
    * UDF, no shuffle, no action. */
  def chunkTokenArray(df: DataFrame, idCol: String, tokensCol: String,
      chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlapTokens")
    val stride = chunkTokens - overlapTokens
    df.withColumn("__tk",
        coalesce(col(tokensCol), array().cast(ArrayType(StringType))))
      .withColumn("__start", explode(
        when(size(col("__tk")) > 0,
          sequence(lit(0), size(col("__tk")) - 1, lit(stride)))
          .otherwise(array().cast(ArrayType(IntegerType)))))
      .select(col(idCol),
        (col("__start") / stride).cast(LongType).as("chunk_id"),
        least(lit(chunkTokens), size(col("__tk")) - col("__start"))
          .cast(LongType).as("n_chunk_tokens"),
        slice(col("__tk"), col("__start") + 1, lit(chunkTokens))
          .as("chunk_tokens"))
  }
}
