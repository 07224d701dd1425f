package graft.plans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GPT-style concat-and-chunk sequence packing plan: documents are
  * concatenated in ascending `idCol` order and cut into fixed
  * `window`-token training sequences; the plan reports, per document,
  * its global token offset and the first/last sequence index it lands
  * in. This is the placement computation behind "pack the corpus into
  * 2048-token rows" — the actual byte shuffling is a downstream
  * gather, but the placement is what must be deterministic and cheap at
  * corpus scale.
  *
  * Scale shape — the [[PartitionedFill]] two-pass pattern, because a
  * global prefix sum ordered by id is otherwise a single-partition
  * window (the known anti-pattern):
  *
  *  1. range-partition + local sort by id (partitions tile the global
  *     order);
  *  2. pass 1: per-partition token totals — numPartitions rows to the
  *     driver;
  *  3. driver prefix-scan → each partition's starting global offset;
  *  4. pass 2: per-partition running sum seeded with the offset —
  *     embarrassingly parallel.
  *
  * The sorted frame is staged DISK_ONLY between the passes and follows
  * the caller-unpersists sweep contract. Null token counts read as 0
  * (a doc with unknown length must not shift every later offset by
  * null-poisoning); empty docs occupy no tokens and degenerate to
  * seq_last = seq_first.
  */
object SequencePacking {

  /** @return one row per input doc: idCol, n_tokens, start_token
    *         (0-based global offset), seq_first, seq_last. */
  def plan(df: DataFrame, idCol: String, tokenCol: String,
      window: Long, numPartitions: Int = 0): DataFrame = {
    require(window > 0, "window must be positive")
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val base = df.select(col(idCol),
      coalesce(col(tokenCol).cast(LongType), lit(0L)).as("n_tokens"))
    val sorted = base.repartitionByRange(n, col(idCol).asc)
      .sortWithinPartitions(col(idCol).asc)
    val sortedRdd = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)

    // pass 1: per-partition token totals (materializes the stage)
    val totals: Map[Int, Long] = sortedRdd.mapPartitionsWithIndex {
      (pid, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(1))
        Iterator.single((pid, s))
    }.collect().toMap
    val actualN = totals.size
    val offsets = new Array[Long](math.max(actualN, 1))
    for (p <- 1 until actualN) offsets(p) = offsets(p - 1) + totals(p - 1)
    val bc = spark.sparkContext.broadcast(offsets)

    // pass 2: seeded running sum
    val placed = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = bc.value(pid)
      it.map { r =>
        val start = cum
        cum += r.getLong(1)
        Row(r.get(0), r.getLong(1), start)
      }
    }
    val schema = StructType(Seq(
      sorted.schema.fields(0),
      StructField("n_tokens", LongType, nullable = false),
      StructField("start_token", LongType, nullable = false)))
    spark.createDataFrame(placed, schema)
      .withColumn("seq_first", expr(s"start_token div $window"))
      .withColumn("seq_last",
        expr(s"(start_token + greatest(n_tokens, 1L) - 1L) div $window"))
  }

  /** Materialize the packed training sequences [[plan]] only places:
    * one row per `window`-token sequence with its actual token array
    * reassembled from every document (piece) that lands in it — the
    * "pack the corpus into 2048-token rows" output itself, not just the
    * placement. Empty-token docs pack nothing (they occupy zero tokens
    * in the plan and a zero-length piece would only bloat the shuffle).
    *
    * Scale shape: the [[plan]] two-pass prefix sum runs HERE with the
    * token arrays riding along as row payload (r15: the first cut
    * computed `plan` on (id, count) and equi-joined the arrays back —
    * that joined shuffle moved the whole token corpus two extra times;
    * carrying the payload through the range partition leaves exactly
    * TWO full-corpus shuffles: the id-range sort and the final regroup).
    * Then one explode of each doc over the ≤ n/window + 1 sequences it
    * spans, and ONE shuffle on `seq_id` to regroup pieces across
    * document boundaries — the unavoidable shuffle of packing (every
    * byte must move to its sequence). Piece offsets inside a sequence
    * are disjoint by construction, so `array_sort` over (offset, piece)
    * structs makes the per-sequence reassembly order deterministic under
    * any shuffle. The final sequence may be short (the corpus tail);
    * every other sequence is exactly `window` tokens — a guarantee the
    * caller can assert cheaply (`n_tokens`).
    *
    * @param tokensCol array<string> column (already tokenized — the
    *                  tokenizer convention is the caller's contract)
    * @return (seq_id, n_tokens, n_docs, seq_text) */
  def gather(df: DataFrame, idCol: String, tokensCol: String,
      window: Long, numPartitions: Int = 0): DataFrame = {
    require(window > 0, "window must be positive")
    val spark = df.sparkSession
    val nParts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val counted = df
      .select(col(idCol), col(tokensCol).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast(LongType))
      .where(col("__n") > 0)
    // the plan() two-pass prefix sum, payload riding along: pass 1
    // sums per-partition token counts (field 2 = __n), pass 2 seeds the
    // running global offset. No persist between the passes: `rdd` is a
    // lazy val, so both jobs share the one physical plan and pass 2's
    // post-shuffle stages are SKIPPED stages reading pass 1's shuffle
    // files (the rankedDistinct pattern) — an explicit DISK_ONLY stage
    // here would re-write the whole token corpus a second time for
    // nothing (measured r15: dropping it cut gather's sf3 cost).
    val sorted = counted.repartitionByRange(nParts, col(idCol).asc)
      .sortWithinPartitions(col(idCol).asc)
    val sortedRdd = sorted.rdd
    val totals: Map[Int, Long] = sortedRdd.mapPartitionsWithIndex {
      (pid, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(2))
        Iterator.single((pid, s))
    }.collect().toMap
    val offsets = new Array[Long](math.max(totals.size, 1))
    for (p <- 1 until totals.size) offsets(p) = offsets(p - 1) + totals(p - 1)
    val bc = spark.sparkContext.broadcast(offsets)
    val placedRdd = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = bc.value(pid)
      it.map { r =>
        val start = cum
        cum += r.getLong(2)
        Row.fromSeq(r.toSeq :+ start)
      }
    }
    val placed = spark.createDataFrame(placedRdd, StructType(
      sorted.schema.fields :+
        StructField("start_token", LongType, nullable = false)))
      .withColumn("n_tokens", col("__n"))
      .withColumn("seq_first", expr(s"start_token div $window"))
      .withColumn("seq_last",
        expr(s"(start_token + greatest(n_tokens, 1L) - 1L) div $window"))
    // pieces cross the regroup shuffle as flat STRINGS, not
    // array<string> (r15: struct-of-array rows paid per-token object
    // overhead through the exchange); the per-piece token count rides
    // along so n_tokens needs no re-split downstream
    val pieceLen =
      least((col("__seq") + 1) * window,
        col("start_token") + col("n_tokens")) -
        greatest(col("__seq") * window, col("start_token"))
    val pieces = placed
      .withColumn("__seq", explode(sequence(col("seq_first"),
        col("seq_last"))))
      .select(col("__seq").as("seq_id"),
        // global span of this doc inside this sequence:
        // [gs, ge) = [max(seq·W, start), min((seq+1)·W, start+n))
        (greatest(col("__seq") * window, col("start_token"))
          - col("__seq") * window).as("__off"),
        pieceLen.as("__plen"),
        concat_ws(" ", slice(col("__toks"),
          (greatest(col("__seq") * window, col("start_token"))
            - col("start_token") + 1).cast("int"),
          pieceLen.cast("int"))).as("__piece"))
    pieces.groupBy("seq_id")
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("__off"), col("__piece")))),
          p => p("__piece"))).as("seq_text"),
        sum(col("__plen")).cast(LongType).as("n_tokens"),
        count(lit(1)).as("n_docs"))
      .select("seq_id", "n_tokens", "n_docs", "seq_text")
  }
}
