package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Throwaway profiling probe — test scope only, never ships. Measures
// the BPE APPLY kernel (BpeCount) at the frozen 1024-merge vocabulary
// over the bigram pre-token corpus, splitting train cost from apply
// cost (the q_bpe_learn1k bench row times both together). Feeds the
// BASELINE.md tokens/sec sentence the r18 verdict asked for.
// Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.BpeThroughputProbe"
object BpeThroughputProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bpe-probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val bg = graft.text.Bpe
      .withBigramPreTokens(docs, "text", "bg_text")
      .select("doc_id", "bg_text").cache()
    val nDocs = bg.count() // materialize: probe the kernel, not the scan
    val merges = time("train (1024 merges)") {
      graft.text.Bpe.learn(bg, "bg_text", 1024)
    }
    // pre-token volume for the tokens/sec denominator
    val preToks = bg.select(
      sum(size(split(col("bg_text"), "\\s+")))).head().getLong(0)
    for (round <- 1 to 3) {
      val (total, dt) = time(s"apply round $round") {
        val t0 = System.nanoTime()
        val s = graft.text.Bpe.withTokenCount(bg, "bg_text", "n", merges)
          .agg(sum(col("n"))).head().getLong(0)
        (s, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[bpe-probe] round $round: $total%d bpe tokens from " +
        f"$preToks%d pre-tokens over $nDocs%d docs -> " +
        f"${total / dt / 1e6}%.2f M tokens/s out, " +
        f"${preToks / dt / 1e6}%.2f M words/s in")
    }
    // the greedy-longest twin over the same pre-tokens and vocabulary
    val vocab = graft.text.WordPiece.vocabFromMerges(merges)
    for (round <- 1 to 3) {
      val (total, dt) = time(s"wordpiece round $round") {
        val t0 = System.nanoTime()
        val s = graft.text.WordPiece.withPieceCount(bg, "bg_text", "n", vocab)
          .agg(sum(col("n"))).head().getLong(0)
        (s, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[bpe-probe] wp round $round: $total%d pieces -> " +
        f"${preToks / dt / 1e6}%.2f M words/s in")
    }
    // the unigram-LM Viterbi third family (r20), same pre-tokens, costs
    // derived from the same learned merges
    val costed = graft.text.Unigram.pieceCosts(merges)
    for (round <- 1 to 3) {
      val (total, dt) = time(s"unigram round $round") {
        val t0 = System.nanoTime()
        val s = graft.text.Unigram.withPieceCount(bg, "bg_text", "n", costed)
          .agg(sum(col("n"))).head().getLong(0)
        (s, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[bpe-probe] ug round $round: $total%d pieces -> " +
        f"${preToks / dt / 1e6}%.2f M words/s in")
    }
    spark.stop()
  }
}
