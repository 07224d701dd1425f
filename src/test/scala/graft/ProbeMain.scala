package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.NearDup

// Throwaway profiling probe — test scope only, never ships in the library
// artifact. Run with: sbt "Test/runMain graft.ProbeMain".
// Stage timings use queryExecution.toRdd.count() — a plain count() lets
// Catalyst prune the very projections being measured.
object ProbeMain {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    spark.read.parquet(s"$dir/nation.parquet").groupBy("n_regionkey")
      .agg(count("*")).collect()

    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val mutated = d.select((col("doc_id") + 1000000).as("doc_id"),
      regexp_replace(NearDup.normalize(col("text")), "\\s+\\S+$", "")
        .as("text"))
    val corpus = d.unionAll(mutated)

    val sigDf = time("ophSignatures materialize") {
      val s = NearDup.ophSignatures(corpus, "text", "doc_id", 64, 3)
        .select("__id", "__sig", "__sh").cache()
      println(s"[probe]   sig rows = ${s.queryExecution.toRdd.count()}")
      s
    }
    time("ophSignatures cached pass") {
      println(s"[probe]   sig rows = ${sigDf.queryExecution.toRdd.count()}")
    }
    val full = time("full minhashPairs") {
      val p = NearDup.minhashPairs(corpus, "text", "doc_id", threshold = 0.5)
        .cache()
      println(s"[probe]   pairs = ${p.queryExecution.toRdd.count()}")
      p
    }
    // pairs are cached above, so this really is propagation-only cost
    time("clusters (propagation only)") {
      val c = NearDup.clusters(full)
      println(s"[probe]   labels = ${c.queryExecution.toRdd.count()}")
    }
    // CacheManager matches canonicalized plans — the rebuilt pipeline would
    // silently reuse the caches above unless they are dropped first
    spark.catalog.clearCache()
    time("clusters end-to-end (uncached)") {
      val p = NearDup.minhashPairs(corpus, "text", "doc_id", threshold = 0.5)
      val c = NearDup.clusters(p)
      println(s"[probe]   labels = ${c.queryExecution.toRdd.count()}")
    }
    spark.stop()
  }
}
