package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.NearDup

// Throwaway profiling probe — not part of the library surface.
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
      println(s"[probe]   sig rows = ${s"ignore".length + sigDf.queryExecution.toRdd.count()}")
    }
    val r = 4
    val buckets = sigDf.select(col("__id"),
      explode(array((0 until 16).map(b =>
        struct(lit(b).as("band"), slice(col("__sig"), b * r + 1, r).as("bits"))): _*))
        .as("__bucket"))
    val a = buckets.select(col("__bucket").as("ka"), col("__id").as("id_a"))
    val b = buckets.select(col("__bucket").as("kb"), col("__id").as("id_b"))
    val pairs = a.join(b, col("ka") === col("kb") && col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    time("band join + distinct") {
      println(s"[probe]   candidate pairs = ${pairs.queryExecution.toRdd.count()}")
    }
    val pairsCached = pairs.cache()
    time("pairs materialize cache") {
      println(s"[probe]   pairs = ${pairsCached.queryExecution.toRdd.count()}")
    }
    val withSig = pairsCached
      .join(sigDf.select(col("__id").as("id_a"), col("__sig").as("sig_a"),
        col("__sh").as("sh_a")), "id_a")
      .join(sigDf.select(col("__id").as("id_b"), col("__sig").as("sig_b"),
        col("__sh").as("sh_b")), "id_b")
    time("verify joins (cached pairs)") {
      println(s"[probe]   joined = ${withSig.queryExecution.toRdd.count()}")
    }
    val full = time("full minhashPairs") {
      val p = NearDup.minhashPairs(corpus, "text", "doc_id", threshold = 0.5)
      println(s"[probe]   pairs = ${p.queryExecution.toRdd.count()}")
      p
    }
    time("clusters (propagation only)") {
      val c = NearDup.clusters(full)
      println(s"[probe]   labels = ${c.queryExecution.toRdd.count()}")
    }
    spark.stop()
  }
}
