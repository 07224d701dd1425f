package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.NearDup

// r22 measurement probe (r20 verdict #1, carried through r21 verdict #7):
// the driver→distributed clustering crossover, measured on a REALISTIC
// duplicate-density corpus (the perturbed sf10p build) instead of argued
// from the 2^21 constant. Builds the q_neardup_clusters pair list at the
// given sf dir, then resolves connected components BOTH ways — driver
// union-find (maxDriverEdges = MaxValue) and distributed pointer-jumping
// (maxDriverEdges = 0) — timing each and asserting identical labels.
// Test scope only; never on the bench or verify path.
//
// Run: SPARK_GRAFT_SF_DIR=/tmp/sf10p SPARK_DRIVER_MEM=48g \
//      sbt "Test/runMain graft.ClustersCrossoverProbe"
object ClustersCrossoverProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10p")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (256L << 10).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the exact q_neardup_clusters pair pipeline (SparkEntry), minus the
    // final orderBy — the probe measures RESOLUTION, so the pair list is
    // built once and both paths read the same cached frame
    val d = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val mutated = d.select((col("doc_id") + 1000000).as("doc_id"),
      regexp_replace(NearDup.normalize(col("text")), "\\s+\\S+$", "")
        .as("text"))
    val batches = sys.env.get("SPARK_GRAFT_BUCKET_BATCHES")
      .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(1)
    val t0 = System.nanoTime()
    val pairs = NearDup.minhashPairs(d.unionAll(mutated), "text", "doc_id",
      threshold = 0.5, bucketBatches = batches)
    val nEdges = pairs.count()
    println(f"[xover] pair list built: $nEdges%d edges in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s (batches=$batches)")

    def run(tag: String, maxDriverEdges: Long): (Double, Long, String) = {
      val t = System.nanoTime()
      val out = NearDup.clusters(pairs, maxDriverEdges = maxDriverEdges)
      val wall = (System.nanoTime() - t) / 1e9
      val n = out.count()
      // decimal sum: a long sum of 64-bit hashes overflows under ANSI
      val fp = out.agg(sum(xxhash64(col("id"), col("cluster"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .head().getDecimal(0).toString
      out.unpersist(false)
      println(f"[xover] $tag%-12s ${wall}%8.2f s  rows=$n%d  fp=$fp%s")
      (wall, n, fp)
    }
    // driver first (it is the incumbent), then distributed
    val (dw, dn, dfp) = run("driver", Long.MaxValue)
    val (xw, xn, xfp) = run("distributed", 0L)
    assert(dn == xn && dfp == xfp,
      s"label parity violated: driver ($dn, $dfp) vs distributed ($xn, $xfp)")
    println(f"[xover] edges=$nEdges%d driver=${dw}%.2f s " +
      f"distributed=${xw}%.2f s ratio=${xw / dw}%.2f")
    pairs.unpersist(false)
    spark.stop()
  }
}
