package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.ops.Stats

// Throwaway profiling probe — test scope only, never ships in the library
// artifact. Run with: sbt "Test/runMain graft.ProbeMain".
// Current target: q_scaling_stats (3.6 s idle vs 1.79 s best-known) —
// attribute the regression between the Stats.numeric percentile pass and
// the skew/kurtosis pass, vs the built-in percentile as the yardstick.
object ProbeMain {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-36s ${(System.nanoTime() - t0) / 1e9}%.3f s")
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
    spark.read.parquet(s"$dir/nation.parquet").groupBy("n_regionkey")
      .agg(count("*")).collect()

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    println(s"[probe] rows = ${li.count()}")
    val distinct = li.agg(
      countDistinct(col("l_quantity")).as("q"),
      countDistinct(col("l_extendedprice")).as("p"),
      countDistinct(col("l_discount")).as("d")).head()
    println(s"[probe] distincts = $distinct")

    for (round <- 1 to 3) {
      time(s"[$round] q_neardup_clusters e2e") {
        val before = graft.util.CacheHygiene.snapshot(spark)
        SparkEntry.queries("q_neardup_clusters")(spark, dir).count()
        graft.util.CacheHygiene.releaseNew(spark, before)
      }
      time(s"[$round] q_neardup_minhash e2e") {
        val before = graft.util.CacheHygiene.snapshot(spark)
        SparkEntry.queries("q_neardup_minhash")(spark, dir).count()
        graft.util.CacheHygiene.releaseNew(spark, before)
      }
      time(s"[$round] Stats.numeric full need") {
        Stats.numeric(li, cols,
          Stats.Need(moments = true, extremes = true, quantiles = true))
      }
      time(s"[$round] Stats.numeric moments only") {
        Stats.numeric(li, cols, Stats.Need(moments = true, extremes = true))
      }
      time(s"[$round] Stats.numeric quantiles only") {
        Stats.numeric(li, cols, Stats.Need(quantiles = true))
      }
      time(s"[$round] builtin percentile x3") {
        li.agg(
          percentile_approx(col(cols.head).cast(DoubleType),
            array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("pa"),
          call_function("percentile", col(cols(1)).cast(DoubleType),
            array(lit(0.25), lit(0.5), lit(0.75))).as("p1"),
          call_function("percentile", col(cols(2)).cast(DoubleType),
            array(lit(0.25), lit(0.5), lit(0.75))).as("p2")).head()
      }
      time(s"[$round] builtin percentile all3") {
        li.agg(
          call_function("percentile", col(cols.head).cast(DoubleType),
            array(lit(0.25), lit(0.5), lit(0.75))).as("p0"),
          call_function("percentile", col(cols(1)).cast(DoubleType),
            array(lit(0.25), lit(0.5), lit(0.75))).as("p1"),
          call_function("percentile", col(cols(2)).cast(DoubleType),
            array(lit(0.25), lit(0.5), lit(0.75))).as("p2")).head()
      }
      time(s"[$round] skew/kurt agg") {
        val aggs = cols.flatMap(c => Seq(
          skewness(col(c).cast(DoubleType)).as(s"${c}__sk"),
          kurtosis(col(c).cast(DoubleType)).as(s"${c}__ku")))
        li.agg(aggs.head, aggs.tail: _*).head()
      }
    }
    spark.stop()
  }
}
