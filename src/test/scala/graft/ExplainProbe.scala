package graft
import org.apache.spark.sql.SparkSession
object ExplainProbe {
  def time[A](l: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $l%-40s ${(System.nanoTime()-t0)/1e9}%.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (r <- 1 to 3; q <- Seq("q_events_window_stream",
        "q_events_sessionize_stream", "q_dedup_stream_run")) {
      time(s"[$r] $q") {
        val b = graft.util.CacheHygiene.snapshot(spark)
        SparkEntry.queries(q)(spark, dir).count()
        graft.util.CacheHygiene.releaseNew(spark, b) }
    }
    spark.stop()
  }
}
