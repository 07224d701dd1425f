package graft

import org.apache.spark.sql.SparkSession

// Plan-inspection probe — test scope only, never ships in the library
// artifact. Prints the executed plan of a named SparkEntry query so
// ".explain and iterate" doesn't need a hand-written harness each time.
// Run: sbt "Test/runMain graft.ExplainProbe q_name [sfDir]"
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, dir)
    println(df.queryExecution.executedPlan.treeString.take(20000))
    spark.stop()
  }
}
