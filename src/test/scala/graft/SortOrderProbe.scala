package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

// Throwaway r21 experiment — test scope only. Compares "project then
// orderBy" (current query shape: the range-exchange sample evaluates the
// full expensive projection, then the map stage evaluates it again)
// against "orderBy raw keys then project" (sample sees only raw columns,
// projection evaluated once, post-shuffle).
// Run: sbt "Test/runMain graft.SortOrderProbe"
object SortOrderProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (256L << 10).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.load(spark, dir, "nation").groupBy("n_regionkey").count().collect()

    def timeIt(label: String)(f: => Unit): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"[exp] $label%-18s iter$i ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
    }

    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast(StringType).as("l_quantity"),
        when(col("l_discount") > 0.05, lit("yes")).otherwise(lit("no"))
          .as("disc_flag"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_str"))

    // current shape: convert → orderBy(output cols)
    timeIt("proj-then-sort") {
      ops.TypeConvert(auto = true)(li).df
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
        .write.format("noop").mode("overwrite").save()
    }
    // candidate: orderBy raw unique key → convert (projection after sort)
    timeIt("sort-then-proj") {
      ops.TypeConvert(auto = true)(li.orderBy("l_orderkey", "l_linenumber")).df
        .write.format("noop").mode("overwrite").save()
    }
    println("[exp] candidate plan:")
    println(ops.TypeConvert(auto = true)(
        li.orderBy("l_orderkey", "l_linenumber")).df
      .queryExecution.executedPlan.treeString.take(4000))
    spark.stop()
  }
}
