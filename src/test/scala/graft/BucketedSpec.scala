package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Bucketed

/** The bucketed layout's one promise is plan-shaped: a join of two
  * co-bucketed tables on their bucket keys moves ZERO rows — no
  * Exchange on either side — and produces exactly the rows a plain
  * join would. Both halves pinned here (broadcast disabled so the
  * no-Exchange claim is about bucketing, not about one side being
  * small enough to broadcast). */
class BucketedSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val scratch =
    s"/tmp/graft_bucketed_spec_${ProcessHandle.current().pid()}"

  private def withNoBroadcast[T](body: => T): T = {
    val k = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(k)
    try { spark.conf.set(k, "-1"); body }
    finally spark.conf.set(k, prev)
  }

  private def writeBoth(): Unit = {
    Bucketed.writeTable(
      Tables.load(spark, sf, "orders").select("o_orderkey", "o_orderpriority"),
      "graft_spec_orders_bkt", s"${scratch}_orders", 4, "o_orderkey")
    Bucketed.writeTable(
      Tables.load(spark, sf, "lineitem")
        .select("l_orderkey", "l_extendedprice"),
      "graft_spec_lineitem_bkt", s"${scratch}_lineitem", 4, "l_orderkey")
  }

  private def joined(): DataFrame = Bucketed.colocatedJoin(spark,
    "graft_spec_orders_bkt", "graft_spec_lineitem_bkt",
    "o_orderkey", "l_orderkey")

  test("co-bucketed join plans with zero Exchange and matches a plain join") {
    writeBoth()
    try withNoBroadcast {
      val p = joined().queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n$p")
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("SelectedBucketsCount"),
        s"scan must be bucket-aware:\n$p")
      // NOTE deliberately NOT asserted: Sort elimination from the
      // in-bucket sortBy. Spark 3+ ignores bucket sort order at scan
      // (spark.sql.legacy.bucketedTableScan.outputOrdering defaults
      // false — multi-file buckets break it), so the SMJ re-sorts
      // WITHIN partitions: no shuffle, in-memory per-bucket sort. The
      // zero-Exchange property above is the one that matters at scale.
      // value parity: the layout must not change a single result row
      val viaBuckets = joined()
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum("l_extendedprice"), 4).as("s"))
        .orderBy("o_orderpriority").collect().toSeq
      val plain = Tables.load(spark, sf, "orders")
        .join(Tables.load(spark, sf, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum("l_extendedprice"), 4).as("s"))
        .orderBy("o_orderpriority").collect().toSeq
      assert(viaBuckets == plain)
    } finally cleanup()
  }

  test("sf1 read-side: the zero-Exchange plan survives real scale " +
      "(6M-row lineitem, 150k orders)") {
    // The r17 verdict asked for the read-side proof on sf1-BUILT
    // tables, not just the sf0.001 smoke: at 4096 rows a planner could
    // get away with anything; at 6M rows per side the no-Exchange
    // property is the one carrying the measured join delta recorded in
    // BASELINE.md ("Bucketed layout read-side delta", r18). Gated on
    // the scaling dataset being present (built by tools/make_sf1.py).
    assume(new java.io.File("/tmp/sf1/lineitem.parquet").exists(),
      "sf1 scaling dataset not present")
    val sf1 = "/tmp/sf1"
    Bucketed.writeTable(
      Tables.load(spark, sf1, "orders").select("o_orderkey", "o_orderpriority"),
      "graft_spec_orders_sf1_bkt", s"${scratch}_sf1_orders", 8, "o_orderkey")
    Bucketed.writeTable(
      Tables.load(spark, sf1, "lineitem")
        .select("l_orderkey", "l_extendedprice"),
      "graft_spec_lineitem_sf1_bkt", s"${scratch}_sf1_lineitem", 8,
      "l_orderkey")
    try withNoBroadcast {
      val j = Bucketed.colocatedJoin(spark,
        "graft_spec_orders_sf1_bkt", "graft_spec_lineitem_sf1_bkt",
        "o_orderkey", "l_orderkey")
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"sf1 co-bucketed join must not shuffle either side:\n$p")
      assert(p.contains("SelectedBucketsCount"), p)
      // and it actually runs, matching the plain (shuffled) join over
      // the SAME bucketed files row-for-row. (Not lineitem's count:
      // make_sf1.py's lineitem replicas carry offset orderkeys with no
      // matching order — only replica 0 joins, by construction.)
      val plainCount = spark.read.parquet(s"${scratch}_sf1_orders")
        .join(spark.read.parquet(s"${scratch}_sf1_lineitem"),
          col("o_orderkey") === col("l_orderkey")).count()
      assert(j.count() === plainCount && plainCount > 0L)
    } finally {
      Seq("graft_spec_orders_sf1_bkt", "graft_spec_lineitem_sf1_bkt")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      Seq(s"${scratch}_sf1_orders", s"${scratch}_sf1_lineitem").foreach { d =>
        def rec(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rec)); f.delete()
        }
        rec(new java.io.File(d))
      }
    }
  }

  test("writeTable emits exactly `buckets` data files per table") {
    writeBoth()
    try {
      val files = new java.io.File(s"${scratch}_orders").listFiles()
        .filter(f => f.getName.startsWith("part-"))
      assert(files.length == 4,
        s"expected 4 bucket files, got ${files.map(_.getName).toSeq}")
    } finally cleanup()
  }

  private def cleanup(): Unit = {
    Seq("graft_spec_orders_bkt", "graft_spec_lineitem_bkt")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Seq(s"${scratch}_orders", s"${scratch}_lineitem").foreach { d =>
      def rec(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rec)); f.delete()
      }
      rec(new java.io.File(d))
    }
  }
}
