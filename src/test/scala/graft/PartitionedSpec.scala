package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.sources.Partitioned

/** Hive-partitioned write + partition-PRUNED read (r14 verdict #1: the
  * one 100 TB mechanism no query exercised). Pins the three claims the
  * module makes: the layout bounds file counts, a partition-column
  * filter prunes at the directory level (PartitionFilters in the scan,
  * only that value's files read), and partition-value typing is a
  * stable explicit contract. */
class PartitionedSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def scratch(tag: String): String =
    s"/tmp/graft_part_spec_${ProcessHandle.current().pid()}_$tag"
  private def rm(p: String): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    ()
  }

  test("write lays out hive directories and bounds files per partition") {
    val p = scratch("layout")
    try {
      val docs = Tables.load(spark, sf, "documents")
      Partitioned.write(docs, p, Seq("lang"), filesPerPartition = 2,
        bucketBy = Seq("doc_id"))
      val dirs = new java.io.File(p).listFiles().filter(_.isDirectory)
        .map(_.getName).sorted
      assert(dirs.nonEmpty && dirs.forall(_.startsWith("lang=")), dirs.toSeq)
      // the routing shuffle caps each directory at filesPerPartition
      // part files (vs up to numTasks without it)
      dirs.foreach { d =>
        val parts = new java.io.File(s"$p/$d").listFiles()
          .count(_.getName.startsWith("part-"))
        assert(parts <= 2, s"$d has $parts part files, bound is 2")
      }
      // roundtrip: full read-back equals the source
      val back = Partitioned.read(spark, p)
        .select(docs.columns.map(col).toIndexedSeq: _*)
      assert(back.orderBy("doc_id").collect().toSeq ==
        docs.orderBy("doc_id").collect().toSeq)
    } finally rm(p)
  }

  test("a partition-column predicate prunes directories, not rows") {
    val p = scratch("prune")
    try {
      Partitioned.write(Tables.load(spark, sf, "documents"), p, Seq("lang"),
        filesPerPartition = 2, bucketBy = Seq("doc_id"))
      val pruned = Partitioned.read(spark, p).where(col("lang") === "en")
      val plan = pruned.queryExecution.executedPlan.toString
      // the filter must reach the scan as a PARTITION filter (planning-
      // time directory pruning), not ride as a data filter
      val pf = plan.linesIterator
        .find(_.contains("PartitionFilters: ["))
        .getOrElse(fail(s"no PartitionFilters in plan:\n$plan"))
      assert(pf.contains("lang"), s"lang not in PartitionFilters: $pf")
      // and the files actually read are exactly the lang=en directory
      // (inputFiles is pre-pruning; the scan's selectedPartitions is the
      // post-pruning truth)
      val scan = pruned.queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail(s"no FileSourceScanExec in:\n$plan"))
      val files = scan.selectedPartitions.toPartitionArray
        .map(_.filePath.toString)
      assert(files.nonEmpty && files.forall(_.contains("/lang=en/")),
        files.take(5).toSeq)
      // correctness of the pruned slice
      assert(pruned.count() ==
        Tables.load(spark, sf, "documents")
          .where(col("lang") === "en").count())
    } finally rm(p)
  }

  test("partition-value typing is an explicit per-read contract") {
    val p = scratch("types")
    try {
      // int-looking partition values: the divergent-inference case
      val df = Seq((1L, 10), (2L, 10), (3L, 20)).toDF("id", "bucket")
      Partitioned.write(df, p, Seq("bucket"))
      val asString = Partitioned.read(spark, p)
      assert(asString.schema("bucket").dataType == StringType,
        "inferTypes=false must read partition values as string")
      val inferred = Partitioned.read(spark, p, inferTypes = true)
      assert(inferred.schema("bucket").dataType == IntegerType,
        "inferTypes=true must use Spark's directory-name inference")
      // values survive either way
      assert(asString.select("id", "bucket").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "10"), (2L, "10"), (3L, "20")))
      // the session conf is restored after the read resolves
      val key = "spark.sql.sources.partitionColumnTypeInference.enabled"
      val before = spark.conf.getOption(key)
      Partitioned.read(spark, p, inferTypes = true)
      assert(spark.conf.getOption(key) == before,
        "read must restore the partition-inference session conf")
    } finally rm(p)
  }
}
