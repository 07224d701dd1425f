package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

// Optimization-round measurement probe — test scope only, never ships in
// the library artifact. For each named SparkEntry query it:
//   1. writes the pre-execution `.explain("formatted")` to
//      plans/<tag>/<name>_<suffix>.txt (the judge-checkable plan artifact);
//   2. runs the query N times through the Bench noop-sink contract
//      (cache hygiene between runs) printing per-iteration wall time;
//   3. prints a per-stage table for the LAST iteration (duration, task
//      time, input/shuffle bytes, task count) from a SparkListener —
//      local-mode stand-in for the Spark UI stage page (guide §1.1/§7.1).
// Run: sbt "Test/runMain graft.StageProbe <tag> <suffix> q_a q_b ..."
//   SPARK_GRAFT_SF_DIR picks the corpus (default sf0.1);
//   SPARK_GRAFT_PROBE_ITERS the repeat count (default 3).
object StageProbe {
  final case class St(var durMs: Long = 0, var taskMs: Long = 0,
    var inBytes: Long = 0, var shRead: Long = 0, var shWrite: Long = 0,
    var spill: Long = 0, var tasks: Int = 0, var name: String = "")

  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (256L << 10).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup as Bench: parquet reader + codegen agg + exchange paths
    Tables.load(spark, dir, "nation").groupBy("n_regionkey").count().collect()

    val stages = new ConcurrentHashMap[Int, St]()
    @volatile var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val i = e.stageInfo
          val m = i.taskMetrics
          val st = St(
            durMs = (for {a <- i.completionTime; b <- i.submissionTime}
              yield a - b).getOrElse(0L),
            taskMs = m.executorRunTime,
            inBytes = m.inputMetrics.bytesRead,
            shRead = m.shuffleReadMetrics.totalBytesRead,
            shWrite = m.shuffleWriteMetrics.bytesWritten,
            spill = m.diskBytesSpilled,
            tasks = i.numTasks, name = i.name.take(60))
          if (sys.env.contains("SPARK_GRAFT_PROBE_DETAILS"))
            println(s"[probe-details] stage ${i.stageId} (${i.numTasks} tasks):\n" +
              i.details.linesIterator.take(8).map("    " + _).mkString("\n"))
          stages.put(i.stageId, st)
        }
      override def onJobStart(e: SparkListenerJobStart): Unit = ()
    })

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"plans/$tag"))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"plans/$tag/${name}_$suffix.txt"), plan)
      var last = 0.0
      for (i <- 1 to iters) {
        val before = graft.util.CacheHygiene.snapshot(spark)
        collecting = i == iters
        if (collecting) stages.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        last = (System.nanoTime() - t0) / 1e9
        collecting = false
        graft.util.CacheHygiene.releaseNew(spark, before)
        println(f"[probe] $name%-28s iter$i ${last}%8.3f s")
      }
      import scala.jdk.CollectionConverters._
      val rows = stages.asScala.toSeq.sortBy(-_._2.durMs).take(14)
      println(f"[probe] $name stages (last iter, by wall ms):")
      println(f"[probe]   ${"stage"}%6s ${"wall"}%7s ${"task"}%8s " +
        f"${"input"}%9s ${"shRead"}%9s ${"shWrite"}%9s ${"spill"}%8s ${"n"}%4s  name")
      rows.foreach { case (id, s) =>
        println(f"[probe]   $id%6d ${s.durMs}%7d ${s.taskMs}%8d " +
          f"${s.inBytes}%9d ${s.shRead}%9d ${s.shWrite}%9d ${s.spill}%8d " +
          f"${s.tasks}%4d  ${s.name}")
      }
    }
    spark.stop()
  }
}
