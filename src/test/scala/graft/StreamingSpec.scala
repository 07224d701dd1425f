package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Events

/** Multi-batch Structured Streaming equivalence at sf0.01 (10 k events):
  * the streaming execution paths (micro-batch state merge, watermark
  * advance, event-time timeouts) against the oracle-green batch twins.
  * The tiny-feed ExtensionsSpec tests pin the semantics; these pin the
  * incremental execution — a micro-batch boundary bug (late data, state
  * carry, timeout math) shows up here and nowhere else in the suite.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("streamingTumbling over 4 shuffled micro-batches equals batch stats") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Events.load(spark, dir)
      .select($"ts".as[java.sql.Timestamp], $"event_type".as[String],
        $"value".as[Double]).collect().toSeq
    // deterministic shuffle: arrival order is decoupled from event time,
    // so every batch delivers late rows relative to earlier batches; in
    // complete mode no aggregate state is evicted, so the final table
    // must equal the batch aggregation exactly
    val shuffled = new scala.util.Random(42).shuffle(rows)
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = Events.streamingTumbling(
        mem.toDF.toDF("ts", "event_type", "value"), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("mb_tumbling")
      .outputMode("complete").start()
    try {
      var batches = 0
      shuffled.grouped((shuffled.size + 3) / 4).foreach { b =>
        mem.addData(b); q.processAllAvailable(); batches += 1
      }
      assert(batches == 4)
      val got = spark.table("mb_tumbling")
        .select($"window_start", $"event_type", $"n_events",
          round($"avg_value", 6).as("avg_value"))
        .orderBy("window_start", "event_type").collect().toSeq
      val want = Events.tumblingStats(Events.load(spark, dir), "1 hour")
        .orderBy("window_start", "event_type").collect().toSeq
      assert(want.nonEmpty && got == want)
    } finally q.stop()
  }

  test("streamingHopping over 3 shuffled micro-batches equals batch stats") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Events.load(spark, dir)
      .select($"ts".as[java.sql.Timestamp], $"event_type".as[String],
        $"value".as[Double]).collect().toSeq
    val shuffled = new scala.util.Random(7).shuffle(rows)
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = Events.streamingHopping(
        mem.toDF.toDF("ts", "event_type", "value"),
        "1 hour", "30 minutes", "2 hours")
      .writeStream.format("memory").queryName("mb_hopping")
      .outputMode("complete").start()
    try {
      shuffled.grouped((shuffled.size + 2) / 3).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      val got = spark.table("mb_hopping")
        .select($"window_start_sec", $"event_type", $"n_events",
          round($"avg_value", 6).as("avg_value"))
        .orderBy("window_start_sec", "event_type").collect().toSeq
      val want = Events.hoppingStats(Events.load(spark, dir),
          "1 hour", "30 minutes")
        .orderBy("window_start_sec", "event_type").collect().toSeq
      assert(want.nonEmpty && got == want)
    } finally q.stop()
  }

  test("streamingSessionize over 3 ordered micro-batches equals batch sessionize") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Events.load(spark, dir)
      .select($"user_id".as[Long], $"ts".as[java.sql.Timestamp],
        $"event_id".as[Long])
      .collect().toSeq.sortBy(r => (r._2.getTime, r._3))
    val gap = 1800L
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val q = Events.streamingSessionize(
        mem.toDF.toDF("user_id", "ts", "event_id"), gap)
      .writeStream.format("memory").queryName("mb_sessions")
      .outputMode("append").start()
    try {
      // event-time-ordered feed: the regime the batch twin models (its
      // window sorts globally). Per-user cross-batch order is preserved,
      // and watermark delay = 2·gap guarantees any event arriving after a
      // user's timeout fired is > gap past the closed session's end — so
      // the streaming session cuts must equal the batch cuts exactly.
      ev.grouped((ev.size + 2) / 3).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      // two far-future sentinel batches: the first advances max event
      // time, the second's recomputed watermark fires every pending
      // event-time timeout so all real sessions flush
      val maxTs = ev.map(_._2.getTime).max
      def sentinel(id: Long, atMs: Long) =
        (id, new java.sql.Timestamp(atMs), 10_000_000L + id)
      mem.addData(sentinel(-1L, maxTs + gap * 1000L * 10))
      q.processAllAvailable()
      mem.addData(sentinel(-2L, maxTs + gap * 1000L * 20))
      q.processAllAvailable()

      val got = spark.table("mb_sessions")
        .where($"user_id" >= 0)
        .select($"user_id", $"n_events",
          round($"start_sec", 6).as("start_sec"),
          round($"duration_sec", 6).as("duration_sec"))
        .orderBy("user_id", "start_sec").collect().toSeq
      val want = Events.sessionize(
          Events.load(spark, dir).select("user_id", "ts", "event_id"), gap)
        .select($"user_id", $"n_events", $"start_sec", $"duration_sec")
        .orderBy("user_id", "start_sec").collect().toSeq
      assert(want.size > 100, s"expected real session volume, got ${want.size}")
      assert(got == want)
    } finally q.stop()
  }

  test("streamingExact dedup over 4 micro-batches equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Events.load(spark, dir)
      .select($"ts".as[java.sql.Timestamp], $"event_id".as[Long],
        $"user_id".as[Long], $"event_type".as[String])
      .collect().toSeq.sortBy(r => (r._1.getTime, r._2))
    val mem = MemoryStream[(java.sql.Timestamp, Long, Long, String)]
    // watermark wider than the corpus time span: state outlives the feed,
    // so the "within watermark" scope equals the twin's global dedup and
    // the comparison stays exact while micro-batch state carry is still
    // exercised (ties resolve by arrival order = the twin's (ts, id))
    val q = graft.ops.Dedup.streamingExact(
        mem.toDF.toDF("ts", "event_id", "user_id", "event_type"),
        "ts", "3650 days", Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("mb_dedup")
      .outputMode("append").start()
    try {
      ev.grouped((ev.size + 3) / 4).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      val got = spark.table("mb_dedup")
        .select($"event_id".as[Long]).collect().sorted.toSeq
      val want = graft.ops.Dedup.streamTwinExact(
          Events.load(spark, dir), "ts", Seq("user_id", "event_type"),
          "event_id")
        .select($"event_id".as[Long]).collect().sorted.toSeq
      assert(want.nonEmpty && got == want)
    } finally q.stop()
  }
}
