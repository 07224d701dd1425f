package graft

import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the corpus loader's NTZ→LTZ normalization (Tables.scala). The r13
  * corpus generator silently switched `ts` to plain `timestamp[us]` —
  * which Spark 4 infers as TIMESTAMP_NTZ, a type event-time watermarks
  * REJECT — and the break was only caught live at verify time. This spec
  * makes the next generator format drift fail in CI instead. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private def scratch(name: String): String =
    s"/tmp/graft_tables_spec_${ProcessHandle.current().pid()}_$name"

  test("an NTZ parquet loads as TimestampType, value-preserving, " +
      "and a watermark accepts it") {
    val dir = scratch("flat")
    // LocalDateTime encodes as TIMESTAMP_NTZ — the same schema the r13
    // generator ships (timestamp[us] with no UTC flag)
    val rows = Seq(
      (1L, LocalDateTime.of(2026, 1, 2, 3, 4, 5)),
      (2L, LocalDateTime.of(2026, 1, 2, 4, 0, 0)))
    rows.toDF("id", "ts").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    try {
      val raw = spark.read.parquet(s"$dir/events.parquet")
      assert(raw.schema("ts").dataType == TimestampNTZType,
        s"precondition: the staged file must read back as NTZ, got " +
          s"${raw.schema("ts").dataType}")
      val df = Tables.load(spark, dir, "events")
      assert(df.schema("ts").dataType == TimestampType)
      // value-preserving under the pinned UTC session: identical micros
      val micros = df.select(unix_micros(col("ts"))).orderBy("ts")
        .collect().map(_.getLong(0)).toSeq
      assert(micros == Seq(
        java.time.Instant.parse("2026-01-02T03:04:05Z"),
        java.time.Instant.parse("2026-01-02T04:00:00Z"))
        .map(i => i.getEpochSecond * 1000000L))
      // the actual r13 failure mode: a watermark must accept the column
      // (this throws EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ)
      df.withWatermark("ts", "1 hour")
      ()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      ()
    }
  }

  test("NTZ nested in a struct/array normalizes too (ADVICE r13)") {
    val dir = scratch("nested")
    Seq((1L, (LocalDateTime.of(2026, 3, 1, 0, 0, 0), "x"),
        Seq(LocalDateTime.of(2026, 3, 2, 0, 0, 0))))
      .toDF("id", "meta", "stamps")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    try {
      val df = Tables.load(spark, dir, "events")
      val metaType = df.schema("meta").dataType.asInstanceOf[StructType]
      assert(metaType.fields.head.dataType == TimestampType, metaType)
      val elemType =
        df.schema("stamps").dataType.asInstanceOf[ArrayType].elementType
      assert(elemType == TimestampType)
      // nested values preserved (same micros through the struct cast)
      val got = df.select(unix_micros(col("meta._1"))).head().getLong(0)
      assert(got ==
        java.time.Instant.parse("2026-03-01T00:00:00Z").getEpochSecond * 1000000L)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      ()
    }
  }

  test("already-LTZ and non-timestamp schemas pass through untouched") {
    val dir = scratch("ltz")
    Seq((1L, new java.sql.Timestamp(1000L), "a"))
      .toDF("id", "ts", "s").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    try {
      val df = Tables.load(spark, dir, "events")
      assert(df.schema("ts").dataType == TimestampType)
      assert(df.schema("s").dataType == StringType)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      ()
    }
  }
}
