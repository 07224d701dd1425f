package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import graft.sources.Csv

class CsvSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("graft_csv").toString

  private def writeRaw(lines: Seq[String]): String = {
    val f = Files.createTempFile("graft_in", ".csv")
    Files.write(f, lines.mkString("\n").getBytes)
    f.toString
  }

  test("csv read is all-strings; inference applies reference heuristics") {
    val in = writeRaw(Seq(
      "id,price,flag,when,name",
      "1,10.5,yes,2024-01-01,alice",
      "2,20.0,no,2024-02-03,bob",
      "3,abc,yes,2024-03-04,carol")) // 2/3 numeric = 66% < 70% -> stays string
    val raw = Csv.read(spark, in)
    assert(raw.schema.fields.forall(_.dataType == StringType))
    val inf = Csv.readInferred(spark, in)
    val types = inf.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("id") == LongType)
    assert(types("price") == StringType) // below 70% threshold
    assert(types("flag") == BooleanType)
    assert(types("when") == TimestampType)
    assert(types("name") == StringType)
  }

  test("orc roundtrip preserves types and values exactly (incl. nulls)") {
    import graft.sources.Orc
    import spark.implicits._
    val dir = tmpDir() + "/orc"
    val src = Seq(
      (1L, Some(10.5), Some("alice"),
        Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))),
      (2L, None, Some(""), None),
      (3L, Some(-0.0), None,
        Some(java.sql.Timestamp.valueOf("1969-12-31 23:59:59.5"))),
      (4L, Some(1e308), Some("碎片 β"),
        Some(java.sql.Timestamp.valueOf("2024-06-01 12:34:56.789012"))))
      .toDF("id", "price", "name", "at")
    Orc.write(src, dir)
    val back = Orc.read(spark, dir).orderBy("id")
    // file sources read every column nullable — compare name + type
    // (values below catch any actual null corruption)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    // KNOWN ORC QUIRK, pinned (documented in sources/Orc.scala): a
    // pre-epoch timestamp with a sub-second component comes back shifted
    // forward one second — ORC encodes (floor-seconds, positive nanos)
    // and Spark's writer/reader pair disagree on the floor for negative
    // seconds. Row 3 asserts the CURRENT broken value so a Spark/ORC
    // upgrade that fixes it fails here and the scaladoc warning can be
    // dropped; every post-epoch row must roundtrip exactly.
    val rows = back.collect()
    assert(rows(2).getTimestamp(3) ==
      java.sql.Timestamp.valueOf("1970-01-01 00:00:00.5"),
      s"pre-epoch ORC quirk changed: ${rows(2)}")
    val exact = src.orderBy("id").collect().toSeq
    assert(rows(0) == exact(0) && rows(1) == exact(1) && rows(3) == exact(3))
  }

  test("avro roundtrip preserves types and values exactly " +
      "(incl. nulls and pre-epoch timestamps)") {
    import graft.sources.Avro
    import spark.implicits._
    val dir = tmpDir() + "/avro"
    val src = Seq(
      (1L, Some(10.5), Some("alice"),
        Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))),
      (2L, None, Some(""), None),
      (3L, Some(-0.0), None,
        Some(java.sql.Timestamp.valueOf("1969-12-31 23:59:59.5"))),
      (4L, Some(1e308), Some("碎片 β"),
        Some(java.sql.Timestamp.valueOf("2024-06-01 12:34:56.789012"))))
      .toDF("id", "price", "name", "at")
    Avro.write(src, dir)
    val back = Avro.read(spark, dir).orderBy("id")
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    // unlike the ORC pair (pinned above), Avro's timestamp-micros is a
    // signed long of epoch micros — the PRE-EPOCH sub-second row must
    // roundtrip exactly too
    assert(back.collect().toSeq == src.orderBy("id").collect().toSeq)
  }

  test("avro resolves by FQCN only in this distribution (documented)") {
    // sources/Avro.scala registers by class name because the bundle
    // ships the module without its DataSourceRegister entry. If a future
    // jar set adds the service entry, this pin fails and the scaladoc
    // (and this test) should switch to the short name.
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((1L, "x")).toDF("a", "b").write.format("avro")
        .mode("overwrite").save(tmpDir() + "/avro_short")
    }
    assert(e.getMessage.contains("Failed to find data source"),
      e.getMessage)
  }

  test("cleanCsv runs the reference lifecycle: csv -> pipeline -> csv") {
    val in = writeRaw(Seq(
      "id,amount,city",
      "1,10,  Paris ",
      "2,20,london",
      "2,20,london",
      "3,,berlin",
      "4,1000,rome"))
    val outDir = tmpDir() + "/cleaned"
    val (cleaned, report) = Csv.cleanCsv(spark, in,
      """{"data_type_conversion": {"enabled": true},
        | "text_cleaning": {"enabled": true,
        |                   "operations": ["lowercase", "remove_extra_spaces"]},
        | "duplicates": {"enabled": true},
        | "normalization": {"enabled": true, "method": "minmax",
        |                   "columns": ["amount"]}}""".stripMargin,
      outDir)
    assert(report.errors.isEmpty)
    assert(cleaned.count() == 4) // dup row collapsed
    val back = Csv.read(spark, outDir)
    assert(back.count() == 4)
    val cities = back.select("city").collect().map(_.getString(0)).toSet
    assert(cities == Set("paris", "london", "berlin", "rome"))
  }

  test("jsonl roundtrip survives quotes, unicode, newlines and nulls") {
    import graft.sources.Jsonl
    import spark.implicits._
    val rows = Seq(
      (1L, "plain text", "en"),
      (2L, "with \"quotes\" and a\nnewline and a\ttab", "en"),
      (3L, "unicode: 中文 émojis é", "zh"),
      (4L, null.asInstanceOf[String], "de"))
    val df = rows.toDF("id", "text", "lang")
    val dir = tmpDir() + "/jsonl"
    Jsonl.write(df, dir)
    // explicit-schema read (the production path — no inference scan)
    val back = Jsonl.read(spark, dir, Some(df.schema))
      .select("id", "text", "lang").orderBy("id").collect()
    assert(back.length == 4)
    assert(back(1).getString(1) == rows(1)._2, "JSON escaping must roundtrip")
    assert(back(2).getString(1) == rows(2)._2, "unicode must roundtrip")
    assert(back(3).isNullAt(1), "null fields must stay null")
    // inferred read finds the same values (columns come back alphabetical)
    val inferred = Jsonl.read(spark, dir).select("id", "text", "lang")
      .orderBy("id").collect()
    assert(inferred.map(_.toSeq).toSeq == back.map(_.toSeq).toSeq)
  }
}
