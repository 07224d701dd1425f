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
