package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.util.Exprs._

/** Datetime-parsing operator — the DECLARED contract
  * (`/root/reference/main.py:290-298`, `methods/dateTimeParsing.py:3-28`,
  * SURVEY.md §2.13).
  *
  * Note (load-bearing reference finding): at reference runtime this stage
  * ALWAYS fails with a TypeError and is skipped
  * (`missing_values_log.txt:10-11`; `pipeline.py:341-348` passes kwargs the
  * function doesn't accept). We implement the capability the API declares:
  * per string column, parse through a format chain; replace the column only
  * when >50% of non-null values parse; optionally derive
  * year/month/day/hour/dayofweek feature columns.
  *
  * One ratio job + one projection. Pandas infers the format per value; we
  * use an explicit `coalesce(try_to_timestamp…)` chain (SURVEY §7.5(4)).
  */
final case class DatetimeParse(
    columns: Seq[String] = Nil,
    format: Option[String] = None,
    extractFeatures: Boolean = false,
    minParseRatio: Double = 0.5,
    formats: Seq[String] = TypeConvert.DefaultFormats) extends Op {

  val name = "datetime_parsing"

  private def parse(c: Column): Column = format match {
    case Some(f) => tryTimestamp(trim(c.cast(StringType)), f)
    case None => tryTimestampChain(trim(c.cast(StringType)), formats)
  }

  def apply(df: DataFrame): OpResult = {
    val targets = if (columns.nonEmpty) columns else colsOfType(df, isString)
    if (targets.isEmpty) return OpResult(df, Seq("no string columns"))
    val aggs = targets.flatMap { c => Seq(
      count(col(c)).as(s"${c}__n"),
      count(parse(col(c))).as(s"${c}__ok"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val converted = targets.filter { c =>
      val n = row.getLong(row.fieldIndex(s"${c}__n"))
      n > 0 && row.getLong(row.fieldIndex(s"${c}__ok")) > minParseRatio * n
    }
    val base = df.select(df.columns.map(c =>
      if (converted.contains(c)) parse(col(c)).as(c) else col(c)).toSeq: _*)
    val out =
      if (!extractFeatures) base
      else converted.foldLeft(base) { (d, c) =>
        d.withColumn(s"${c}_year", year(col(c)).cast(LongType))
          .withColumn(s"${c}_month", month(col(c)).cast(LongType))
          .withColumn(s"${c}_day", dayofmonth(col(c)).cast(LongType))
          .withColumn(s"${c}_hour", hour(col(c)).cast(LongType))
          .withColumn(s"${c}_dayofweek", dayofweek(col(c)).cast(LongType))
      }
    OpResult(out, converted.map(c => s"$c -> timestamp"))
  }
}
