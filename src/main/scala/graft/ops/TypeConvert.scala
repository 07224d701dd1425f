package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.util.Exprs._

/** Type-conversion operator with pandas-style auto-detection
  * (`/root/reference/methods/dataTypeConversion.py:17-216`, SURVEY.md §2.11).
  *
  * Auto rules over STRING columns, thresholds pinned to the reference:
  *  - numeric: >70% of non-null values parse as numbers
  *    (`dataTypeConversion.py:93`); all integral → LongType else DoubleType
  *  - datetime: >50% parse through the format chain (`:124`)
  *  - boolean: non-null distinct values ⊆ {true,false,1,0,yes,no,y,n,t,f}
  *    (case-insensitive) and >1 distinct (`:136-138`)
  *  - category: <50% unique ∧ <100 distinct — recorded in the result
  *    updates only; StringType is kept (parquet dictionary encoding is the
  *    storage analogue of pandas' `category`, SURVEY.md §1.2)
  *
  * Cost: one ratio-statistics job over all string columns + (only when a
  * boolean candidate exists) one tiny collect_set job on the ≤16-distinct
  * candidates + one projection. Column-count independent.
  *
  * Manual conversions: `manual` maps column → target ("int" | "float" |
  * "str" | "datetime" | "bool"); failures coerce to null (the reference's
  * errors='coerce' default).
  */
final case class TypeConvert(
    auto: Boolean = true,
    manual: Map[String, String] = Map.empty,
    datetimeFormats: Seq[String] = TypeConvert.DefaultFormats) extends Op {

  val name = "data_type_conversion"

  def apply(df: DataFrame): OpResult = {
    val manualDf = manual.foldLeft(df) { case (d, (c, t)) =>
      d.withColumn(c, TypeConvert.manualCast(col(c), t, datetimeFormats))
    }
    if (!auto) return OpResult(manualDf, manual.map { case (c, t) => s"$c -> $t" }.toSeq)
    val strCols = colsOfType(manualDf, isString).filterNot(manual.contains)
    if (strCols.isEmpty) return OpResult(manualDf, Seq("no string columns to detect"))

    // job 1: parse ratios + cardinality for every string column at once
    val aggs = strCols.flatMap { c =>
      val s = trim(col(c).cast(StringType))
      Seq(
        count(col(c)).as(s"${c}__n"),
        count(when(s.rlike(NumericRegex), 1)).as(s"${c}__num"),
        count(when(s.rlike("^[+-]?\\d+$"), 1)).as(s"${c}__int"),
        count(when(tryTimestampChain(s, datetimeFormats).isNotNull, 1)).as(s"${c}__dt"),
        countDistinct(col(c)).as(s"${c}__card"),
        count(when(lower(s).isin(TypeConvert.BoolTokens: _*), 1)).as(s"${c}__bool"))
    }
    val row = manualDf.agg(aggs.head, aggs.tail: _*).head()
    def l(n: String): Long = row.getLong(row.fieldIndex(n))

    val nRows = manualDf.count()
    val decisions: Map[String, String] = strCols.flatMap { c =>
      val n = l(s"${c}__n")
      if (n == 0) None
      else if (l(s"${c}__num") > 0.7 * n)
        Some(c -> (if (l(s"${c}__int") == l(s"${c}__num")) "long" else "double"))
      else if (l(s"${c}__dt") > 0.5 * n) Some(c -> "datetime")
      else if (l(s"${c}__bool") == n && l(s"${c}__card") > 1 && l(s"${c}__card") <= 16)
        Some(c -> "boolcand")
      else if (l(s"${c}__card") < 0.5 * n && l(s"${c}__card") < 100)
        Some(c -> "category")
      else None
    }.toMap

    // job 2 (rare): confirm boolean candidates' distinct sets
    val boolCols = decisions.collect { case (c, "boolcand") => c }.toSeq
    val confirmedBool: Set[String] =
      if (boolCols.isEmpty) Set.empty
      else {
        val sets = manualDf.agg(
          collect_set(lower(trim(col(boolCols.head)))).as(boolCols.head),
          boolCols.tail.map(c => collect_set(lower(trim(col(c)))).as(c)): _*).head()
        boolCols.filter { c =>
          sets.getSeq[String](sets.fieldIndex(c)).toSet
            .subsetOf(TypeConvert.BoolTokens.toSet)
        }.toSet
      }

    val proj = manualDf.columns.map { c =>
      decisions.get(c) match {
        case Some("long") => tryLong(col(c)).as(c)
        case Some("double") => tryDouble(col(c)).as(c)
        case Some("datetime") => tryTimestampChain(trim(col(c)), datetimeFormats).as(c)
        case Some("boolcand") if confirmedBool(c) =>
          when(lower(trim(col(c))).isin(TypeConvert.TrueTokens: _*), lit(true))
            .when(lower(trim(col(c))).isin(TypeConvert.FalseTokens: _*), lit(false))
            .as(c)
        case _ => col(c)
      }
    }
    val updates = decisions.collect {
      case (c, "boolcand") if confirmedBool(c) => s"$c -> boolean"
      case (c, t) if t != "boolcand" => s"$c -> $t"
    }.toSeq
    OpResult(manualDf.select(proj.toSeq: _*), updates)
  }
}

object TypeConvert {
  val DefaultFormats: Seq[String] = Seq(
    "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd", "yyyy/MM/dd",
    "MM/dd/yyyy HH:mm", "MM/dd/yyyy", "dd-MM-yyyy")
  val TrueTokens = Seq("true", "1", "yes", "y", "t")
  val FalseTokens = Seq("false", "0", "no", "n", "f")
  val BoolTokens: Seq[String] = TrueTokens ++ FalseTokens

  def manualCast(c: Column, target: String, formats: Seq[String]): Column = target match {
    case "int" | "long" => tryLong(c)
    case "float" | "double" => tryDouble(c)
    case "str" | "string" => c.cast(StringType)
    case "datetime" => tryTimestampChain(trim(c.cast(StringType)), formats)
    case "bool" | "boolean" =>
      when(lower(trim(c.cast(StringType))).isin(TrueTokens: _*), lit(true))
        .when(lower(trim(c.cast(StringType))).isin(FalseTokens: _*), lit(false))
    case "category" => c.cast(StringType)
    case other => throw new IllegalArgumentException(s"unknown target type: $other")
  }
}
