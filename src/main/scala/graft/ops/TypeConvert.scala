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
  * datetime shape-candidate survives) one parse-ratio job over those
  * columns + one projection. Column-count independent.
  *
  * Manual conversions: `manual` maps column → target ("int" | "float" |
  * "str" | "datetime" | "bool"); failures coerce to null (the reference's
  * errors='coerce' default).
  */
final case class TypeConvert(
    auto: Boolean = true,
    manual: Map[String, String] = Map.empty,
    datetimeFormats: Seq[String] = TypeConvert.DefaultFormats,
    /** pandas `errors=` semantics for manual conversions
      * (`dataTypeConversion.py:43-73`): "coerce" nulls failed values;
      * "raise" fails the op if ANY non-null value does not convert;
      * "ignore" leaves a column unconverted when any value fails. raise
      * and ignore cost one extra null-delta agg job over the manual
      * columns; coerce (the reference default) costs nothing. */
    manualErrors: String = "coerce") extends Op {

  val name = "data_type_conversion"

  def apply(df: DataFrame): OpResult = {
    val manualKept: Map[String, String] = manualErrors match {
      case "coerce" => manual
      case "raise" | "ignore" =>
        if (manual.isEmpty) manual
        else {
          val aggs = manual.toSeq.map { case (c, t) =>
            count(when(col(c).isNotNull &&
              TypeConvert.manualCast(col(c), t, datetimeFormats).isNull, 1)).as(c)
          }
          val row = df.agg(aggs.head, aggs.tail: _*).head()
          val failing = manual.keys.filter(c =>
            row.getLong(row.fieldIndex(c)) > 0).toSeq.sorted
          if (failing.isEmpty) manual
          else if (manualErrors == "raise") throw new IllegalStateException(
            s"manual conversion failed for: ${failing.mkString(", ")}")
          else manual -- failing
        }
      case other =>
        throw new IllegalArgumentException(s"unknown errors mode: $other")
    }
    val manualDf = manualKept.foldLeft(df) { case (d, (c, t)) =>
      d.withColumn(c, TypeConvert.manualCast(col(c), t, datetimeFormats))
    }
    if (!auto) return OpResult(manualDf,
      manualKept.map { case (c, t) => s"$c -> $t" }.toSeq)
    val strCols = colsOfType(manualDf, isString).filterNot(manualKept.contains)
    if (strCols.isEmpty) return OpResult(manualDf, Seq("no string columns to detect"))

    // job 1: parse ratios + cardinality for every string column at once.
    // Datetime detection is two-phase: a cheap shape regex here (every
    // pattern in the format chain matches it), the expensive multi-format
    // parse only over surviving candidates (job 1b, usually zero columns).
    // approx_count_distinct instead of countDistinct: exact at the small
    // cardinalities the thresholds care about, and avoids the Expand
    // operator a multi-countDistinct agg would force over the whole scan.
    // Two-layer shape — a flags projection (regexes evaluated ONCE each,
    // in a small generated method) feeding trivial sum aggregates — keeps
    // each whole-stage-codegen unit small: one flat 18-aggregate expression
    // with inline regexes costs ~1 min of Janino compilation before the
    // first row flows.
    val flagCols = strCols.flatMap { c =>
      val s = trim(col(c).cast(StringType))
      def flag(cond: Column): Column = when(col(c).isNotNull && cond, 1L).otherwise(0L)
      Seq(
        col(c).isNotNull.cast(LongType).as(s"${c}__n"),
        // Regex-gated numeric probes, NOT try_cast: on a mostly-non-numeric
        // column try_cast's failure path throws a caught exception per cell
        // (measured 13.1 s -> 23.6 s on this scan when round 2 tried it),
        // and it accepts tokens pandas rejects ("1.5f", "Infinity").
        flag(s.rlike(NumericRegex)).as(s"${c}__num"),
        flag(s.rlike("^[+-]?\\d+$")).as(s"${c}__int"),
        flag(s.rlike(TypeConvert.DatetimeShapeRegex)).as(s"${c}__dtc"),
        flag(lower(s).isin(TypeConvert.BoolTokens: _*)).as(s"${c}__bool")) :+
        col(c).as(s"${c}__v")
    }
    val flags = manualDf.select(flagCols: _*)
    val aggs = strCols.flatMap { c => Seq(
      sum(col(s"${c}__n")).as(s"${c}__n"),
      sum(col(s"${c}__num")).as(s"${c}__num"),
      sum(col(s"${c}__int")).as(s"${c}__int"),
      sum(col(s"${c}__dtc")).as(s"${c}__dtc"),
      approx_count_distinct(col(s"${c}__v")).as(s"${c}__card"))
    } ++ strCols.map(c => sum(col(s"${c}__bool")).as(s"${c}__bool"))
    val row = flags.agg(aggs.head, aggs.tail: _*).head()
    def l(n: String): Long = {
      val i = row.fieldIndex(n)
      if (row.isNullAt(i)) 0L else row.getLong(i) // sum over 0 rows is null
    }

    // job 1b (only when shape-plausible): true parse ratio via the chain
    // the shape gate only applies to the default formats it was built for
    val gated = datetimeFormats == TypeConvert.DefaultFormats
    val dtCandidates = strCols.filter { c =>
      val n = l(s"${c}__n")
      n > 0 && l(s"${c}__num") <= 0.7 * n &&
        (!gated || l(s"${c}__dtc") > 0.5 * n)
    }
    val dtParsed: Map[String, Long] =
      if (dtCandidates.isEmpty) Map.empty
      else {
        val a = dtCandidates.map(c => count(when(tryTimestampChain(
          trim(col(c).cast(StringType)), datetimeFormats).isNotNull, 1)).as(c))
        val r = manualDf.agg(a.head, a.tail: _*).head()
        dtCandidates.map(c => c -> r.getLong(r.fieldIndex(c))).toMap
      }

    val decisions: Map[String, String] = strCols.flatMap { c =>
      val n = l(s"${c}__n")
      if (n == 0) None
      else if (l(s"${c}__num") > 0.7 * n)
        Some(c -> (if (l(s"${c}__int") == l(s"${c}__num")) "long" else "double"))
      else if (dtParsed.getOrElse(c, 0L) > 0.5 * n) Some(c -> "datetime")
      else if (l(s"${c}__bool") == n && l(s"${c}__card") > 1 && l(s"${c}__card") <= 16)
        Some(c -> "boolcand")
      else if (l(s"${c}__card") < 0.5 * n && l(s"${c}__card") < 100)
        Some(c -> "category")
      else None
    }.toMap

    // No confirmation job for boolean candidates: the "boolcand" decision
    // already requires __bool == __n, i.e. EVERY non-null value is a bool
    // token, so a distinct-set ⊆ BoolTokens re-check can never fail (the
    // reference's subset test, `dataTypeConversion.py:136-138`, is implied).
    // Raw-cased distinct count (>1, the reference's len(uniques) > 1 on raw
    // values) is covered by the __card aggregate from job 1.
    val confirmedBool: Set[String] =
      decisions.collect { case (c, "boolcand") => c }.toSet

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

  /** Cheap necessary condition for every pattern in [[DefaultFormats]]:
    * three 1-4 digit groups joined by - or /. Gates the expensive
    * multi-format parse scan. */
  val DatetimeShapeRegex: String =
    "^\\d{1,4}[-/]\\d{1,2}[-/]\\d{1,4}([ T].*)?$"
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
