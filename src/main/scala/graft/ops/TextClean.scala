package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.util.Exprs._

/** Text-cleaning operator
  * (`/root/reference/methods/textCleaning.py:18-188`, SURVEY.md §2.12).
  *
  * Applies an ORDERED list of string transforms to all (or chosen) string
  * columns. Pure column expressions: Catalyst's `CollapseProject` folds the
  * whole chain into one generated projection, so the entire operator is a
  * single whole-stage-codegen map over the scan — the shape you want at
  * 100 TB (zero shuffles, zero UDFs).
  *
  * Reference envelope semantics kept: values are stringified first with
  * literal "nan" → "" (`textCleaning.py:68-69`), and a final ""→NULL pass
  * (`textCleaning.py:145`).
  */
object TextClean {
  /** Python `string.punctuation` — the 32 chars the reference deletes
    * (`textCleaning.py:90-93`). */
  val Punctuation = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
  val UrlRegex = "https?://\\S+|www\\.\\S+"
  val EmailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val HtmlRegex = "<[^>]+>"

  /** A single named transform as a Column function. */
  def step(op: String, custom: Seq[(String, String)] = Nil): Column => Column = op match {
    case "lowercase" => lower
    case "uppercase" => upper
    case "remove_whitespace" | "remove_extra_spaces" =>
      c => trim(regexp_replace(c, "\\s+", " "))
    case "remove_punctuation" => c => translate(c, Punctuation, "")
    case "remove_numbers" => c => regexp_replace(c, "\\d+", "")
    case "remove_special_chars" => c => regexp_replace(c, "[^a-zA-Z0-9\\s]", "")
    case "remove_html" => c => regexp_replace(c, HtmlRegex, "")
    case "remove_urls" => c => regexp_replace(c, UrlRegex, "")
    case "remove_emails" => c => regexp_replace(c, EmailRegex, "")
    case "custom" => c => custom.foldLeft(c) { case (acc, (pat, rep)) =>
      regexp_replace(acc, pat, rep) }
    case other => throw new IllegalArgumentException(s"unknown text op: $other")
  }
}

final case class TextClean(
    operations: Seq[String],
    columns: Seq[String] = Nil,
    customPatterns: Seq[(String, String)] = Nil) extends Op {

  val name = "text_cleaning"

  def apply(df: DataFrame): OpResult = {
    val targets = if (columns.nonEmpty) columns else colsOfType(df, isString)
    val proj = df.columns.map { c =>
      if (!targets.contains(c)) col(c)
      else {
        val start = regexp_replace(col(c).cast(StringType), "^nan$", "")
        val cleaned = operations.foldLeft(start) { (acc, op) =>
          TextClean.step(op, customPatterns)(acc) }
        when(cleaned === "", lit(null).cast(StringType)).otherwise(cleaned).as(c)
      }
    }
    OpResult(df.select(proj.toSeq: _*),
      Seq(s"text ops [${operations.mkString(",")}] on ${targets.mkString(",")}"))
  }
}
