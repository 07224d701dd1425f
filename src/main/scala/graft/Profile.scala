package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.util.Exprs._

/** Dataset profiler (reference S4, `/root/reference/pipeline.py:411-496`,
  * SURVEY.md §2.1): shape, per-column dtype + missing count, duplicate-row
  * count, sample rows.
  *
  * "Missing" for string columns is the reference's 5-heuristic union
  * (`pipeline.py:429-450`): NULL ∪ empty ∪ whitespace-only ∪ sentinel
  * tokens; for non-string columns NULL (∪ NaN for floating).
  *
  * Cost: ONE aggregation job for all per-column counts + duplicate count
  * (distinct-count shuffle) + `limit(n)` sample — independent of column
  * count, linear in data size.
  */
object Profile {
  /** Sentinel strings the reference treats as missing (`pipeline.py:437-441`). */
  val Sentinels: Seq[String] = Seq("nan", "null", "none", "na", "n/a",
    "missing", "unknown", "nil", "undefined")

  def missingPredicate(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    case StringType =>
      col(c).isNull || trim(col(c)) === "" || lower(trim(col(c))).isin(Sentinels: _*)
    case FloatType | DoubleType => col(c).isNull || isnan(col(c))
    case _ => col(c).isNull
  }

  final case class ColumnProfile(name: String, dtype: String, nMissing: Long)
  final case class DatasetProfile(rows: Long, cols: Int, duplicateRows: Long,
      columns: Seq[ColumnProfile], sample: Seq[Map[String, Any]])

  def apply(df: DataFrame, sampleRows: Int = 5): DatasetProfile = {
    val cs = df.columns.toSeq
    val aggs = cs.map(c => count(when(missingPredicate(df, c), 1)).as(c)) :+
      count(lit(1)).as("__rows")
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val nRows = row.getLong(row.fieldIndex("__rows"))
    val nDup = nRows - df.dropDuplicates().count()
    val sample = df.limit(sampleRows).collect().map(r =>
      cs.map(c => c -> r.get(r.fieldIndex(c))).toMap).toSeq
    DatasetProfile(nRows, cs.length, nDup,
      cs.map(c => ColumnProfile(c, df.schema(c).dataType.simpleString,
        row.getLong(row.fieldIndex(c)))), sample)
  }

  /** DataFrame form of the per-column profile — oracle-able: one row per
    * column (column_name, n_missing) plus pseudo-rows for the row and
    * duplicate counts. */
  def asDataFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = apply(df)
    (p.columns.map(c => (c.name, c.nMissing)) :+
      ("__total_rows", p.rows) :+ ("__duplicate_rows", p.duplicateRows))
      .toDF("column_name", "n_missing")
  }
}
