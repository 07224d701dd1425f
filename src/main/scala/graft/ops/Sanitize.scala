package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.util.Exprs._

/** Inter-stage sanitizer (reference P2,
  * `/root/reference/pipeline.py:72-100`): applied after load and after every
  * successful operator.
  *
  *  - numeric columns: ±Inf → null, then null → column median (0 when the
  *    whole column is null);
  *  - non-numeric columns: null → "" (empty string).
  *
  * Load-bearing semantic quirk (SURVEY.md §2.0 P2): because this runs
  * *before* the missing-values operator, that operator usually observes 0
  * nulls at pipeline runtime.
  *
  * Scale notes: all medians for all numeric columns are collected in ONE
  * aggregation job, then applied as a single projection — two Spark jobs
  * total regardless of column count. The percentile buffer is BOUNDED:
  * beyond `spark.graft.percentile.maxDistinct` distinct values per column
  * it spills to a fixed-size digest (±~0.05 % — see
  * [[graft.functions.ExactPercentile]]), so a continuous double column at
  * the 100 TB profile cannot OOM an executor; small/oracle runs stay exact.
  */
object Sanitize extends Op {
  val name = "sanitize"

  def apply(df: DataFrame): OpResult = OpResult(transform(df))

  def transform(df: DataFrame): DataFrame = {
    val numCols = colsOfType(df, isNumeric)
    val strCols = colsOfType(df, isString)
    val medians: Map[String, Double] =
      if (numCols.isEmpty) Map.empty
      else {
        val row = df.agg(
          pctl(infToNull(col(numCols.head).cast(DoubleType)), 0.5).as(numCols.head),
          numCols.tail.map(c => pctl(infToNull(col(c).cast(DoubleType)), 0.5).as(c)): _*).head()
        numCols.map(c => c -> (if (row.isNullAt(row.fieldIndex(c))) 0.0
                               else row.getDouble(row.fieldIndex(c)))).toMap
      }
    val projected = df.columns.map { c =>
      val f = df.schema(c)
      if (numCols.contains(c))
        coalesce(infToNull(col(c).cast(DoubleType)), lit(medians(c)))
          .cast(f.dataType).as(c)
      else if (strCols.contains(c)) coalesce(col(c), lit("")).as(c)
      else col(c)
    }
    df.select(projected.toSeq: _*)
  }
}
