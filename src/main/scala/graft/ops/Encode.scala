package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.util.Exprs._

/** Categorical encoding operator — 3 methods
  * (`/root/reference/methods/encoding.py:22-229`, SURVEY.md §2.14).
  *
  *  - label: codes assigned by SORTED UNIQUE VALUE (sklearn LabelEncoder is
  *    lexicographic, NOT frequency order — `encoding.py:87-120`); nulls
  *    first become the literal "__MISSING__" (`encoding.py:94-97`).
  *    Implemented as dense_rank over the distinct values joined back via
  *    broadcast — the distinct side is small by definition of "categorical",
  *    so the join never shuffles the fact table.
  *  - onehot: skips columns with >50 distinct values (`encoding.py:127-134`);
  *    emits `col_value` 0/1 columns including a `col_nan` null indicator
  *    (dummy_na=True), drops the original; `dropFirst` drops the first
  *    sorted value's column (`encoding.py:139-155`).
  *  - target: despite the reference's name, FREQUENCY encoding
  *    (`encoding.py:163-192`): value frequency (nulls included as a group)
  *    as a NEW `<col>_freq_encoded` column; original kept. A pure window
  *    — `count(*) over (partition by col) / count(*) over ()` — no
  *    collect, no join.
  */
object Encode {
  /** The label-encoding dictionary for a column: (value, code), codes by
    * sorted unique value (sklearn LabelEncoder order — `encoding.py:87-120`,
    * exposed by `get_encoding_mappings` `:231-240`). */
  def labelMapping(df: DataFrame, c: String): DataFrame =
    df.select(coalesce(col(c).cast(StringType), lit("__MISSING__")).as("value"))
      .distinct()
      .withColumn("code",
        (dense_rank().over(Window.orderBy(col("value"))) - 1).cast(LongType))

  /** Inverse of label encoding (reference `inverse_transform_labels`,
    * `encoding.py:242-264`): codes back to original string values via a
    * broadcast join of the stored mapping. */
  def inverseLabel(encoded: DataFrame, mapping: DataFrame, c: String): DataFrame = {
    val joined = encoded.join(broadcast(mapping),
      encoded(c) === mapping("code"), "left")
    joined.select(encoded.columns.map(n =>
      if (n == c) col("value").as(c) else encoded(n)).toSeq: _*)
  }

  /** Per-categorical-column summary (reference `get_categorical_summary`,
    * `encoding.py:266-285`): distinct count, missing count, mode (pandas
    * tie-break). One melt job + one mode job. */
  def categoricalSummary(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val cols = if (columns.nonEmpty) columns
               else graft.util.Exprs.colsOfType(df, graft.util.Exprs.isString)
    val spark = df.sparkSession
    import spark.implicits._
    if (cols.isEmpty)
      return Seq.empty[(String, Long, Long, String)]
        .toDF("column_name", "n_unique", "n_missing", "mode")
    val aggs = cols.flatMap(c => Seq(
      countDistinct(col(c)).as(s"${c}__u"),
      count(when(col(c).isNull, 1)).as(s"${c}__m")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val modes = Stats.modes(df, cols)
    cols.map { c =>
      (c, row.getLong(row.fieldIndex(s"${c}__u")),
        row.getLong(row.fieldIndex(s"${c}__m")),
        modes.get(c).map(_.toString).orNull)
    }.toDF("column_name", "n_unique", "n_missing", "mode")
  }
}

final case class Encode(
    method: String = "label",
    columns: Seq[String] = Nil,
    dropFirst: Boolean = false,
    maxOnehotCardinality: Int = 50) extends Op {

  val name = s"encoding:$method"

  def apply(df: DataFrame): OpResult = {
    val targets = if (columns.nonEmpty) columns else colsOfType(df, isString)
    if (targets.isEmpty) return OpResult(df, Seq("no categorical columns"))
    val out = method match {
      case "label" => targets.foldLeft(df)(labelEncode)
      case "onehot" => oneHot(df, targets)
      case "target" =>
        // per-value counts via groupBy + BROADCAST join, total as a driver
        // literal: a `count(*) over ()` window would funnel the whole fact
        // table through one partition — the join keeps the plan shuffle-free
        // on the fact side (distinct values are bounded for categoricals)
        val total = df.count()
        targets.foldLeft(df) { (d, c) =>
          val freqs = df.groupBy(col(c).as("__enc_v"))
            .agg(count(lit(1)).as("__enc_n"))
          d.join(broadcast(freqs),
              d(c) <=> col("__enc_v"), "left")
            .withColumn(s"${c}_freq_encoded",
              col("__enc_n").cast(DoubleType) / lit(total))
            .drop("__enc_v", "__enc_n")
        }
      case other => throw new IllegalArgumentException(s"unknown encoding: $other")
    }
    OpResult(out, Seq(s"encoded [${targets.mkString(",")}] method=$method"))
  }

  private def labelEncode(df: DataFrame, c: String): DataFrame = {
    val filled = coalesce(col(c).cast(StringType), lit("__MISSING__"))
    val dict = df.select(filled.as(c)).distinct()
      .withColumn(s"${c}__code",
        (dense_rank().over(Window.orderBy(col(c))) - 1).cast(LongType))
    val joined = df.withColumn("__lbl_key", filled)
      .join(broadcast(dict.withColumnRenamed(c, "__lbl_key")), Seq("__lbl_key"), "left")
      .drop("__lbl_key")
    // in-place replacement, preserving column position (encoding.py:104)
    joined.select(df.columns.map(n =>
      if (n == c) col(s"${c}__code").as(c) else col(n)).toSeq: _*)
  }

  private def oneHot(df: DataFrame, targets: Seq[String]): DataFrame = {
    // Guard BEFORE collecting (encoding.py:127-134): one approx-cardinality
    // aggregation picks candidate columns, and distinct VALUES are collected
    // only for those — a high-cardinality string column (URLs, ids) never
    // reaches the driver. The 2x+16 margin over the exact limit makes the
    // HLL sketch's error irrelevant for the keep side (no true <=limit
    // column is skipped); the exact <=limit filter re-runs on the collected
    // values, so borderline columns still resolve exactly.
    val margin = maxOnehotCardinality * 2L + 16L
    val cardAggs = targets.map(c =>
      approx_count_distinct(col(c)).as(s"${c}__card"))
    val cardRow = df.agg(cardAggs.head, cardAggs.tail: _*).head()
    val candidates = targets.filter(c =>
      cardRow.getLong(cardRow.fieldIndex(s"${c}__card")) <= margin)
    // one job collects the candidate columns' distinct values (melt)
    val values: Map[String, Seq[String]] =
      if (candidates.isEmpty) Map.empty
      else df.select(explode(array(candidates.map(c =>
          struct(lit(c).as("c"), col(c).cast(StringType).as("v"))): _*)).as("p"))
        .select(col("p.c").as("c"), col("p.v").as("v"))
        .distinct().collect()
        .groupBy(_.getString(0))
        .map { case (c, rows) =>
          c -> rows.map(r => Option(r.getString(1))).collect { case Some(v) => v }
            .toSeq.sorted }
    val encodable = candidates.filter(c =>
      values.getOrElse(c, Nil).size <= maxOnehotCardinality)
    val proj = df.columns.toSeq.flatMap { c =>
      if (!encodable.contains(c)) Seq(col(c))
      else {
        val vs = values(c)
        val kept = if (dropFirst) vs.drop(1) else vs
        kept.map(v => when(col(c).cast(StringType) === lit(v), 1L).otherwise(0L)
          .as(s"${c}_$v")) :+
          when(col(c).isNull, 1L).otherwise(0L).as(s"${c}_nan")
      }
    }
    df.select(proj: _*)
  }
}
