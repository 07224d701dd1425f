package graft.ops

import org.apache.spark.sql.DataFrame

/** Uniform operator result envelope.
  *
  * Mirrors the reference's per-operator result dict
  * (`/root/reference/methods/missingValues.py:179-191`,
  * `/root/reference/methods/outliers.py:163-175`): transformed data plus
  * human-readable update lines and op-specific metrics. Metrics that require
  * a Spark action (row counts etc.) are deferred behind a thunk so that the
  * lazy, single-job composition of the pipeline is preserved — at 100 TB you
  * do not want a `count()` barrier after every stage unless asked for.
  */
final case class OpResult(
    df: DataFrame,
    updates: Seq[String] = Nil,
    metrics: () => Map[String, Any] = () => Map.empty)

/** A pipeline operator: a pure `DataFrame => OpResult` transformation.
  *
  * Reference equivalent: each `methods/<name>.py` module function
  * (`/root/reference/pipeline.py:162-179` dispatch). Ops must be
  * expression-based (Catalyst-optimizable) — statistics that parameterize a
  * transform are collected in ONE `agg` job and re-injected as literals
  * (fit/transform shape), never one job per column and never per-row driver
  * round trips.
  */
trait Op extends Serializable {
  def name: String
  def apply(df: DataFrame): OpResult
}
