package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** r22 (r21 verdict #3/#4): the ~27 presorted queries moved their global
  * Sort BELOW the operator projection, so the declared output order is a
  * physical-plan property — every node above the Sort must preserve row
  * order (projections, filters, broadcast joins on the streamed side).
  * That held in r21's plans, but nothing enforced it: if a build side
  * outgrows the broadcast threshold or AQE re-plans an exchange above
  * the Sort at another scale, the order — and the driver's oracle hash —
  * silently changes. These tests pin the contract on the EXECUTED
  * (AQE-final) plan for one representative per presorted family, and pin
  * the fit/transform identical-rows contract the two-frame overloads
  * rely on.
  */
class PresortContractSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** AQE-final plan text after actually running `df`. */
  private def finalPlan(df: DataFrame): String = {
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  /** Everything ABOVE the topmost Sort must be order-preserving: no
    * shuffle (Exchange/AQEShuffleRead), no aggregation, no sort-based or
    * shuffled join. A BroadcastExchange is allowed — it feeds the BUILD
    * side of a BroadcastHashJoin, which streams the probe side in order. */
  private def assertOrderSafeAboveSort(name: String): Unit = {
    val df = SparkEntry.queries(name)(spark, sf)
    val before = graft.util.CacheHygiene.snapshot(spark)
    try {
      val p = finalPlan(df)
      val sortAt = p.indexOf("Sort ")
      assert(sortAt >= 0, s"$name: expected a global Sort in:\n$p")
      val above = p.substring(0, sortAt)
      for (bad <- Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange RoundRobin", "AQEShuffleRead", "HashAggregate",
        "SortAggregate", "ObjectHashAggregate", "SortMergeJoin",
        "ShuffledHashJoin", "CartesianProduct"))
        assert(!above.contains(bad),
          s"$name: order-destroying '$bad' ABOVE the final Sort — the " +
            s"declared output order is no longer plan-guaranteed:\n$p")
    } finally graft.util.CacheHygiene.releaseNew(spark, before)
  }

  test("typeconvert family: nothing order-destroying above the sort") {
    assertOrderSafeAboveSort("q_typeconvert_auto")
    assertOrderSafeAboveSort("q_typeconvert_manual")
  }

  test("normalize family: nothing order-destroying above the sort") {
    assertOrderSafeAboveSort("q_normalize_minmax")
    assertOrderSafeAboveSort("q_normalize_l2")
  }

  test("outlier family: nothing order-destroying above the sort") {
    assertOrderSafeAboveSort("q_outlier_modz_cap")
    assertOrderSafeAboveSort("q_outlier_iqr_cap")
    assertOrderSafeAboveSort("q_outlier_log_transform")
  }

  test("discretize family: nothing order-destroying above the sort") {
    assertOrderSafeAboveSort("q_discretize_width")
    assertOrderSafeAboveSort("q_discretize_quantile")
  }

  test("text family: nothing order-destroying above the sort") {
    assertOrderSafeAboveSort("q_text_stats")
    assertOrderSafeAboveSort("q_textclean")
    assertOrderSafeAboveSort("q_lang_id")
    assertOrderSafeAboveSort("q_redact_pii")
  }

  test("encode_freq keeps its count join broadcast above the sort") {
    // the one presorted query with a JOIN above the Sort: its build side
    // is the tiny frequency table; a planner/threshold change that turns
    // it into a sort-merge join would re-shuffle and destroy the order
    assertOrderSafeAboveSort("q_encode_freq")
  }

  test("datetime family: nothing order-destroying above the sort") {
    assertOrderSafeAboveSort("q_datetime_parse")
  }

  /** fit/transform two-frame contract (r21 ADVICE): fitting on a
    * REORDERED copy of the same rows must give the same output as the
    * single-frame path — this is exactly how every presorted caller uses
    * the overloads, and the cheapest executable statement of the
    * "identical rows" contract. */
  private def assertFitReorderInvariant(
      single: DataFrame => DataFrame,
      two: (DataFrame, DataFrame) => DataFrame): Unit = {
    val df = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    val sorted = df.orderBy(desc("l_extendedprice"), col("l_orderkey"),
      col("l_linenumber"))
    val a = single(sorted).collect().map(_.toString).sorted
    val b = two(df, sorted).collect().map(_.toString).sorted
    assert(a.sameElements(b),
      "two-frame fit on a reordered twin must equal the single-frame path")
  }

  test("Outliers fit on a reordered twin equals the single-frame path") {
    import graft.ops.Outliers
    assertFitReorderInvariant(
      d => Outliers("iqr", "cap", 1.5, columns = Seq("l_extendedprice"))(d).df,
      (f, d) => Outliers("iqr", "cap", 1.5,
        columns = Seq("l_extendedprice"))(f, d).df)
  }

  test("Normalize fit on a reordered twin equals the single-frame path") {
    import graft.ops.Normalize
    assertFitReorderInvariant(
      d => Normalize("minmax", columns = Seq("l_quantity"))(d).df,
      (f, d) => Normalize("minmax", columns = Seq("l_quantity"))
        .fitTransform(f, d)._1.df)
  }

  test("Discretize fit on a reordered twin equals the single-frame path") {
    import graft.ops.Discretize
    assertFitReorderInvariant(
      d => Discretize.quantile(d, Seq("l_extendedprice"), 8),
      (f, d) => Discretize.quantile(f, d, Seq("l_extendedprice"), 8, "_bin"))
  }

  test("TypeConvert fit on a reordered twin equals the single-frame path") {
    import graft.ops.TypeConvert
    import org.apache.spark.sql.types.StringType
    def strly(d: DataFrame) = d.select(col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast(StringType).as("q_str"))
    assertFitReorderInvariant(
      d => TypeConvert(auto = true)(strly(d)).df,
      (f, d) => TypeConvert(auto = true)(strly(f), strly(d)).df)
  }
}
