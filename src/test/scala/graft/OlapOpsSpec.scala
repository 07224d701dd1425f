package graft

import org.apache.spark.sql.functions._
import graft.ops.Discretize
import graft.streaming.Events

/** Hopping windows, rollup/cube grouping-id semantics, and discretization
  * on hand-computed frames. */
class OlapOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hoppingStats: each event lands in width/slide overlapping windows") {
    // events at :05, :35, :65 minutes (epoch-aligned hours for sanity)
    val df = Seq(300L, 2100L, 3900L)
      .map(s => (new java.sql.Timestamp(s * 1000L), "a", 1.0))
      .toDF("ts", "event_type", "value")
    val out = Events.hoppingStats(df, "1 hour", "30 minutes")
      .select($"window_start_sec", $"n_events")
      .orderBy("window_start_sec").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // windows: [-1800,1800)→{300}, [0,3600)→{300,2100}, [1800,5400)→{2100,3900},
    // [3600,7200)→{3900}
    assert(out.toSeq == Seq((-1800L, 1L), (0L, 2L), (1800L, 2L), (3600L, 1L)))
  }

  test("rollup/cube: grouping_id bit order and subtotal rows") {
    val df = Seq(("x", "p", 1.0), ("x", "q", 2.0), ("y", "p", 4.0))
      .toDF("a", "b", "v")
    def run(grouped: org.apache.spark.sql.RelationalGroupedDataset) =
      grouped.agg(grouping_id().cast("long").as("g"),
          sum($"v").cast("double").as("s"))
        .select($"g", coalesce($"a", lit("ALL")).as("a"),
          coalesce($"b", lit("ALL")).as("b"), $"s")
        .orderBy("g", "a", "b").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
    val roll = run(df.rollup($"a", $"b"))
    assert(roll.toSeq == Seq(
      (0L, "x", "p", 1.0), (0L, "x", "q", 2.0), (0L, "y", "p", 4.0),
      (1L, "x", "ALL", 3.0), (1L, "y", "ALL", 4.0),
      (3L, "ALL", "ALL", 7.0)))
    val cube = run(df.cube($"a", $"b"))
    // cube adds the b-margin rows (grp_id 2: a rolled up, b kept)
    assert(cube.toSeq == Seq(
      (0L, "x", "p", 1.0), (0L, "x", "q", 2.0), (0L, "y", "p", 4.0),
      (1L, "x", "ALL", 3.0), (1L, "y", "ALL", 4.0),
      (2L, "ALL", "p", 5.0), (2L, "ALL", "q", 2.0),
      (3L, "ALL", "ALL", 7.0)))
  }

  test("equalWidth: bin edges, max clamp, nulls, constant column") {
    val df = Seq(Some(0.0), Some(2.5), Some(5.0), Some(9.99), Some(10.0), None)
      .toDF("x").withColumn("c", when($"x".isNotNull, lit(7.0)))
    val out = Discretize.equalWidth(df, Seq("x", "c"), nBins = 4)
      .select($"x", $"x_bin", $"c_bin").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2))))
    // width 2.5: [0,2.5)→0 [2.5,5)→1 [5,7.5)→2 [7.5,10]→3; constant→0
    assert(out.toSet == Set(
      (Some(0.0), Some(0L), Some(0L)), (Some(2.5), Some(1L), Some(0L)),
      (Some(5.0), Some(2L), Some(0L)), (Some(9.99), Some(3L), Some(0L)),
      (Some(10.0), Some(3L), Some(0L)), (None, None, None)))
  }

  test("quantile: right-closed qcut bins, nulls stay null") {
    // 8 values: edges at p25/50/75 of 1..8 = 2.75, 4.5, 6.25
    val df = (1 to 8).map(i => Some(i.toDouble)).:+(None).toDF("x")
    val out = Discretize.quantile(df, Seq("x"), nBins = 4)
      .select($"x", $"x_bin").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1))))
    val expect: Set[(Option[Double], Option[Long])] = Set(
      (Some(1.0), Some(0L)), (Some(2.0), Some(0L)),
      (Some(3.0), Some(1L)), (Some(4.0), Some(1L)),
      (Some(5.0), Some(2L)), (Some(6.0), Some(2L)),
      (Some(7.0), Some(3L)), (Some(8.0), Some(3L)),
      (None, None))
    assert(out.asInstanceOf[Array[(Option[Double], Option[Long])]].toSet
      == expect)
  }

  test("discretize plans: one agg job then literal-edge projection") {
    val df = spark.range(1000).select($"id".cast("double").as("x"))
    val out = Discretize.quantile(df, Seq("x"), nBins = 4)
    // assignment stage must be join-free and window-free: edges are plan
    // literals, so the projected plan is a bare scan + project
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join") && !plan.contains("Window"),
      plan)
  }
}
