package graft

import org.apache.spark.sql.functions._
import graft.plans.{AsofJoin, IntervalJoin}
import graft.ops.Sampling

/** AsofJoin / IntervalJoin / Sampling.capPerGroup semantics on small
  * frames with hand-computed expected outputs, plus the properties the
  * scaladocs promise (inclusivity, tolerance, exactly-once pairs, the
  * width guard, partitioning-independence of the cap).
  */
class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  // ---- as-of join --------------------------------------------------------

  private def quotes = Seq(
    // key, ts, px
    ("a", 10.0, 1.0), ("a", 20.0, 2.0), ("a", 30.0, 3.0),
    ("b", 15.0, 9.0)).toDF("k", "ts", "px")

  private def trades = Seq(
    ("a", 5.0), ("a", 10.0), ("a", 25.0), ("a", 99.0),
    ("b", 14.0), ("c", 50.0)).toDF("k", "ts")

  test("asofBackward: latest right at-or-before, inclusive, per key") {
    val out = AsofJoin.asofBackward(trades, quotes, Seq("k"), "ts", "ts")
      .select($"k", $"ts", $"asof_ts_sec", $"asof_px")
      .orderBy("k", "ts").collect().map(r =>
        (r.getString(0), r.getDouble(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      ("a", 5.0, None, None),              // before first quote
      ("a", 10.0, Some(10.0), Some(1.0)),  // inclusive at equal ts
      ("a", 25.0, Some(20.0), Some(2.0)),
      ("a", 99.0, Some(30.0), Some(3.0)),
      ("b", 14.0, None, None),             // b's quote is later
      ("c", 50.0, None, None)))            // unknown key
  }

  test("asofBackward: tolerance nulls stale matches but keeps the row") {
    val out = AsofJoin.asofBackward(trades, quotes, Seq("k"), "ts", "ts",
        toleranceSeconds = Some(10.0))
      .select($"k", $"ts", $"asof_px").orderBy("k", "ts").collect()
      .map(r => (r.getString(0), r.getDouble(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      ("a", 5.0, None), ("a", 10.0, Some(1.0)), ("a", 25.0, Some(2.0)),
      ("a", 99.0, None), // 99-30=69 > 10 → stale
      ("b", 14.0, None), ("c", 50.0, None)))
  }

  test("asofForward: earliest right at-or-after") {
    val out = AsofJoin.asofForward(trades, quotes, Seq("k"), "ts", "ts",
        prefix = "next_")
      .select($"k", $"ts", $"next_ts_sec", $"next_px")
      .orderBy("k", "ts").collect().map(r =>
        (r.getString(0), r.getDouble(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      ("a", 5.0, Some(10.0), Some(1.0)),
      ("a", 10.0, Some(10.0), Some(1.0)), // inclusive
      ("a", 25.0, Some(30.0), Some(3.0)),
      ("a", 99.0, None, None),            // after last quote
      ("b", 14.0, Some(15.0), Some(9.0)),
      ("c", 50.0, None, None)))
  }

  test("asof: null right keys/ts never match; null left rows survive") {
    val r = Seq((Some("a"), Some(10.0), 1.0), (None, Some(12.0), 2.0),
      (Some("a"), None, 3.0)).toDF("k", "ts", "px")
    val l = Seq((Some("a"), Some(20.0)), (Some("a"), None), (None, Some(20.0)))
      .toDF("k", "ts")
    val out = AsofJoin.asofBackward(l, r, Seq("k"), "ts", "ts")
      .select($"asof_px").collect().map(x => Option(x.get(0)))
    // exactly one row matched (the valid quote); all 3 left rows survive
    assert(out.length == 3 && out.count(_.isDefined) == 1 &&
      out.flatten.toSeq == Seq(1.0))
  }

  test("asof: multi-key equality and payload struct tie-break") {
    val r = Seq(("a", 1, 10.0, 5.0), ("a", 1, 10.0, 7.0), ("a", 2, 10.0, 9.0))
      .toDF("k1", "k2", "ts", "v")
    val l = Seq(("a", 1, 10.0), ("a", 2, 11.0)).toDF("k1", "k2", "ts")
    val out = AsofJoin.asofBackward(l, r, Seq("k1", "k2"), "ts", "ts")
      .select($"k2", $"asof_v").orderBy("k2").collect()
      .map(x => (x.getInt(0), x.getDouble(1)))
    // equal-ts duplicate rights resolve to the LARGEST payload struct
    assert(out.toSeq == Seq((1, 7.0), (2, 9.0)))
  }

  test("asof plan: no join node, one exchange") {
    val plan = AsofJoin.asofBackward(trades, quotes, Seq("k"), "ts", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"unexpected join node:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  // ---- interval join -----------------------------------------------------

  private def iv = Seq(
    ("u1", 100L, 0.0, 50.0), ("u1", 101L, 40.0, 60.0), ("u2", 102L, 0.0, 10.0))
    .toDF("k", "iid", "lo", "hi")
  private def pts = Seq(
    ("u1", 200L, 0.0), ("u1", 201L, 45.0), ("u1", 202L, 50.0),
    ("u1", 203L, 61.0), ("u2", 204L, 10.0), ("u3", 205L, 5.0))
    .toDF("k", "pid", "t")

  test("interval containment: exact pair set, boundaries inclusive") {
    val out = IntervalJoin.containment(iv, pts, Seq("k"), "lo", "hi", "t",
        cellSeconds = 7.0)
      .select($"iid", $"pid").orderBy("iid", "pid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq(
      (100L, 200L), (100L, 201L), (100L, 202L), // 0,45,50 ∈ [0,50]
      (101L, 201L), (101L, 202L),               // 45,50 ∈ [40,60]
      (102L, 204L)))                            // 10 ∈ [0,10]
  }

  test("interval containment: each pair exactly once at any cell width") {
    for (cell <- Seq(1.0, 13.0, 1000.0)) {
      val out = IntervalJoin.containment(iv, pts, Seq("k"), "lo", "hi", "t",
          cellSeconds = cell, maxCellsPerInterval = 100)
        .select($"iid", $"pid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(out.length == out.distinct.length && out.length == 6,
        s"cell=$cell → ${out.toSeq}")
    }
  }

  test("interval containment: inverted/null intervals and points drop") {
    val badIv = Seq(("u1", 1L, 50.0, 40.0), ("u1", 2L, null, 10.0),
      (null, 3L, 0.0, 10.0))
      .asInstanceOf[Seq[(String, Long, Any, Any)]]
      .map { case (k, i, a, b) => (k, i,
        Option(a).map(_.asInstanceOf[Double]), Option(b).map(_.asInstanceOf[Double])) }
      .toDF("k", "iid", "lo", "hi")
    val out = IntervalJoin.containment(badIv, pts, Seq("k"), "lo", "hi", "t",
      cellSeconds = 10.0)
    assert(out.count() == 0)
  }

  test("interval containment: width guard raises on a pathological interval") {
    val wide = Seq(("u1", 1L, 0.0, 1e6)).toDF("k", "iid", "lo", "hi")
    val e = intercept[Exception] {
      IntervalJoin.containment(wide, pts, Seq("k"), "lo", "hi", "t",
        cellSeconds = 1.0, maxCellsPerInterval = 100).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("wider than")), e)
  }

  test("interval containment plan: hash/merge equi-join, never nested-loop") {
    val plan = IntervalJoin.containment(iv, pts, Seq("k"), "lo", "hi", "t",
      cellSeconds = 7.0).queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      plan)
    // the equi-join keys must include the grid cell, not just the raw key
    assert(plan.contains("__cell"), plan)
  }

  // ---- per-group cap -----------------------------------------------------

  test("capPerGroup: sizes ≤ k, nested in k+1, partitioning-independent") {
    val df = spark.range(0, 500).select(
      (col("id") % 7).cast("string").as("g"), col("id"))
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("id").collect().map(_.getLong(0)).toSet
    val k10 = Sampling.capPerGroup(df, "g", "id", 10)
    val k11 = Sampling.capPerGroup(df, "g", "id", 11)
    val sizes = k10.groupBy("g").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ == 10) && sizes.length == 7)
    assert(ids(k10).subsetOf(ids(k11)) && ids(k11).size == 77)
    assert(ids(Sampling.capPerGroup(df.repartition(13), "g", "id", 10))
      == ids(k10))
    assert(ids(Sampling.capPerGroup(df, "g", "id", 1000)) == ids(df))
  }

  test("topKPerGroup: best-k by score desc, ties resolve by id asc") {
    val df = Seq(("a", 1L, 0.9), ("a", 2L, 0.7), ("a", 3L, 0.9),
      ("a", 4L, 0.5), ("b", 5L, 0.1)).toDF("g", "id", "s")
    val out = Sampling.topKPerGroup(df, "g", "s", "id", 2)
      .select($"g", $"rk", $"id").orderBy("g", "rk").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // a: 0.9-tie between id 1 and 3 → id asc; b: only one row
    assert(out.toSeq == Seq(("a", 1, 1L), ("a", 2, 3L), ("b", 1, 5L)))
  }
}
