package graft

import org.apache.spark.sql.functions._
import graft.ops.TypoFix
import graft.plans.DistributedFuzzy

class DistributedFuzzySpec extends SparkSpec {
  import spark.implicits._

  // frequent correct spellings + rarer near-misses + an unrelated value
  private def dirty = Seq(
    Seq.fill(40)("BUILDING"), Seq.fill(3)("BULDING"), Seq.fill(2)("BUILDNG"),
    Seq.fill(30)("AUTOMOBILE"), Seq.fill(4)("AUTOMOBIL"),
    Seq.fill(25)("FURNITURE"), Seq.fill(10)("MACHINERY")
  ).flatten.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    .toDF("id", "seg")

  test("distributed replacement map equals the driver O(d²) map") {
    val counts = dirty.groupBy($"seg").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val driver = TypoFix.fuzzyReplacements(counts, 0.8)
    val dist = DistributedFuzzy.replacements(dirty, "seg", 0.8)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dist == driver)
    assert(dist.nonEmpty) // the typos above really are ≥0.8 similar
  }

  test("fix rewrites losers in place and leaves winners untouched") {
    val out = DistributedFuzzy.fix(dirty, "seg", 0.8)
    val segs = out.groupBy($"seg").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(segs("BUILDING") == 45L)
    assert(segs("AUTOMOBILE") == 34L)
    assert(segs("FURNITURE") == 25L && segs("MACHINERY") == 10L)
    assert(!segs.contains("BULDING") && !segs.contains("AUTOMOBIL"))
    assert(out.count() == dirty.count())
  }

  test("the candidate join never sort-merges the fact table") {
    val p = DistributedFuzzy.fix(dirty, "seg", 0.8)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"))
  }
}
