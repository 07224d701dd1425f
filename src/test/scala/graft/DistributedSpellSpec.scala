package graft

import org.apache.spark.sql.functions._
import graft.ops.TypoFix
import graft.plans.DistributedSpell

class DistributedSpellSpec extends SparkSpec {
  import spark.implicits._

  // repeated words form the vocabulary; each typo appears exactly once
  private def corpus = Seq(
    (0L, "the spark query engine runs the query plan"),
    (1L, "spark engine plan the query runs"),
    (2L, "a sprak qurey was slow"),
    (3L, "the engine runs plans"),
    (4L, "spark plans the engine")
  ).toDF("id", "text")

  test("distributed corrections rewrite typos to vocabulary words") {
    val out = DistributedSpell.fix(corpus, "text", threshold = 0.7)
      .orderBy("id").collect().map(_.getString(1))
    assert(out(2).contains("spark") && out(2).contains("query"))
    assert(!out(2).contains("sprak") && !out(2).contains("qurey"))
    // untouched rows stay identical
    assert(out(0) == "the spark query engine runs the query plan")
  }

  test("distributed fix matches the driver-side spell_check output") {
    val driver = TypoFix("spell_check", similarityThreshold = 0.7)(corpus).df
      .orderBy("id").collect().map(_.getString(1)).toSeq
    val dist = DistributedSpell.fix(corpus, "text", threshold = 0.7)
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(dist == driver)
  }

  test("word-map apply equals the chained word-boundary regex apply") {
    // pins the equivalence that justifies the single-pass rewrite: per
    // token at most one whole-word match, fixes never re-matched
    val map = Map("sprak" -> "spark", "qurey" -> "query", "teh" -> "the")
    val df = Seq((0L, "Teh SPRAK qurey, teh qurey! (sprak)"),
      (1L, "untouched text"), (2L, null.asInstanceOf[String]),
      (3L, "sprakqurey not a word boundary")).toDF("id", "text")
    val chained = map.toSeq.sortBy(_._1).foldLeft(df) { case (d, (t, f)) =>
      d.withColumn("text", regexp_replace(col("text"),
        s"(?i)\\b${java.util.regex.Pattern.quote(t)}\\b", f))
    }.orderBy("id").collect().map(_.getString(1)).toSeq
    val single = TypoFix.applyWordMap(df, "text", map)
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(single == chained)
    assert(single(0) == "the spark query, the query! (spark)")
    assert(single(3) == "sprakqurey not a word boundary")
  }

  test("spell apply is one projection, not a per-entry regex chain") {
    val plan = DistributedSpell.fix(corpus, "text", threshold = 0.7)
      .queryExecution.analyzed.toString
    assert(!plan.contains("regexp_replace"))
  }

  test("vocabulary words are never rewritten into each other") {
    val m = DistributedSpell.corrections(corpus, "text", threshold = 0.7)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val vocab = Set("the", "spark", "query", "engine", "runs", "plan", "plans")
    assert(m.keySet.intersect(vocab).isEmpty)
  }
}
