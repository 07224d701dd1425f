package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bench stdout contract structurally: the driver json-parses
  * only the LAST 2000 chars of stdout, and the line has overflowed that
  * window twice in past rounds as queries were added. These checks make
  * the next overflow a compile-time-adjacent failure instead of a
  * silently null driver parse. No Spark session needed. */
class BenchLineSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq

  test("abbreviated stdout keys are collision-free for the full query set") {
    val keys = Bench.shortKeys(names)
    assert(keys.values.toSet.size == names.size)
    // the abbreviation actually engaged (a collision would silently fall
    // back to longer stripped names and eat the length headroom)
    assert(keys(names.head) == Bench.shortKey(names.head))
    assert(names.forall(n => keys(n) == Bench.shortKey(n)),
      "collision fallback engaged — extend the abbrev table instead")
  }

  test("crashed queries are excluded from re-time baselines; sf must match") {
    val txt = """{"metric":"total","value":3.1,"unit":"sec",""" +
      """"queries":{"q_good":1.5,"q_warm":1.4,"q_crashed":0.05,"q_also_bad":1.55},""" +
      """"retimed":{"q_warm":[3.0,1.4]},"failed":["q_crashed","q_also_bad"],""" +
      """"load":[1.0,2.0],"sf":"/root/testdata/sf0.1"}"""
    // crashed names drop; q_warm's archived 1.4 is a warm min, replaced
    // by its retimed[0]=3.0 cold first run (r16 — dropping the key
    // wholesale cost it the re-time gate on history-less runs)
    val parsed = Bench.parseQueryTimes(txt, Some("/root/testdata/sf0.1"))
    assert(parsed == Map("q_good" -> 1.5, "q_warm" -> 3.0),
      s"crash/warm times must not become baselines: $parsed")
    assert(Bench.parseQueryTimes(txt, Some("/root/testdata/sf0.01")).isEmpty,
      "a results file from a different sf is not comparable")
  }

  test("realistic worst-case stdout line stays under 1920 chars") {
    // r12c: at 99 queries the PATHOLOGICAL all-99.99 rendering can no
    // longer fit 1500 at prec 2 with readable keys (that case is what
    // the prec-1 ladder step is for — pinned below). The bound that
    // keeps normal rounds on the full-precision branch (1700 since r13)
    // is the realistic worst case: every query under 10 s at 2 decimals
    // ("9.99"), which covers the entire measured cold history (max
    // ~4.5 s) with margin; retimed_worst at the longest abbreviated key
    // the suite can emit; gate fields at a timed-out contended worst.
    val keys = Bench.shortKeys(names)
    val worstKey = names.maxBy(keys(_).length)
    val line = Bench.stdoutLine(names.map(_ -> 9.99), 2, keys,
      withQueries = true, failedCount = names.size,
      retimed = Map(worstKey -> (99.99, 99.99)),
      loadBefore = 99.99, loadAfter = 99.99,
      idleWaitS = 120.9, gateStealRate = 3199.9, contended = true,
      histRatio = 99.99, repassN = 99,
      sfDir = "/root/testdata/sf0.1")
    // r17: 127 queries (corpus-stats batch) moved the prec-2 bar to
    // 1920 — the last step the 2000-char driver window affords (80 in
    // reserve); the next batch needs a key-table overhaul instead
    assert(line.length < 1920,
      s"realistic worst-case bench stdout line is ${line.length} chars — " +
        "extend the abbrev table or tighten precision before adding more " +
        "queries")
  }

  test("pathological line still fits the prec-1 ladder step") {
    // heavily-contended suite (every query at 99.99 s): the main()
    // ladder falls to 1 decimal and must stay inside the driver-parsed
    // 1800-char window without dropping the per-query map
    val keys = Bench.shortKeys(names)
    val worstKey = names.maxBy(keys(_).length)
    val line = Bench.stdoutLine(names.map(_ -> 99.99), 1, keys,
      withQueries = true, failedCount = names.size,
      retimed = Map(worstKey -> (99.99, 99.99)),
      loadBefore = 99.99, loadAfter = 99.99,
      idleWaitS = 120.9, gateStealRate = 3199.9, contended = true,
      histRatio = 99.99, repassN = 99,
      sfDir = "/root/testdata/sf0.1")
    assert(line.length <= 1800,
      s"prec-1 fallback line is ${line.length} chars — the ladder would " +
        "drop the queries map entirely; shorten keys")
  }

  test("stdout line carries the re-time attribution fields") {
    val res = Seq("q_fast" -> 1.0, "q_contended" -> 9.0, "q_mild" -> 3.0)
    val line = Bench.stdoutLine(res, 2, identity, withQueries = true,
      failedCount = 0,
      retimed = Map("q_contended" -> (9.0, 1.1), "q_mild" -> (3.0, 1.4)),
      loadBefore = 1.0, loadAfter = 1.0,
      idleWaitS = 12.3, gateStealRate = 0.4, contended = false,
      histRatio = 1.02, repassN = -1, sfDir = "sf")
    assert(line.contains(""""retimed_n":2"""), line)
    // worst = largest first−retime gap (q_contended: 7.9 > q_mild: 1.6)
    assert(line.contains(""""retimed_worst":["q_contended",9,1.1]"""), line)
    // no re-times → count 0, no worst field (nothing to attribute)
    val none = Bench.stdoutLine(res, 2, identity, withQueries = false,
      failedCount = 0, retimed = Map.empty,
      loadBefore = 1.0, loadAfter = 1.0,
      idleWaitS = 12.3, gateStealRate = 0.4, contended = false,
      histRatio = 1.02, repassN = -1, sfDir = "sf")
    assert(none.contains(""""retimed_n":0""") && !none.contains("retimed_worst"),
      none)
  }

  test("stdout line carries the quiet-gate fields (r13 verdict #1)") {
    val res = Seq("q_a" -> 1.0)
    val ok = Bench.stdoutLine(res, 2, identity, withQueries = true,
      failedCount = 0, retimed = Map.empty, loadBefore = 1.0,
      loadAfter = 1.0, idleWaitS = 12.34, gateStealRate = 0.46,
      contended = false, histRatio = 1.02, repassN = -1, sfDir = "sf")
    // prec-1 rendering: the gate fields must stay compact in the tail
    assert(ok.contains(""""gate":[12.3,0.5],"contended":false"""), ok)
    // r16 self-labels: history ratio + re-pass state ride the archive
    assert(ok.contains(""""hratio":1.02,"repass":-1"""), ok)
    val bad = Bench.stdoutLine(res, 2, identity, withQueries = true,
      failedCount = 0, retimed = Map.empty, loadBefore = 1.0,
      loadAfter = 1.0, idleWaitS = 120.0, gateStealRate = 117.2,
      contended = true, histRatio = 1.31, repassN = 17, sfDir = "sf")
    assert(bad.contains(""""contended":true"""), bad)
    assert(bad.contains(""""hratio":1.31,"repass":17"""), bad)
  }

  test("abbrev holds one live mapping per token (r11/r12d: dead dup entries)") {
    // This bug shipped TWICE: pre-r12 (`quality`/`pipeline` mapped twice
    // in a Map literal, which keeps only the last entry) and r12d (the
    // whole single-char block re-mapped 11 already-mapped tokens). The
    // table is now a Seq with distinct-token/distinct-code requires at
    // class-load, so a re-introduced duplicate aborts every suite; these
    // pins additionally freeze the LIVE mappings so an intentional
    // re-key must touch this spec in the same commit.
    // r18: tokens concatenate with NO separator (the key-table overhaul
    // the r17 comment above the 1920 bound pre-announced) — same token
    // codes, joiner dropped
    assert(Bench.shortKey("q_quality_filter") == "qt")
    assert(Bench.shortKey("q_pipeline_e2e") == "ppe2e")
    assert(Bench.shortKey("q_winnow_pairs") == "wpa")
    // r12b/r12d single-char re-keys: high-frequency tokens ride one char
    assert(Bench.shortKey("q_missing_fill_mode") == "mfmo")
    assert(Bench.shortKey("q_missing_fill_median") == "mfmd")
    assert(Bench.shortKey("q_asof_join") == "afj")
    assert(Bench.shortKey("q_interval_join") == "ilj")
    assert(Bench.shortKey("q_sample_cap_group") == "acpgp")
    // r18 batch
    assert(Bench.shortKey("q_bpe_tokens") == "b4t4")
    assert(Bench.shortKey("q_seq_pack_bpe") == "sqpkb4")
    // structural guard: the requires in Bench already abort on duplicate
    // tokens/codes; verify here that the SOURCE literal and the runtime
    // Seq agree (a second table or a stray re-key outside abbrevSeq
    // would desynchronize them)
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/Bench.scala")))
    val body = src.substring(src.indexOf("val abbrevSeq"),
      src.indexOf("require(abbrevSeq"))
    val tokens = "\"([a-z0-9]+)\" ->".r.findAllMatchIn(body)
      .map(_.group(1)).toSeq
    assert(tokens == Bench.abbrevSeq.map(_._1),
      "abbrev source literal differs from the runtime Seq")
  }

  test("130-query horizon: future growth stays inside the stdout ladder") {
    // The single-char namespace is exhausted (Bench.abbrevSeq comment
    // pins the <letter><digit> overflow rule). Adding queries must not
    // silently drop stdout precision: simulate growth to 115 queries
    // with realistic future names (unmapped tokens auto-truncate to 3
    // chars → keys like "fut_op101") and pin both ladder steps. If this
    // fails, extend the abbrev table BEFORE landing the query batch.
    val future = (1 to (130 - names.size)).map(i => s"q_future_op$i")
    val all = names ++ future
    val keys = Bench.shortKeys(all)
    assert(keys.values.toSet.size == all.size,
      "synthetic future names collided — pick different ones")
    val worstKey = all.maxBy(keys(_).length)
    def line(prec: Int) = Bench.stdoutLine(all.map(_ -> 9.99), prec, keys,
      withQueries = true, failedCount = all.size,
      retimed = Map(worstKey -> (99.99, 99.99)),
      loadBefore = 99.99, loadAfter = 99.99,
      idleWaitS = 120.9, gateStealRate = 3199.9, contended = true,
      histRatio = 99.99, repassN = 99,
      sfDir = "/root/testdata/sf0.1")
    // the ladder's hard guarantee: the queries map is NEVER dropped.
    // prec-2 survives to ~121 queries (pinned below); past that the
    // ladder visibly falls to 1 decimal, and THAT must hold to 130.
    assert(line(1).length <= 1800,
      s"at 130 queries the prec-1 ladder line is ${line(1).length} chars")
    val nearer = names ++ (1 to (121 - names.size)).map(i => s"q_future_op$i")
    val nearKeys = Bench.shortKeys(nearer)
    val nearLine = Bench.stdoutLine(nearer.map(_ -> 9.99), 2, nearKeys,
      withQueries = true, failedCount = nearer.size,
      retimed = Map(nearer.maxBy(nearKeys(_).length) -> (99.99, 99.99)),
      loadBefore = 99.99, loadAfter = 99.99,
      idleWaitS = 120.9, gateStealRate = 3199.9, contended = true,
      histRatio = 99.99, repassN = 99,
      sfDir = "/root/testdata/sf0.1")
    assert(nearLine.length < 1920,
      s"at 121 queries the realistic prec-2 line is ${nearLine.length} " +
        "chars — extend the abbrev table before landing the next batch")
  }
}
