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

  test("worst-case stdout line stays under 1500 chars") {
    // every value at the widest 2-decimal rendering a realistic suite can
    // produce (xx.xx); fixed overhead mirrors Bench.line + load + sf
    val keys = Bench.shortKeys(names)
    val qs = names.map(n => s""""${keys(n)}":99.99""").mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":9999.99,"unit":"sec","queries":$qs,""" +
      s""""load":[99.99,99.99],"sf":"/root/testdata/sf0.1"}"""
    assert(line.length < 1500,
      s"worst-case bench stdout line is ${line.length} chars — extend the " +
        "abbrev table or tighten precision before adding more queries")
  }
}
