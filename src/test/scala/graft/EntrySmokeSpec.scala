package graft

/** The driver smoke-checks `SparkEntry.entry` (rows > 0 at sf0.001) at the
  * start of every round — run the exact same check in CI so a pipeline
  * regression surfaces here first. */
class EntrySmokeSpec extends SparkSpec {
  test("flagship entry pipeline produces rows at sf0.001") {
    val out = SparkEntry.entry(spark)
    assert(out.count() > 0)
  }
}
