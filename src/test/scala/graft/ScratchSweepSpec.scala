package graft

import java.io.File
import java.nio.file.Files

/** Pins SparkEntry.sweepDeadScratch — the /tmp hygiene that keeps
  * repeated Bench/Verify invocations from accumulating GB-scale sink
  * scratch (the r17 disk-full lesson): dead-pid dirs for the TARGET sf
  * go, live-pid dirs and other-sf dirs stay. */
class ScratchSweepSpec extends SparkSpec {

  private def mkScratch(name: String): File = {
    val d = new File(s"/tmp/$name")
    d.mkdirs()
    Files.writeString(new File(d, "part-0000.parquet").toPath, "x")
    d
  }

  test("sweep deletes dead-pid scratch of the target sf only, keeps " +
      "live pids and other sfs") {
    // pid 1 exists on Linux but is init, not us — use a pid far past
    // pid_max semantics: pick a pid that is guaranteed dead by probing
    val deadPid = Iterator.from(3999999, -7)
      .find(p => !ProcessHandle.of(p.toLong).isPresent).get
    val livePid = ProcessHandle.current().pid()
    val dead = mkScratch(s"graft_csv_roundtrip_sweepspec_$deadPid")
    val live = mkScratch(s"graft_csv_roundtrip_sweepspec_$livePid")
    val otherSf = mkScratch(s"graft_csv_roundtrip_othersweep_$deadPid")
    val noPid = mkScratch("graft_csv_roundtrip_sweepspec_notapid")
    // q_bucketed_join appends `_orders`/`_lineitem` AFTER the pid —
    // the r17 ADVICE gap: these are the ~1 GB dirs the sweep is FOR
    val deadSfx = mkScratch(s"graft_bucketed_roundtrip_sweepspec_${deadPid}_orders")
    val liveSfx = mkScratch(s"graft_bucketed_roundtrip_sweepspec_${livePid}_lineitem")
    // digits that overflow Long: unparseable → skipped, never a crash
    val hugePid = mkScratch("graft_csv_roundtrip_sweepspec_99999999999999999999")
    try {
      SparkEntry.sweepDeadScratch("/data/sweepspec")
      assert(!dead.exists(), "dead-pid scratch must be deleted")
      assert(live.exists(), "live-pid scratch must be kept (may be mid-read)")
      assert(otherSf.exists(), "other-sf scratch is out of scope")
      assert(noPid.exists(), "non-pid suffixes are not ours to delete")
      assert(!deadSfx.exists(), "dead-pid bucketed scratch (pid + table " +
        "suffix) must be deleted — it is the largest scratch any query writes")
      assert(liveSfx.exists(), "live-pid bucketed scratch must be kept")
      assert(hugePid.exists(), "unparseable pid digits are skipped, not swept")
    } finally Seq(dead, live, otherSf, noPid, deadSfx, liveSfx, hugePid)
      .foreach { d =>
        Option(d.listFiles()).foreach(_.foreach(_.delete())); d.delete()
      }
  }
}
