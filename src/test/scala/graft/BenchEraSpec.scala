package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r16 ABSOLUTE substitution-evidence channel (r15 verdict
  * "What's wrong #1"): `Bench.historyEraBands` must reproduce the era
  * band — per historical run the MAX of its start/end probes, then the
  * MEDIAN across runs — from the bench writer's own line format, filter
  * by SF, skip malformed/absent readings, and return -1 sentinels when
  * there is no record. The predicate itself (best probe < 0.8× band ⇒
  * degraded era) is arithmetic on these two numbers, so pinning the
  * band pins the channel.
  */
class BenchEraSpec extends AnyFunSuite {

  private def line(sf: String, ss: Double, sa: Double, es: Double, ea: Double) =
    s"""{"metric":"total","value":1.0,"queries":{"q01":0.1},""" +
      s""""membw_gbs":{"start_single":$ss,"start_agg":$sa,"end_single":$es,"end_agg":$ea},""" +
      s""""sf":"$sf"}"""

  private def withHistory(lines: Seq[String])(f: java.io.File => Unit): Unit = {
    val file = java.io.File.createTempFile("graft_era_hist", ".jsonl")
    try {
      java.nio.file.Files.write(
        file.toPath,
        (lines.mkString("\n") + "\n").getBytes("UTF-8")
      )
      f(file)
    } finally file.delete()
  }

  test("era band = median across runs of each run's max probe") {
    // three runs: maxes single 23.9/23.6/16.8, agg 148.1/144.3/104.5
    // (the r15 shape: two healthy eras and the uniformly-degraded run)
    withHistory(
      Seq(
        line("sfX", 23.2, 132.1, 23.9, 148.1),
        line("sfX", 14.8, 83.0, 23.6, 144.3),
        line("sfX", 17.9, 104.5, 16.8, 91.2)
      )
    ) { h =>
      val (s, a) = Bench.historyEraBands(h, "sfX")
      assert(s == 23.6 && a == 144.3)
      // the degraded run's own best probes sit below 0.8× these bands —
      // the exact r15 blind spot the channel exists to close
      assert(math.max(104.5, 91.2) < 0.8 * a)
      assert(math.max(17.9, 16.8) < 0.8 * s)
      // while a healthy run's do not
      assert(math.max(132.1, 148.1) >= 0.8 * a)
    }
  }

  test("filters by SF dir and ignores runs of other SFs") {
    withHistory(
      Seq(line("sfA", 10.0, 50.0, 10.0, 50.0), line("sfB", 20.0, 100.0, 20.0, 100.0))
    ) { h =>
      assert(Bench.historyEraBands(h, "sfA") == ((10.0, 50.0)))
      assert(Bench.historyEraBands(h, "sfB") == ((20.0, 100.0)))
      assert(Bench.historyEraBands(h, "sfC") == ((-1.0, -1.0)))
    }
  }

  test("missing file / malformed probes return -1 sentinels") {
    assert(
      Bench.historyEraBands(new java.io.File("/nonexistent/h.jsonl"), "sfX") ==
        ((-1.0, -1.0))
    )
    // a line with a membw block of -1 failure sentinels contributes
    // nothing (probe OOM path writes -1s); band stays undefined
    withHistory(Seq(line("sfX", -1.0, -1.0, -1.0, -1.0))) { h =>
      assert(Bench.historyEraBands(h, "sfX") == ((-1.0, -1.0)))
    }
  }
}
