package graft.metrics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the 1 Hz sampler's CSV contract — Bench, ScaleSweep and any
  * offline analysis parse these columns positionally, so a silently
  * added/renamed column would corrupt every downstream summary (the
  * round-11 steal_pct column shipped with a stale doc list for exactly
  * this reason; gc_pct landed in round 12).
  */
class TelemetrySpec extends AnyFunSuite with Matchers {

  private val Header =
    "sec,cpu_pct,rss_mb,disk_util_pct,net_rx_mbps,net_tx_mbps,steal_pct,gc_pct,spin_mops"

  test("timeline rows carry exactly the documented columns; marks interleave") {
    val t = new Telemetry().start()
    Thread.sleep(1500)
    t.mark("phase-a")
    Thread.sleep(1200)
    t.stop()
    val lines = t.csv.linesIterator.toSeq
    lines.head shouldBe Header
    val data = lines.tail.filterNot(_.startsWith("#"))
    data should not be empty
    data.foreach { l =>
      val f = l.split(",", -1)
      f should have length Header.count(_ == ',') + 1
      // every numeric field parses; shares are non-negative
      f.foreach(_.toDouble should be >= 0.0)
    }
    lines.tail.exists(_.matches("# \\d+ phase-a")) shouldBe true
  }

  test("summary medians come from the sampled rows and are finite") {
    val t = new Telemetry().start()
    Thread.sleep(2200)
    t.stop()
    val (cpuMed, diskMed, stealMax) = t.summary
    cpuMed should be >= 0.0
    diskMed should be >= 0.0
    stealMax should be >= 0.0
    cpuMed.isNaN shouldBe false
  }

  test("spin_mops probe samples are positive on every row") {
    val t = new Telemetry().start()
    Thread.sleep(2200)
    t.stop()
    val rows = t.csv.linesIterator.toSeq.tail.filterNot(_.startsWith("#"))
    rows should not be empty
    // the fixed-work probe always completes in finite nonzero time
    rows.foreach(_.split(",", -1).last.toDouble should be > 0.0)
  }

  test("gcMillis is a non-negative monotone counter") {
    val a = Telemetry.gcMillis()
    a should be >= 0L
    System.gc()
    val b = Telemetry.gcMillis()
    b should be >= a
  }
}
