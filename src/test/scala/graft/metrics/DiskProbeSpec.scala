package graft.metrics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class DiskProbeSpec extends AnyFunSuite with Matchers {

  test("write probe appends real bytes and reports a positive bound") {
    // short window: the spec checks plumbing, not the bound's stability
    DiskProbe.writeGbps(writers = 2, durationMs = 200L) should be > 0.0
  }

  test("net→disk pipeline moves bytes socket-to-file and reports a positive bound") {
    DiskProbe.netDiskGbps(writers = 2, durationMs = 200L) should be > 0.0
  }

  test("net→disk pipeline survives a single writer (degenerate channel)") {
    DiskProbe.netDiskGbps(writers = 1, queueDepth = 1, durationMs = 100L) should be > 0.0
  }
}
